"""Regression tests for the round-3 adversarial review of the sparse
jit-bridge / ratio-sweep / narrowing-fix batch (one test per finding).
"""

import numpy as np
import pytest

import aesara_tpu as A
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.tensor.subtensor import AdvancedIncSubtensor1


def advanced_set_subtensor1(x, y, i):
    return AdvancedIncSubtensor1(set_instead_of_inc=True)(x, y, i)

from tests.rewrite_corpus import py_mode


class TestSparseDotRank:
    def test_vector_times_sparse_matrix_shape_and_grad(self):
        # finding 1: at.dot(vector, sparse) was typed 2-D; grad wrt the
        # vector came back (1, n) instead of (n,)
        import scipy.sparse as sps
        from aesara_tpu import sparse

        v = at.vector("v", dtype="float64")
        B = sparse.csr_matrix("B", dtype="float64")
        z = at.dot(v, B)
        assert z.type.ndim == 1
        g = A.grad(at.sum(z), v)
        assert g.type.ndim == 1
        Bv = sps.random(4, 6, density=0.5, format="csr", dtype="float64",
                        random_state=np.random.RandomState(0))
        vv = np.arange(4, dtype="float64")
        f = function([v, B], [z, g], mode="FAST_RUN")
        fp = function([v, B], [z, g], mode="PY")
        for a, b in zip(f(vv, Bv), fp(vv, Bv)):
            assert np.asarray(a).shape == np.asarray(b).shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(f(vv, Bv)[0]), vv @ Bv, rtol=1e-12)

    def test_sparse_matrix_times_vector_still_1d(self):
        import scipy.sparse as sps
        from aesara_tpu import sparse

        B = sparse.csr_matrix("B", dtype="float64")
        v = at.vector("v", dtype="float64")
        z = at.dot(B, v)
        assert z.type.ndim == 1
        g = A.grad(at.sum(z), v)
        assert g.type.ndim == 1


class TestAdvSetSub1Guards:
    def test_duplicate_indices_last_write_wins(self):
        # finding 2: set_subtensor(x[i], y)[i] with duplicate indices
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        i = at.constant(np.asarray([0, 0], dtype="int64"))
        out = advanced_set_subtensor1(x, y, i)[i]
        f = function([x, y], out, mode="FAST_RUN")
        fp = function([x, y], out, mode=py_mode)
        xv = np.arange(5.0)
        yv = np.asarray([1.0, 2.0])
        np.testing.assert_allclose(np.asarray(f(xv, yv)), np.asarray(fp(xv, yv)))
        np.testing.assert_allclose(np.asarray(f(xv, yv)), [2.0, 2.0])

    def test_unique_indices_still_rewrites(self):
        from tests.rewrite_corpus import op_labels, rewrite_only

        x = at.tensor(dtype="float64", shape=(5,), name="x")
        y = at.vector("y", dtype="float64")
        i = at.constant(np.asarray([1, 3], dtype="int64"))
        out = advanced_set_subtensor1(x, y, i)[i]
        res = rewrite_only(out, include=("canonicalize", "specialize"))
        assert "AdvancedIncSubtensor1" not in op_labels(res)

    def test_broadcasting_y_not_narrowed(self):
        # finding 3: y typed (1,) broadcast into a 2-wide window
        x = at.tensor(dtype="float64", shape=(5,), name="x")
        y = at.tensor(dtype="float64", shape=(1,), name="y")
        i = at.constant(np.asarray([1, 3], dtype="int64"))
        out = advanced_set_subtensor1(x, y, i)[i]
        f = function([x, y], out, mode="FAST_RUN")
        fp = function([x, y], out, mode=py_mode)
        xv = np.arange(5.0)
        yv = np.asarray([9.0])
        a, b = np.asarray(f(xv, yv)), np.asarray(fp(xv, yv))
        assert a.shape == b.shape == (2,)
        np.testing.assert_allclose(a, b)

    def test_negative_alias_blocked(self):
        x = at.tensor(dtype="float64", shape=(5,), name="x")
        y = at.vector("y", dtype="float64")
        i = at.constant(np.asarray([4, -1], dtype="int64"))  # alias!
        out = advanced_set_subtensor1(x, y, i)[i]
        f = function([x, y], out, mode="FAST_RUN")
        fp = function([x, y], out, mode=py_mode)
        xv = np.arange(5.0)
        yv = np.asarray([7.0, 8.0])
        np.testing.assert_allclose(np.asarray(f(xv, yv)), np.asarray(fp(xv, yv)))

    def test_out_of_bounds_not_erased(self):
        # the py path raises; the rewrite must not silently succeed
        x = at.tensor(dtype="float64", shape=(5,), name="x")
        y = at.vector("y", dtype="float64")
        i = at.constant(np.asarray([1, 7], dtype="int64"))  # 7 OOB
        out = advanced_set_subtensor1(x, y, i)[i]
        fp = function([x, y], out, mode=py_mode)
        with pytest.raises(Exception):
            fp(np.arange(5.0), np.asarray([1.0, 2.0]))


class TestIndexCastWidening:
    @pytest.mark.parametrize(
        "src,dst,should_match",
        [
            ("int32", "int64", True),
            ("uint16", "int32", True),
            ("int64", "int32", False),   # narrowing
            ("uint32", "int32", False),  # sign-wrap
        ],
    )
    def test_same_index_vector_cast_rules(self, src, dst, should_match):
        # finding 5: only strictly-widening casts count as "same index"
        from aesara_tpu.tensor.basic import cast
        from aesara_tpu.tensor.rewriting.subtensor import _same_index_vector

        i = at.vector("i", dtype=src)
        j = cast(i, dst)
        assert _same_index_vector(j, i) is should_match


class TestDensifyMasking:
    def test_mul_sd_inf_in_dense_operand(self):
        # finding 4: implicit zeros must stay exact 0 under inf in b
        import scipy.sparse as sps
        from aesara_tpu import sparse
        from aesara_tpu.sparse import basic as sb

        a = sparse.csr_matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = sb.dense_from_sparse(sb.mul(a, b))
        f = function([a, b], out, mode="FAST_RUN")
        av = sps.csr_matrix(np.asarray([[1.0, 0.0], [0.0, 2.0]]))
        bv = np.asarray([[2.0, np.inf], [np.inf, 3.0]])
        got = np.asarray(f(av, bv))
        np.testing.assert_allclose(got, [[2.0, 0.0], [0.0, 6.0]])

    def test_sampling_dot_inf_in_product(self):
        import scipy.sparse as sps
        from aesara_tpu import sparse
        from aesara_tpu.sparse import basic as sb

        p = sparse.csr_matrix("p", dtype="float64")
        xm = at.matrix("xm", dtype="float64")
        ym = at.matrix("ym", dtype="float64")
        out = sb.dense_from_sparse(sb.sampling_dot(xm, ym, p))
        f = function([xm, ym, p], out, mode="FAST_RUN")
        pv = sps.csr_matrix(np.asarray([[1.0, 0.0], [0.0, 1.0]]))
        xv = np.asarray([[np.inf, 1.0], [1.0, 1.0]])
        yv = np.asarray([[0.0, 1.0], [1.0, 1.0]])
        got = np.asarray(f(xv, yv, pv))
        # p's implicit zeros stay 0 even though x@y.T holds inf/nan
        assert got[0, 1] == 0.0 and got[1, 0] == 0.0
