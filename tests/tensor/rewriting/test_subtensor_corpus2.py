"""Subtensor rewrite corpus, part 2: negative steps, symbolic-index
placement, inc/set chains and their gradients, and rewrite composition
around the dynamic-slice family — extending ``test_subtensor_corpus.py``
toward the reference's ``tests/tensor/rewriting/test_subtensor.py``
(2,304 LoC) breadth.  Rules: ``aesara_tpu/tensor/rewriting/subtensor.py``.
"""

import numpy as np
import pytest

import aesara_tpu as A
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from tests.rewrite_corpus import count_label, op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(20260823)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")


def mat(shape=(6, 5), dtype="float64"):
    return rng.normal(size=shape).astype(dtype)


def vec(n=8, dtype="float64"):
    return rng.normal(size=n).astype(dtype)


class TestNegativeSteps:
    @pytest.mark.parametrize("build", [
        lambda x: x[::-1][::-1],
        lambda x: x[::-1][::2],
        lambda x: x[::2][::-1],
        lambda x: x[::-1][3],
        lambda x: x[::-1][-1],
    ])
    def test_reverse_compositions_value(self, build):
        x = at.tensor(dtype="float64", shape=(8,), name="x")
        out = build(x)
        rewrite_and_check([x], out, [vec(8)], include=SPEC)

    def test_double_reverse_merges_away(self):
        x = at.tensor(dtype="float64", shape=(8,), name="x")
        res = rewrite_only(x[::-1][::-1], include=SPEC)
        # merged to at most a trivial view; definitely one node or none
        assert count_label(res, "Subtensor") <= 1

    @pytest.mark.parametrize("sl", [
        np.s_[::-2], np.s_[5:1:-1], np.s_[-1::-3], np.s_[::-1],
    ])
    def test_negative_step_values(self, sl):
        x = at.tensor(dtype="float64", shape=(9,), name="x")
        out = x[sl]
        f = function([x], out, mode="FAST_RUN")
        fp = function([x], out, mode="PY")
        v = vec(9)
        np.testing.assert_allclose(np.asarray(f(v)), np.asarray(fp(v)))
        np.testing.assert_allclose(np.asarray(f(v)), v[sl])


class TestSymbolicIndexPlacement:
    def test_scalar_index_then_slice_merges(self):
        x = at.tensor(dtype="float64", shape=(6, 5), name="x")
        i = at.scalar("i", dtype="int64")
        out = x[i][1:4]
        f = function([x, i], out, mode="FAST_RUN")
        fp = function([x, i], out, mode="PY")
        xv = mat()
        for iv in (0, 2, 5):
            np.testing.assert_allclose(
                np.asarray(f(xv, iv)), np.asarray(fp(xv, iv))
            )

    def test_slice_then_symbolic_index(self):
        x = at.tensor(dtype="float64", shape=(6, 5), name="x")
        i = at.scalar("i", dtype="int64")
        out = x[1:5][i]
        f = function([x, i], out, mode="FAST_RUN")
        fp = function([x, i], out, mode="PY")
        xv = mat()
        for iv in (0, 3):
            np.testing.assert_allclose(
                np.asarray(f(xv, iv)), np.asarray(fp(xv, iv))
            )

    def test_affine_window_two_stage(self):
        # data[i*B:(i+1)*B][j] — minibatch window then row pick
        x = at.tensor(dtype="float64", shape=(12, 5), name="x")
        i = at.scalar("i", dtype="int64")
        j = at.scalar("j", dtype="int64")
        B = 4
        out = x[i * B:(i + 1) * B][j]
        f = function([x, i, j], out, mode="FAST_RUN")
        fp = function([x, i, j], out, mode="PY")
        xv = mat((12, 5))
        for iv, jv in ((0, 0), (1, 3), (2, 1)):
            np.testing.assert_allclose(
                np.asarray(f(xv, iv, jv)), np.asarray(fp(xv, iv, jv))
            )

    def test_affine_window_becomes_dynamic_slice(self):
        x = at.tensor(dtype="float64", shape=(12, 5), name="x")
        i = at.scalar("i", dtype="int64")
        out = x[i * 4:(i + 1) * 4]
        res = rewrite_only(out, include=SPEC)
        labels = op_labels(res)
        assert "DynamicSlice" in labels, labels


class TestIncSetChains:
    def test_two_disjoint_sets_compose(self):
        x = at.tensor(dtype="float64", shape=(8,), name="x")
        y = at.tensor(dtype="float64", shape=(2,), name="y")
        z = at.tensor(dtype="float64", shape=(2,), name="z")
        out = at.set_subtensor(at.set_subtensor(x[0:2], y)[4:6], z)
        rewrite_and_check(
            [x, y, z], out, [vec(8), vec(2), vec(2)], include=SPEC,
        )

    def test_overlapping_sets_last_wins(self):
        x = at.tensor(dtype="float64", shape=(8,), name="x")
        y = at.tensor(dtype="float64", shape=(4,), name="y")
        z = at.tensor(dtype="float64", shape=(4,), name="z")
        out = at.set_subtensor(at.set_subtensor(x[0:4], y)[2:6], z)
        f = function([x, y, z], out, mode="FAST_RUN")
        fp = function([x, y, z], out, mode="PY")
        args = (vec(8), vec(4), vec(4))
        np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(fp(*args)))

    def test_inc_then_inc_same_region_accumulates(self):
        x = at.tensor(dtype="float64", shape=(8,), name="x")
        y = at.tensor(dtype="float64", shape=(3,), name="y")
        out = at.inc_subtensor(at.inc_subtensor(x[1:4], y)[1:4], y)
        f = function([x, y], out, mode="FAST_RUN")
        fp = function([x, y], out, mode="PY")
        args = (vec(8), vec(3))
        np.testing.assert_allclose(np.asarray(f(*args)), np.asarray(fp(*args)))
        got = np.asarray(f(*args))
        np.testing.assert_allclose(got[1:4], args[0][1:4] + 2 * args[1])

    def test_grad_through_set_region(self):
        # grad wrt y flows only through the window; wrt x only outside
        x = at.tensor(dtype="float64", shape=(8,), name="x")
        y = at.tensor(dtype="float64", shape=(3,), name="y")
        out = at.sum(at.set_subtensor(x[2:5], y) ** 2)
        gx, gy = A.grad(out, [x, y])
        f = function([x, y], [gx, gy], mode="FAST_RUN")
        fp = function([x, y], [gx, gy], mode="PY")
        args = (vec(8), vec(3))
        for a, b in zip(f(*args), fp(*args)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        gxv = np.asarray(f(*args)[0])
        np.testing.assert_allclose(gxv[2:5], 0.0)

    def test_grad_through_inc_region(self):
        x = at.tensor(dtype="float64", shape=(8,), name="x")
        y = at.tensor(dtype="float64", shape=(3,), name="y")
        out = at.sum(at.inc_subtensor(x[2:5], y) ** 2)
        gx, gy = A.grad(out, [x, y])
        f = function([x, y], [gx, gy], mode="FAST_RUN")
        fp = function([x, y], [gx, gy], mode="PY")
        args = (vec(8), vec(3))
        for a, b in zip(f(*args), fp(*args)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_incsubtensor_serialize_chain_depth(self, k):
        # k gradient-style inc_subtensors into the same zero base
        x = at.tensor(dtype="float64", shape=(8, 3), name="x")
        idxs = [at.constant(np.asarray([i, i + 2], dtype="int64"))
                for i in range(k)]
        base = at.zeros_like(x)
        out = base
        for i in range(k):
            out = at.inc_subtensor(out[idxs[i]], x[idxs[i]] * float(i + 1))
        rewrite_and_check([x], at.sum(out), [mat((8, 3))], include=SPEC,
                          rtol=1e-10)


class TestExpandDimsAndLifts:
    @pytest.mark.parametrize("pos", [0, 1, 2])
    def test_index_into_expand_dims(self, pos):
        x = at.tensor(dtype="float64", shape=(4, 5), name="x")
        order = list(range(2))
        order.insert(pos, "x")
        e = x.dimshuffle(*order)
        idx = [slice(None)] * 3
        idx[pos] = 0
        out = e[tuple(idx)]
        res = rewrite_and_check([x], out, [mat((4, 5))], include=CANON)
        assert count_label(res, "Subtensor") == 0

    @pytest.mark.parametrize("f", [at.exp, at.tanh, lambda v: v * 2.0])
    def test_subtensor_lifts_through_elemwise(self, f):
        x = at.tensor(dtype="float64", shape=(10, 5), name="x")
        out = f(x)[2:4]
        res = rewrite_and_check([x], out, [mat((10, 5))], include=SPEC)
        # the elemwise now computes on the 2-row window, not 10 rows
        top = res.owner
        from aesara_tpu.tensor.elemwise import Elemwise

        if top is not None and isinstance(top.op, Elemwise):
            assert all(
                i.type.shape[0] in (1, 2) for i in top.inputs
                if getattr(i.type, "ndim", 0) >= 1
            )

    def test_subtensor_of_dot_right_operand(self):
        x = at.matrix("x", dtype="float64")
        w = at.matrix("w", dtype="float64")
        out = at.dot(x, w)[:, 1:3]
        f = function([x, w], out, mode="FAST_RUN")
        fp = function([x, w], out, mode="PY")
        args = (mat((4, 6)), mat((6, 5)))
        np.testing.assert_allclose(
            np.asarray(f(*args)), np.asarray(fp(*args)), rtol=1e-12
        )
