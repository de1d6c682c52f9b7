"""Regression tests for the round-2 sparse/random review findings."""

import numpy as np
import pytest
import scipy.sparse as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu import sparse as asp
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.sparse import basic as spb


class TestSparseConstantSignature:
    def test_same_values_different_positions_do_not_merge(self):
        a = sp.csr_matrix(([1.0], ([0], [0])), shape=(2, 2))
        b = sp.csr_matrix(([1.0], ([0], [1])), shape=(2, 2))
        ca = spb.as_sparse_variable(a)
        cb = spb.as_sparse_variable(b)
        assert ca.signature() != cb.signature()
        # end-to-end: a graph using both constants keeps both
        out = spb.dense_from_sparse(ca) + spb.dense_from_sparse(cb)
        f = function([], out, mode="FAST_RUN")
        np.testing.assert_array_equal(
            np.asarray(f()), np.array([[1.0, 1.0], [0.0, 0.0]])
        )

    def test_large_nnz_values_still_distinguish(self):
        rng = np.random.default_rng(0)
        dense = rng.normal(size=(200, 100))
        a = sp.csr_matrix(dense)
        b = sp.csr_matrix(dense * 2.0)
        assert a.nnz >= 10000
        assert (spb.as_sparse_variable(a).signature()
                != spb.as_sparse_variable(b).signature())


class TestCSMGradAlignment:
    def test_grad_through_union_pattern(self):
        # gz has a union pattern; the data gradient must align to THIS
        # CSM's positions (was: length mismatch / misaligned scatter)
        data = at.vector("data", dtype="float64")
        other_m = sp.csr_matrix(
            (np.array([5.0, 7.0]), ([0, 1], [1, 0])), shape=(2, 2)
        )
        indices = np.array([0], dtype="int32")
        indptr = np.array([0, 1, 1], dtype="int32")
        shape = np.array([2, 2], dtype="int32")
        y = spb.CSM("csr")(data, indices, indptr, shape)  # entry at (0,0)
        z = spb.add(y, spb.as_sparse_variable(other_m))
        cost = spb.sp_sum(z * z, sparse_grad=True)
        g = grad(cost, data)
        f = function([data], g, mode="PY")
        got = np.asarray(f(np.array([3.0])))
        # d/d data of (data + 0 at (0,0))^2 summed = 2 * 3.0
        np.testing.assert_allclose(got, [6.0])


class TestTrueDotFullGrads:
    def test_left_sparse_grad_is_full(self):
        xs = spb.csr_matrix("xs", dtype="float64")
        y = at.matrix("y", dtype="float64")
        out = spb.true_dot(xs, y) if hasattr(spb, "true_dot") else None
        cost = spb.sp_sum(out, sparse_grad=False) if out is not None else None
        g = grad(cost, xs)
        f = function([xs, y], spb.dense_from_sparse(g), mode="PY")
        xv = sp.csr_matrix((np.array([2.0]), ([0], [0])), shape=(2, 3))
        yv = np.arange(12.0).reshape(3, 4)
        got = np.asarray(f(xv, yv))
        want = np.ones((2, 4)) @ yv.T  # FULL dense grad, not pattern-cut
        np.testing.assert_allclose(got, want)

    def test_right_sparse_grad_implemented(self):
        x = at.matrix("x", dtype="float64")
        ys = spb.csr_matrix("ys", dtype="float64")
        out = spb.true_dot(x, ys)
        cost = spb.sp_sum(out, sparse_grad=False)
        g = grad(cost, ys)  # was: grad_not_implemented
        f = function([x, ys], spb.dense_from_sparse(g), mode="PY")
        xv = np.arange(6.0).reshape(2, 3)
        yv = sp.csr_matrix((np.array([1.0]), ([0], [0])), shape=(3, 4))
        got = np.asarray(f(xv, yv))
        np.testing.assert_allclose(got, xv.T @ np.ones((2, 4)))


class TestAddSDTyping:
    def test_vector_dense_rejected_at_build(self):
        xs = spb.csr_matrix("xs", dtype="float64")
        v = at.vector("v", dtype="float64")
        with pytest.raises(TypeError):
            spb.AddSD()(xs, v)

    def test_matrix_dense_types_and_runs(self):
        xs = spb.csr_matrix("xs", dtype="float64")
        d = at.matrix("d", dtype="float64")
        out = spb.AddSD()(xs, d)
        f = function([xs, d], out, mode="PY")
        xv = sp.csr_matrix((np.array([1.0]), ([0], [1])), shape=(2, 3))
        dv = np.arange(6.0).reshape(2, 3)
        np.testing.assert_allclose(np.asarray(f(xv, dv)),
                                   xv.toarray() + dv)


class TestSpSumStructuredFlag:
    def test_structured_vs_unstructured_grads_differ(self):
        xs = spb.csr_matrix("xs", dtype="float64")
        xv = sp.csr_matrix((np.array([3.0]), ([0], [1])), shape=(2, 2))

        g_str = grad(spb.sp_sum(xs, sparse_grad=True), xs)
        f1 = function([xs], spb.dense_from_sparse(g_str), mode="PY")
        got_str = np.asarray(f1(xv))
        np.testing.assert_array_equal(got_str,
                                      np.array([[0.0, 1.0], [0.0, 0.0]]))

        g_uns = grad(spb.sp_sum(xs, sparse_grad=False), xs)
        f2 = function([xs], spb.dense_from_sparse(g_uns), mode="PY")
        np.testing.assert_array_equal(np.asarray(f2(xv)), np.ones((2, 2)))


class TestSparseGradHelper:
    def test_indexing_grad_is_sparse(self):
        x = at.matrix("x", dtype="float64")
        iv = at.lvector("i")
        g = grad((asp.sparse_grad(x[iv]) ** 2).sum(), x)
        f = function([x, iv], g, mode="PY")
        Xv = np.arange(12.0).reshape(4, 3)
        Iv = np.array([1, 3, 1])
        res = f(Xv, Iv)
        assert sp.issparse(res)
        want = np.zeros_like(Xv)
        for i in Iv:
            want[i] += 2 * Xv[i]
        np.testing.assert_allclose(res.toarray(), want)

    def test_rejects_non_gather(self):
        x = at.matrix("x", dtype="float64")
        with pytest.raises(TypeError):
            asp.sparse_grad(at.exp(x))
