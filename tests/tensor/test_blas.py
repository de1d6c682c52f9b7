"""Fused multiply-accumulate BLAS ops + BlasOpt recognition
(reference tensor/blas.py Gemm:872/Gemv:231/Ger:330/GemmOptimizer:1515,
tests/tensor/test_blas.py)."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad, verify_grad
from aesara_tpu.tensor import blas

rng = np.random.default_rng(77)


def _ops(f):
    return [n.op for n in f.fgraph.apply_nodes]


class TestOps:
    def test_gemm_values_both_backends(self):
        z, x, y = at.matrix("z", dtype="float64"), at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        a, b = at.scalar("a", dtype="float64"), at.scalar("b", dtype="float64")
        out = blas.gemm(z, a, x, y, b)
        zv = rng.normal(size=(3, 5))
        xv, yv = rng.normal(size=(3, 4)), rng.normal(size=(4, 5))
        expected = 0.25 * zv + 2.0 * (xv @ yv)
        for mode in ("PY", "FAST_RUN"):
            f = function([z, a, x, y, b], out, mode=mode)
            np.testing.assert_allclose(
                np.asarray(f(zv, 2.0, xv, yv, 0.25)), expected, rtol=2e-5
            )

    def test_gemv_values_both_backends(self):
        z, x = at.vector("z", dtype="float64"), at.vector("x", dtype="float64")
        A = at.matrix("A", dtype="float64")
        out = blas.gemv(z, 0.5, A, x, 2.0)
        zv, Av, xv = rng.normal(size=3), rng.normal(size=(3, 4)), rng.normal(size=4)
        for mode in ("PY", "FAST_RUN"):
            f = function([z, A, x], out, mode=mode)
            np.testing.assert_allclose(
                np.asarray(f(zv, Av, xv)), 2.0 * zv + 0.5 * (Av @ xv),
                rtol=2e-5,
            )

    def test_ger_values_both_backends(self):
        z = at.matrix("z", dtype="float64")
        u, v = at.vector("u", dtype="float64"), at.vector("v", dtype="float64")
        out = blas.ger(z, 1.5, u, v)
        zv = rng.normal(size=(3, 5))
        uv, vv = rng.normal(size=3), rng.normal(size=5)
        for mode in ("PY", "FAST_RUN"):
            f = function([z, u, v], out, mode=mode)
            np.testing.assert_allclose(
                np.asarray(f(zv, uv, vv)), zv + 1.5 * np.outer(uv, vv),
                rtol=2e-5,
            )

    def test_dot22_and_scalar(self):
        x, y = at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        xv, yv = rng.normal(size=(3, 4)), rng.normal(size=(4, 5))
        f = function([x, y], blas._dot22(x, y), mode="PY")
        np.testing.assert_allclose(np.asarray(f(xv, yv)), xv @ yv, rtol=2e-5)
        g = function([x, y], blas._dot22scalar(x, y, np.float64(1.7)),
                     mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(g(xv, yv)), 1.7 * (xv @ yv),
                                   rtol=2e-5)

    def test_dtype_mismatch_raises(self):
        z = at.matrix("z", dtype="float32")
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        with pytest.raises(TypeError, match="single dtype"):
            blas.gemm_no_inplace(z, np.float64(1.0), x, y, np.float64(1.0))

    def test_bad_ndim_raises(self):
        v = at.vector("v", dtype="float64")
        m = at.matrix("m", dtype="float64")
        with pytest.raises(TypeError):
            blas.gemm_no_inplace(v, 1.0, m, m, 1.0)
        with pytest.raises(TypeError):
            blas.ger_no_inplace(m, 1.0, m, v)


class TestGrads:
    def test_gemm_grads_all_inputs(self):
        zv = rng.normal(size=(3, 5))
        xv, yv = rng.normal(size=(3, 4)), rng.normal(size=(4, 5))
        verify_grad(
            lambda z_, a_, x_, y_, b_: blas.gemm(z_, a_, x_, y_, b_),
            [zv, np.float64(0.3), xv, yv, np.float64(1.7)], rng=rng,
        )

    def test_gemv_grads(self):
        verify_grad(
            lambda z_, A_, x_: blas.gemv(z_, 0.9, A_, x_, 1.1),
            [rng.normal(size=3), rng.normal(size=(3, 4)), rng.normal(size=4)],
            rng=rng,
        )

    def test_ger_grads(self):
        verify_grad(
            lambda z_, x_, y_: blas.ger(z_, 0.7, x_, y_),
            [rng.normal(size=(3, 5)), rng.normal(size=3), rng.normal(size=5)],
            rng=rng,
        )

    def test_dot22scalar_grads(self):
        verify_grad(
            lambda x_, y_: blas._dot22scalar(x_, y_, np.float64(1.7)),
            [rng.normal(size=(3, 4)), rng.normal(size=(4, 5))], rng=rng,
        )


class TestBlasOpt:
    """GemmOptimizer role: the canonicalized mul/add soup refuses back
    into the fused ops (graph-topology assertions + value checks)."""

    def test_gemm_recognition_symbolic_coeffs(self):
        z, x, y = at.matrix("z", dtype="float64"), at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        a, b = at.scalar("a", dtype="float64"), at.scalar("b", dtype="float64")
        f = function([z, a, x, y, b], b * z + a * at.dot(x, y),
                     mode="FAST_RUN")
        assert any(isinstance(o, blas.Gemm) for o in _ops(f))
        zv = rng.normal(size=(3, 5))
        xv, yv = rng.normal(size=(3, 4)), rng.normal(size=(4, 5))
        np.testing.assert_allclose(
            np.asarray(f(zv, 2.0, xv, yv, 0.5)), 0.5 * zv + 2.0 * (xv @ yv),
            rtol=1e-6,
        )

    def test_gemm_recognition_constant_coeffs(self):
        z, x, y = at.matrix("z", dtype="float64"), at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        f = function([z, x, y], 0.25 * z + 4.0 * at.dot(x, y),
                     mode="FAST_RUN")
        assert any(isinstance(o, blas.Gemm) for o in _ops(f))

    def test_gemm_recognition_plain_add(self):
        """z + dot(x, y) with unit coefficients."""
        z, x, y = at.matrix("z", dtype="float64"), at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        f = function([z, x, y], z + at.dot(x, y), mode="FAST_RUN")
        assert any(isinstance(o, blas.Gemm) for o in _ops(f))

    def test_gemv_recognition(self):
        z, x = at.vector("z", dtype="float64"), at.vector("x", dtype="float64")
        A = at.matrix("A", dtype="float64")
        a = at.scalar("a", dtype="float64")
        f = function([z, a, A, x], 3.0 * z + a * at.dot(A, x),
                     mode="FAST_RUN")
        assert any(isinstance(o, blas.Gemv) for o in _ops(f))

    def test_ger_recognition(self):
        z = at.matrix("z", dtype="float64")
        u, v = at.vector("u", dtype="float64"), at.vector("v", dtype="float64")
        a = at.scalar("a", dtype="float64")
        f = function([z, a, u, v], z + a * at.outer(u, v), mode="FAST_RUN")
        assert any(isinstance(o, blas.Ger) for o in _ops(f))

    def test_dot22scalar_recognition(self):
        x, y = at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        a = at.scalar("a", dtype="float64")
        f = function([x, y, a], a * at.dot(x, y), mode="FAST_RUN")
        assert any(isinstance(o, blas.Dot22Scalar) for o in _ops(f))

    def test_shared_dot_not_fused(self):
        """When the dot is consumed elsewhere too, fusing would
        recompute the product — BlasOpt must leave it alone."""
        z, x, y = at.matrix("z", dtype="float64"), at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        d = at.dot(x, y)
        f = function([z, x, y], [z + 2.0 * d, at.exp(d)], mode="FAST_RUN")
        assert not any(isinstance(o, blas.Gemm) for o in _ops(f))

    def test_fused_training_graph_values(self):
        """A weight update W - lr*outer(g_h, x) style graph stays exact
        through recognition + inplace bands."""
        W = at.matrix("W", dtype="float64")
        h = at.vector("h", dtype="float64")
        xx = at.vector("xx", dtype="float64")
        cost = (at.tanh(at.dot(at.dot(W, xx), h))).sum()
        gW = grad(cost, W)
        new_W = W - 0.1 * gW
        f = function([W, h, xx], new_W, mode="FAST_RUN")
        f_py = function([W, h, xx], new_W, mode="PY")
        Wv = rng.normal(size=(4, 3))
        hv, xv = rng.normal(size=4), rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(f(Wv, hv, xv)), np.asarray(f_py(Wv, hv, xv)),
            rtol=2e-5,
        )


class TestInplace:
    def test_intermediate_z_becomes_inplace(self):
        """z produced inside the graph with a single client: the
        position-70 pass switches to the destructive instance."""
        x, y = at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        z = at.exp(x)  # intermediate, single client
        out = z + 2.0 * at.dot(x, y)
        f = function([x, y], out, mode="FAST_RUN")
        gemms = [o for o in _ops(f) if isinstance(o, blas.Gemm)]
        assert gemms and gemms[0].inplace
        xv, yv = rng.normal(size=(3, 3)), rng.normal(size=(3, 3))
        np.testing.assert_allclose(
            np.asarray(f(xv, yv)), np.exp(xv) + 2.0 * (xv @ yv), rtol=1e-6
        )

    def test_input_z_stays_no_inplace(self):
        z, x, y = at.matrix("z", dtype="float64"), at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        f = function([z, x, y], z + 2.0 * at.dot(x, y), mode="FAST_RUN")
        gemms = [o for o in _ops(f) if isinstance(o, blas.Gemm)]
        assert gemms and not gemms[0].inplace
        # the caller's array must be untouched on the PY path
        f_py = function([z, x, y], z + 2.0 * at.dot(x, y), mode="PY")
        zv = rng.normal(size=(3, 3))
        z_copy = zv.copy()
        f_py(zv, rng.normal(size=(3, 3)), rng.normal(size=(3, 3)))
        np.testing.assert_array_equal(zv, z_copy)

    def test_inplace_value_correct_py_mode(self):
        x, y = at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        z = at.exp(x)
        out = z + 2.0 * at.dot(x, y)
        f = function([x, y], out, mode="PY")
        xv, yv = rng.normal(size=(3, 3)), rng.normal(size=(3, 3))
        np.testing.assert_allclose(
            np.asarray(f(xv, yv)), np.exp(xv) + 2.0 * (xv @ yv), rtol=2e-5
        )
