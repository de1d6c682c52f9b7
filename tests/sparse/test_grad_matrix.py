"""Sparse gradient matrix (VERDICT r4 item 4): a structured
finite-difference checker (the reference's ``verify_grad_sparse``,
``/root/reference/tests/sparse/test_basic.py:80``) swept over the op
family — unary structure ops, binary ss/sd ops, scaling ops, reductions,
dots — plus FAST_RUN full-pipeline differentials vs scipy and build/run
error paths.

Structured gradients are only defined ON the sparsity pattern, so the
checker perturbs stored nonzeros (never structural zeros) and compares
the analytic gradient at those positions against central differences.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.sparse import basic as spb

rng = np.random.default_rng(5151)


def rand_sp(m=5, n=7, density=0.4, fmt="csr", seed=0, positive=False):
    x = sp.random(m, n, density=density, format=fmt,
                  random_state=np.random.RandomState(seed))
    if positive:
        x.data = np.abs(x.data) + 0.5
    else:
        x.data = x.data + np.sign(x.data) * 0.3  # keep away from 0
    return x


def structured_fd_check(build_cost, xv, fmt, rtol=1e-4, n_probe=6,
                        extra_inputs=(), extra_values=()):
    """``build_cost(x, *extras) -> scalar cost``; checks d(cost)/d(data)
    at up to ``n_probe`` stored positions of ``xv`` against central
    differences computed by perturbing the scipy matrix's .data."""
    x = spb.matrix(fmt, "x", dtype="float64")
    cost = build_cost(x, *extra_inputs)
    g = grad(cost, x)
    g_dense = spb.dense_from_sparse(g) if hasattr(g.type, "format") else g
    fg = function([x, *extra_inputs], g_dense, mode="PY")
    fc = function([x, *extra_inputs], cost, mode="PY")
    ga = np.asarray(fg(xv, *extra_values))

    eps = 1e-6
    nnz = xv.nnz
    probe = range(min(n_probe, nnz))
    coo = xv.tocoo()
    for k in probe:
        xp = xv.copy(); xm = xv.copy()
        xp.data = xp.data.copy(); xm.data = xm.data.copy()
        # .tocoo() preserves data order for csr/csc
        xp.data[k] += eps
        xm.data[k] -= eps
        fd = (float(np.asarray(fc(xp, *extra_values)))
              - float(np.asarray(fc(xm, *extra_values)))) / (2 * eps)
        r, c = int(coo.row[k]), int(coo.col[k])
        np.testing.assert_allclose(
            ga[r, c], fd, rtol=rtol, atol=1e-6,
            err_msg=f"structured grad mismatch at ({r},{c}) fmt={fmt}")


FMTS = ["csr", "csc"]


# ---------------------------------------------------------------------------
# unary structure ops
# ---------------------------------------------------------------------------

class TestUnaryGrads:
    @pytest.mark.parametrize("fmt", FMTS)
    def test_neg(self, fmt):
        structured_fd_check(
            lambda x: spb.sp_sum(spb.mul(spb.neg(x), spb.neg(x))),
            rand_sp(fmt=fmt), fmt)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_transpose(self, fmt):
        structured_fd_check(
            lambda x: spb.sp_sum(spb.mul(spb.transpose(x),
                                         spb.transpose(x))),
            rand_sp(fmt=fmt), fmt)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_dense_from_sparse(self, fmt):
        structured_fd_check(
            lambda x: tm.sum(tm.sqr(spb.dense_from_sparse(x))),
            rand_sp(fmt=fmt), fmt)

    @pytest.mark.parametrize("op_name,sym", [
        ("tanh", "tanh_sp"), ("sqr", "sqr_sp"), ("exp", "structured_exp"),
        ("sigmoid", "structured_sigmoid"), ("sin", "sin_sp"),
        ("arctan", "arctan_sp"), ("sinh", "sinh_sp"),
    ])
    def test_structured_elemwise(self, op_name, sym):
        op = getattr(spb, sym)
        structured_fd_check(lambda x: spb.sp_sum(op(x)),
                            rand_sp(fmt="csr", seed=3), "csr")

    @pytest.mark.parametrize("sym", ["structured_log", "structured_sqrt"])
    def test_structured_elemwise_positive_domain(self, sym):
        op = getattr(spb, sym)
        structured_fd_check(lambda x: spb.sp_sum(op(x)),
                            rand_sp(fmt="csr", seed=4, positive=True), "csr")

    def test_remove0_grad(self):
        structured_fd_check(
            lambda x: spb.sp_sum(spb.mul(spb.remove0(x), spb.remove0(x))),
            rand_sp(fmt="csr", seed=5), "csr")

    def test_diag_grad(self):
        xv = rand_sp(6, 6, fmt="csr", seed=6)
        structured_fd_check(lambda x: tm.sum(tm.sqr(spb.diag(x))), xv, "csr")


# ---------------------------------------------------------------------------
# reductions: sp_sum over the axis grid
# ---------------------------------------------------------------------------

class TestSpSumGrads:
    @pytest.mark.parametrize("fmt", FMTS)
    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_sp_sum_axis(self, fmt, axis):
        def cost(x):
            s = spb.sp_sum(x, axis=axis)
            return s if axis is None else tm.sum(tm.sqr(s))
        structured_fd_check(cost, rand_sp(fmt=fmt, seed=7), fmt)

    def test_sp_sum_sparse_grad_variant(self):
        def cost(x):
            return spb.sp_sum(x, axis=None, sparse_grad=True)
        structured_fd_check(cost, rand_sp(fmt="csr", seed=8), "csr")


# ---------------------------------------------------------------------------
# binary ss / sd ops
# ---------------------------------------------------------------------------

class TestBinaryGrads:
    @pytest.mark.parametrize("fmt", FMTS)
    def test_add_ss_wrt_left(self, fmt):
        yv = rand_sp(fmt=fmt, seed=9)
        y = spb.matrix(fmt, "y", dtype="float64")
        structured_fd_check(
            lambda x, yy: spb.sp_sum(spb.mul(spb.add(x, yy),
                                             spb.add(x, yy))),
            rand_sp(fmt=fmt, seed=10), fmt,
            extra_inputs=(y,), extra_values=(yv,))

    @pytest.mark.parametrize("fmt", FMTS)
    def test_mul_ss_wrt_left(self, fmt):
        yv = rand_sp(fmt=fmt, seed=11)
        y = spb.matrix(fmt, "y", dtype="float64")
        structured_fd_check(
            lambda x, yy: spb.sp_sum(spb.mul(x, yy)),
            rand_sp(fmt=fmt, seed=12), fmt,
            extra_inputs=(y,), extra_values=(yv,))

    @pytest.mark.parametrize("fmt", FMTS)
    def test_add_sd_wrt_sparse(self, fmt):
        dv = rng.normal(size=(5, 7))
        d = at.matrix("d", dtype="float64")
        structured_fd_check(
            lambda x, dd: tm.sum(tm.sqr(spb.add(x, dd))),
            rand_sp(fmt=fmt, seed=13), fmt,
            extra_inputs=(d,), extra_values=(dv,))

    @pytest.mark.parametrize("fmt", FMTS)
    def test_mul_sd_wrt_sparse(self, fmt):
        dv = rng.normal(size=(5, 7)) + 2.0
        d = at.matrix("d", dtype="float64")
        structured_fd_check(
            lambda x, dd: spb.sp_sum(spb.mul(x, dd)),
            rand_sp(fmt=fmt, seed=14), fmt,
            extra_inputs=(d,), extra_values=(dv,))

    def test_mul_sd_wrt_dense(self):
        """grad wrt the DENSE operand of mul(sparse, dense) — dense-side
        gradients are full, so plain closed form: d/dd sp_sum(x*d) = x."""
        xv = rand_sp(fmt="csr", seed=15)
        x = spb.csr_matrix("x", dtype="float64")
        d = at.matrix("d", dtype="float64")
        g = grad(spb.sp_sum(spb.mul(x, d)), d)
        f = function([x, d], g, mode="PY")
        got = np.asarray(f(xv, rng.normal(size=(5, 7))))
        np.testing.assert_allclose(got, xv.toarray(), rtol=1e-10)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_mul_s_v_wrt_sparse(self, fmt):
        vv = rng.normal(size=7) + 2.0
        v = at.vector("v", dtype="float64")
        structured_fd_check(
            lambda x, w: spb.sp_sum(spb.mul_s_v(x, w)),
            rand_sp(fmt=fmt, seed=16), fmt,
            extra_inputs=(v,), extra_values=(vv,))

    @pytest.mark.parametrize("fmt", FMTS)
    def test_structured_add_s_v_wrt_sparse(self, fmt):
        vv = rng.normal(size=7)
        v = at.vector("v", dtype="float64")
        structured_fd_check(
            lambda x, w: spb.sp_sum(
                spb.mul(spb.structured_add_s_v(x, w),
                        spb.structured_add_s_v(x, w))),
            rand_sp(fmt=fmt, seed=17), fmt,
            extra_inputs=(v,), extra_values=(vv,))

    @pytest.mark.parametrize("scale_fn,axis_len", [("col_scale", 7),
                                                   ("row_scale", 5)])
    def test_scale_wrt_sparse(self, scale_fn, axis_len):
        fn = getattr(spb, scale_fn)
        vv = rng.normal(size=axis_len) + 2.0
        v = at.vector("v", dtype="float64")
        structured_fd_check(
            lambda x, w: spb.sp_sum(fn(x, w)),
            rand_sp(fmt="csc", seed=18), "csc",
            extra_inputs=(v,), extra_values=(vv,))


# ---------------------------------------------------------------------------
# dots
# ---------------------------------------------------------------------------

class TestDotGrads:
    @pytest.mark.parametrize("fmt", FMTS)
    def test_structured_dot_wrt_sparse(self, fmt):
        bv = rng.normal(size=(7, 3))
        b = at.matrix("b", dtype="float64")
        structured_fd_check(
            lambda x, bb: tm.sum(tm.sqr(spb.structured_dot(x, bb))),
            rand_sp(fmt=fmt, seed=19), fmt,
            extra_inputs=(b,), extra_values=(bv,))

    def test_structured_dot_wrt_dense(self):
        xv = rand_sp(fmt="csr", seed=20)
        x = spb.csr_matrix("x", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = spb.structured_dot(x, b)
        g = grad(tm.sum(out), b)
        f = function([x, b], g, mode="PY")
        got = np.asarray(f(xv, rng.normal(size=(7, 3))))
        # d/db sum(x @ b) = x^T @ ones
        np.testing.assert_allclose(
            got, xv.T.toarray() @ np.ones((5, 3)), rtol=1e-10)

    @pytest.mark.parametrize("fmt", FMTS)
    def test_dot_wrt_sparse(self, fmt):
        bv = rng.normal(size=(7, 3))
        b = at.matrix("b", dtype="float64")
        structured_fd_check(
            lambda x, bb: tm.sum(tm.sqr(spb.dot(x, bb))),
            rand_sp(fmt=fmt, seed=21), fmt,
            extra_inputs=(b,), extra_values=(bv,))

    def test_true_dot_wrt_sparse(self):
        yv = rand_sp(7, 4, fmt="csc", seed=22)
        y = spb.csc_matrix("y", dtype="float64")
        structured_fd_check(
            lambda x, yy: spb.sp_sum(spb.true_dot(x, yy)),
            rand_sp(fmt="csr", seed=23), "csr",
            extra_inputs=(y,), extra_values=(yv,))

    def test_usmm_wrt_dense_operands(self):
        xv = rand_sp(5, 7, fmt="csr", seed=24)
        x = spb.csr_matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        z = at.matrix("z", dtype="float64")
        alpha = at.scalar("alpha", dtype="float64")
        out = spb.usmm(alpha, x, y, z)
        yv = rng.normal(size=(7, 3))
        zv = rng.normal(size=(5, 3))
        gy, gz, ga = grad(tm.sum(tm.sqr(out)), [y, z, alpha])
        f = function([alpha, x, y, z], [out, gy, gz, ga], mode="PY")
        o, gyv, gzv, gav = f(0.7, xv, yv, zv)
        expect = 0.7 * (xv @ yv) + zv
        np.testing.assert_allclose(np.asarray(o), expect, rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(gy_fd(xv, yv, zv, 0.7)), np.asarray(gyv), rtol=1e-5)

    def test_sampling_dot_wrt_dense(self):
        pv = rand_sp(5, 6, fmt="csr", seed=25)
        p = spb.csr_matrix("p", dtype="float64")
        xx = at.matrix("xx", dtype="float64")
        yy = at.matrix("yy", dtype="float64")
        out = spb.sampling_dot(xx, yy, p)
        xv = rng.normal(size=(5, 4))
        yv = rng.normal(size=(6, 4))
        cost = spb.sp_sum(spb.mul(out, out))
        g = grad(cost, xx)
        f = function([xx, yy, p], g, mode="PY")
        fc = function([xx, yy, p], cost, mode="PY")
        ga = np.asarray(f(xv, yv, pv))
        eps = 1e-6
        for (i, j) in [(0, 0), (2, 1), (4, 3)]:
            xp = xv.copy(); xm = xv.copy()
            xp[i, j] += eps; xm[i, j] -= eps
            fd = (float(np.asarray(fc(xp, yv, pv)))
                  - float(np.asarray(fc(xm, yv, pv)))) / (2 * eps)
            np.testing.assert_allclose(ga[i, j], fd, rtol=1e-4, atol=1e-7)


def gy_fd(xv, yv, zv, alpha, eps=1e-6):
    """Central differences for d sum((alpha·x@y + z)²) / dy."""
    out = np.zeros_like(yv)
    for i in range(yv.shape[0]):
        for j in range(yv.shape[1]):
            yp = yv.copy(); ym = yv.copy()
            yp[i, j] += eps; ym[i, j] -= eps
            fp = np.sum((alpha * (xv @ yp) + zv) ** 2)
            fm = np.sum((alpha * (xv @ ym) + zv) ** 2)
            out[i, j] = (fp - fm) / (2 * eps)
    return out


# ---------------------------------------------------------------------------
# FAST_RUN pipeline differentials vs scipy (rewrites ON, XLA bridge)
# ---------------------------------------------------------------------------

class TestFastRunCompositions:
    @pytest.mark.parametrize("fmt", FMTS)
    def test_add_mul_chain(self, fmt):
        xv, yv = rand_sp(fmt=fmt, seed=26), rand_sp(fmt=fmt, seed=27)
        x = spb.matrix(fmt, "x", dtype="float64")
        y = spb.matrix(fmt, "y", dtype="float64")
        out = spb.dense_from_sparse(spb.add(spb.mul(x, y), x))
        f = function([x, y], out, mode="FAST_RUN")
        expect = (xv.multiply(yv) + xv).toarray()
        np.testing.assert_allclose(np.asarray(f(xv, yv)), expect,
                                   rtol=1e-10)

    def test_dot_then_elemwise(self, ):
        xv = rand_sp(fmt="csr", seed=28)
        x = spb.csr_matrix("x", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = tm.tanh(spb.structured_dot(x, b)).sum(axis=1)
        bv = rng.normal(size=(7, 3))
        f = function([x, b], out, mode="FAST_RUN")
        expect = np.tanh(xv.toarray() @ bv).sum(axis=1)
        np.testing.assert_allclose(np.asarray(f(xv, bv)), expect,
                                   rtol=1e-8)

    def test_training_step_structured_dot(self):
        """A sparse GLM step end-to-end in FAST_RUN: forward, grad wrt
        dense weights, update — values match the numpy computation."""
        xv = rand_sp(8, 6, density=0.5, fmt="csr", seed=29)
        w = atp.shared(rng.normal(size=(6, 1)), name="w")
        x = spb.csr_matrix("x", dtype="float64")
        t = at.matrix("t", dtype="float64")
        pred = spb.structured_dot(x, w)
        loss = tm.mean(tm.sqr(pred - t))
        gw = grad(loss, w)
        f = function([x, t], loss, updates={w: w - 0.1 * gw},
                     mode="FAST_RUN")
        w0 = w.get_value().copy()
        tv = rng.normal(size=(8, 1))
        l0 = float(np.asarray(f(xv, tv)))
        Xd = xv.toarray()
        expect_loss = np.mean((Xd @ w0 - tv) ** 2)
        assert np.isclose(l0, expect_loss, rtol=1e-8)
        expect_gw = 2.0 / 8 * Xd.T @ (Xd @ w0 - tv)
        np.testing.assert_allclose(w.get_value(), w0 - 0.1 * expect_gw,
                                   rtol=1e-8)

    @pytest.mark.parametrize("dtype", ["float32", "float64"])
    def test_dtype_grid_add_dot(self, dtype):
        xv = rand_sp(fmt="csr", seed=30).astype(dtype)
        x = spb.csr_matrix("x", dtype=dtype)
        b = at.matrix("b", dtype=dtype)
        bv = rng.normal(size=(7, 2)).astype(dtype)
        out = spb.structured_dot(x, b)
        f = function([x, b], out, mode="FAST_RUN")
        rtol = 1e-4 if dtype == "float32" else 1e-10
        np.testing.assert_allclose(np.asarray(f(xv, bv)),
                                   xv.toarray() @ bv, rtol=rtol)
        assert np.asarray(f(xv, bv)).dtype == np.dtype(dtype)


# ---------------------------------------------------------------------------
# error paths
# ---------------------------------------------------------------------------

class TestErrorPaths:
    def test_bad_format_string(self):
        with pytest.raises((ValueError, TypeError, KeyError, AssertionError)):
            spb.matrix("coo-bogus", "x", dtype="float64")

    def test_add_shape_mismatch_runtime(self):
        x = spb.csr_matrix("x", dtype="float64")
        y = spb.csr_matrix("y", dtype="float64")
        f = function([x, y], spb.sp_sum(spb.add(x, y)), mode="PY")
        with pytest.raises(Exception):
            f(rand_sp(5, 7, seed=31), rand_sp(4, 7, seed=32))

    def test_structured_dot_inner_dim_mismatch(self):
        x = spb.csr_matrix("x", dtype="float64")
        b = at.matrix("b", dtype="float64")
        f = function([x, b], spb.structured_dot(x, b), mode="PY")
        with pytest.raises(Exception):
            f(rand_sp(5, 7, seed=33), rng.normal(size=(6, 3)))

    def test_get_item_scalar_out_of_bounds(self):
        x = spb.csr_matrix("x", dtype="float64")
        i = at.iscalar("i")
        j = at.iscalar("j")
        f = function([x, i, j], spb.GetItemScalar()(x, i, j), mode="PY")
        with pytest.raises(Exception):
            f(rand_sp(5, 7, seed=34), 10, 0)

    def test_dense_input_converted_nonstrict_rejected_strict(self):
        """The reference filter CONVERTS a dense array to the sparse
        format when non-strict (``/root/reference/aesara/sparse/type.py:120``)
        and rejects it under In(strict=True) — pin both sides."""
        from aesara_tpu.compile.io import In

        dense = rng.normal(size=(5, 7))
        x = spb.csr_matrix("x", dtype="float64")
        f = function([x], spb.sp_sum(x), mode="PY")
        assert np.isclose(float(np.asarray(f(dense))), dense.sum())
        x2 = spb.csr_matrix("x2", dtype="float64")
        fs = function([In(x2, strict=True)], spb.sp_sum(x2), mode="PY")
        with pytest.raises((TypeError, ValueError)):
            fs(dense)

    def test_mul_s_v_length_mismatch(self):
        x = spb.csr_matrix("x", dtype="float64")
        v = at.vector("v", dtype="float64")
        f = function([x, v], spb.sp_sum(spb.mul_s_v(x, v)), mode="PY")
        with pytest.raises(Exception):
            f(rand_sp(5, 7, seed=35), rng.normal(size=3))
