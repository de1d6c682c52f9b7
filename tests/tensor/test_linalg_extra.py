"""Differential + gradient tests for nlinalg/slinalg/extra_ops/sort/special/fft."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.gradient import verify_grad
from aesara_tpu.tensor import extra_ops as xo
from aesara_tpu.tensor import nlinalg as nl
from aesara_tpu.tensor import slinalg as sl
import importlib
tsort = importlib.import_module("aesara_tpu.tensor.sort")
from aesara_tpu.tensor import special as sp
from aesara_tpu.tensor import fft as tfft
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(21)


def fm(*shape):
    return rng.normal(size=shape).astype("float32")


def dm(*shape):
    return rng.normal(size=shape)


def spd(n, dtype="float64"):
    a = rng.normal(size=(n, n)).astype(dtype)
    return a @ a.T + n * np.eye(n, dtype=dtype)


class TestNlinalg:
    def test_inverse(self):
        x = at.matrix("x", dtype="float64")
        v = spd(4)
        compare_jax_and_py([x], nl.matrix_inverse(x), [v])
        verify_grad(lambda m: nl.matrix_inverse(m).sum(), [v])

    def test_det_slogdet(self):
        x = at.matrix("x", dtype="float64")
        v = spd(3)
        compare_jax_and_py([x], nl.det(x), [v])
        compare_jax_and_py([x], list(nl.slogdet(x)), [v])
        verify_grad(lambda m: nl.det(m), [v])

    def test_eigh(self):
        x = at.matrix("x", dtype="float64")
        v = spd(4)
        w, vecs = nl.eigh(x)
        res = compare_jax_and_py([x], w, [v])
        np.testing.assert_allclose(
            np.sort(np.asarray(res[0])), np.sort(np.linalg.eigvalsh(v)), rtol=1e-6
        )
        verify_grad(lambda m: nl.eigh((m + m.T) / 2)[0].sum(), [spd(3)])

    def test_svd_qr(self):
        x = at.matrix("x", dtype="float64")
        v = dm(4, 3)
        u, s, vt = nl.svd(x)
        res = compare_jax_and_py([x], s, [v])
        np.testing.assert_allclose(
            np.asarray(res[0]), np.linalg.svd(v, compute_uv=False), rtol=1e-6
        )
        q, r = nl.qr(x)
        compare_jax_and_py([x], r, [v], assert_fn=lambda a, b: np.testing.assert_allclose(np.abs(a), np.abs(b), rtol=1e-5))

    def test_pinv_trace_power(self):
        x = at.matrix("x", dtype="float64")
        v = dm(3, 4)
        compare_jax_and_py([x], nl.pinv(x), [v])
        sq = spd(3)
        y = at.matrix("y", dtype="float64")
        compare_jax_and_py([y], nl.trace(y), [sq])
        compare_jax_and_py([y], nl.matrix_power(y, 3), [sq * 0.3])


class TestSlinalg:
    def test_cholesky_and_grad(self):
        x = at.matrix("x", dtype="float64")
        v = spd(4)
        compare_jax_and_py([x], sl.cholesky(x), [v])
        verify_grad(lambda m: sl.cholesky(m @ m.T + 4 * np.eye(3)).sum(), [dm(3, 3)])

    def test_solve(self):
        a = at.matrix("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        av, bv = spd(4), dm(4)
        compare_jax_and_py([a, b], sl.solve(a, b), [av, bv])
        verify_grad(lambda aa, bb: sl.solve(aa, bb).sum(), [av, bv])

    def test_solve_triangular(self):
        a = at.matrix("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        av = np.tril(spd(4))
        bv = dm(4)
        compare_jax_and_py([a, b], sl.solve_triangular(a, b, lower=True), [av, bv])

    def test_eigvalsh_expm_kron(self):
        x = at.matrix("x", dtype="float64")
        v = spd(3)
        compare_jax_and_py([x], sl.eigvalsh(x), [v])
        compare_jax_and_py([x], sl.expm(x * 0.1), [v])
        y = at.matrix("y", dtype="float64")
        a, b = dm(2, 3), dm(3, 2)
        res = compare_jax_and_py([x, y], sl.kron(x, y), [a, b])
        np.testing.assert_allclose(np.asarray(res[0]), np.kron(a, b), rtol=1e-6)


class TestExtraOps:
    def test_cumsum_cumprod(self):
        x = at.matrix("x", dtype="float64")
        v = dm(3, 4)
        compare_jax_and_py([x], xo.cumsum(x, axis=1), [v])
        compare_jax_and_py([x], xo.cumprod(x, axis=0), [v])
        compare_jax_and_py([x], xo.cumsum(x), [v])
        verify_grad(lambda m: xo.cumsum(m, axis=1).sum(), [v])
        verify_grad(lambda m: xo.cumsum(m).sum(), [v])

    def test_repeat(self):
        x = at.matrix("x", dtype="float64")
        v = dm(2, 3)
        compare_jax_and_py([x], xo.repeat(x, 3, axis=1), [v])
        verify_grad(lambda m: xo.repeat(m, 2, axis=0).sum() * 2, [v])

    def test_searchsorted(self):
        x = at.vector("x", dtype="float64")
        q = at.vector("q", dtype="float64")
        compare_jax_and_py([x, q], xo.searchsorted(x, q), [np.sort(dm(10)), dm(5)])

    def test_unravel_ravel(self):
        i = at.lvector("i")
        iv = np.array([1, 5, 9])
        res = compare_jax_and_py([i], list(xo.unravel_index(i, at.constant(np.array([3, 4])))), [iv])
        r = at.lvector("r")
        c = at.lvector("c")
        rr = np.array([0, 1, 2])
        cc = np.array([1, 1, 3])
        compare_jax_and_py([r, c], xo.ravel_multi_index((r, c), at.constant(np.array([3, 4]))), [rr, cc])

    def test_fill_diagonal(self):
        x = at.matrix("x", dtype="float64")
        v = dm(4, 4)
        compare_jax_and_py([x], xo.fill_diagonal(x, 7.0), [v])
        verify_grad(lambda m: xo.fill_diagonal(m, 0.0).sum(), [v])
        compare_jax_and_py([x], xo.fill_diagonal_offset(x, 5.0, 1), [v])

    def test_broadcast_to(self):
        x = at.vector("x", dtype="float64")
        v = dm(4)
        res = compare_jax_and_py([x], xo.broadcast_to(x, (3, 4)), [v])
        assert np.asarray(res[0]).shape == (3, 4)
        verify_grad(lambda m: xo.broadcast_to(m, (3, 4)).sum(), [v])

    def test_squeeze_diff_bincount(self):
        x = at.tensor3("x", dtype="float64")
        v = dm(3, 1, 4)
        res = compare_jax_and_py([x], xo.squeeze(x, 1), [v])
        assert np.asarray(res[0]).shape == (3, 4)
        y = at.vector("y", dtype="float64")
        compare_jax_and_py([y], xo.diff(y), [dm(6)])
        i = at.lvector("i")
        iv = np.array([0, 1, 1, 3])
        res = compare_jax_and_py([i], xo.bincount(i, minlength=5), [iv])
        np.testing.assert_allclose(np.asarray(res[0]), np.bincount(iv, minlength=5))

    def test_to_one_hot(self):
        i = at.lvector("i")
        iv = np.array([0, 2, 1])
        res = compare_jax_and_py([i], xo.to_one_hot(i, 3), [iv])
        np.testing.assert_allclose(np.asarray(res[0]), np.eye(3)[iv])


class TestSort:
    def test_sort_argsort(self):
        x = at.matrix("x", dtype="float64")
        v = dm(3, 5)
        compare_jax_and_py([x], tsort.sort(x, axis=1), [v])
        compare_jax_and_py([x], tsort.argsort(x, axis=0), [v])

    def test_sort_grad_1d(self):
        verify_grad(lambda m: (tsort.sort(m, axis=0) * np.arange(5.0)).sum(), [dm(5)])

    def test_topk(self):
        x = at.matrix("x", dtype="float64")
        v = dm(3, 6)
        res = compare_jax_and_py([x], tsort.topk(x, 2, axis=1), [v])
        np.testing.assert_allclose(
            np.asarray(res[0]), -np.sort(-v, axis=1)[:, :2], rtol=1e-6
        )


class TestSpecial:
    def test_softmax(self):
        x = at.matrix("x", dtype="float64")
        v = dm(3, 5)
        compare_jax_and_py([x], sp.softmax(x, axis=1), [v])
        compare_jax_and_py([x], sp.log_softmax(x, axis=-1), [v])
        verify_grad(lambda m: sp.softmax(m, axis=1)[0].sum() * 3, [v])
        verify_grad(lambda m: sp.log_softmax(m, axis=1).sum(), [v])


class TestFFT:
    def test_rfft_roundtrip(self):
        x = at.matrix("x", dtype="float64")
        v = dm(2, 8)
        f = tfft.rfft(x)
        res = compare_jax_and_py([x], f, [v])
        expected = np.fft.rfftn(v, axes=[1])
        np.testing.assert_allclose(np.asarray(res[0])[..., 0], expected.real, atol=1e-8)
        back = tfft.irfft(f)
        res2 = compare_jax_and_py([x], back, [v])
        np.testing.assert_allclose(np.asarray(res2[0]), v, atol=1e-8)


class TestXlogX:
    def test_values(self):
        from aesara_tpu.tensor.xlogx import xlogx, xlogy0

        x = at.vector("x", dtype="float64")
        v = np.array([0.0, 0.5, 2.0])
        res = compare_jax_and_py([x], xlogx(x), [v])
        np.testing.assert_allclose(np.asarray(res[0]), [0.0, 0.5 * np.log(0.5), 2 * np.log(2)])


def test_namespace_root_exports():
    """reference surfaces sort/topk/extra_ops functions at ``at.*``"""
    import aesara_tpu.tensor as t

    for name in ("topk", "argtopk", "sort", "argsort", "searchsorted",
                 "bartlett", "fill_diagonal", "cumsum", "repeat", "unique"):
        assert getattr(t, name) is not None, name


def test_convolve_matches_numpy():
    import aesara_tpu as atp
    import aesara_tpu.tensor as t

    x = t.vector("x")
    xv = np.arange(5.0, dtype="float32")
    for kv in (np.array([1.0, 2.0, 3.0]), np.ones(7), np.ones(4), np.ones(1)):
        k = t.as_tensor_variable(kv.astype("float32"))
        for mode in ("full", "valid", "same"):
            if mode == "valid" and len(kv) > len(xv):
                continue
            f = atp.function([x], t.convolve(x, k, mode=mode), mode="PY")
            got, exp = f(xv), np.convolve(xv, kv, mode)
            assert got.shape == exp.shape and np.allclose(got, exp), (len(kv), mode)


def test_check_stack_trace():
    import aesara_tpu as atp
    import aesara_tpu.tensor as t
    from aesara_tpu.graph.rewriting.basic import check_stack_trace

    x = t.vector("x")
    f = atp.function([x], t.math.exp(x) * 2)
    assert check_stack_trace(f, ops_to_check="last", bug_print="ignore")


def test_linalg_gradient_sweep():
    """verify_grad over the risky linalg grads (reference
    tests/tensor/test_nlinalg.py / test_slinalg.py strategy)."""
    from aesara_tpu.gradient import verify_grad
    import aesara_tpu.tensor.nlinalg as nl
    import aesara_tpu.tensor.slinalg as sl
    from aesara_tpu.tensor import math as tm

    rng = np.random.RandomState(42)
    A = rng.randn(4, 4)
    Aspd = A @ A.T + 4 * np.eye(4)
    B = rng.randn(4, 3)

    verify_grad(lambda M: nl.inv(M), [Aspd], rng=rng)
    verify_grad(lambda M: nl.det(M), [Aspd], rng=rng)
    verify_grad(lambda M: nl.trace(M), [A], rng=rng)
    verify_grad(lambda M: nl.eigh((M + M.T) / 2)[0], [Aspd], rng=rng)
    verify_grad(lambda M: sl.cholesky(M), [Aspd], rng=rng,
                abs_tol=1e-5, rel_tol=1e-5)
    verify_grad(lambda M: sl.Cholesky(lower=False)(M), [Aspd], rng=rng,
                abs_tol=1e-5, rel_tol=1e-5)
    verify_grad(lambda M, b: sl.solve(M, b), [Aspd, B], rng=rng)
    verify_grad(lambda M, b: sl.solve_triangular(M, b, lower=True),
                [np.tril(Aspd), B], rng=rng)
    # composite: log-determinant via cholesky (the common GP/MVN path)
    verify_grad(lambda M: 2.0 * tm.sum(tm.log(sl.cholesky(M).diagonal())),
                [Aspd], rng=rng, abs_tol=1e-5, rel_tol=1e-5)


def test_gradient_sweep_extra_ops():
    """verify_grad over hand-written grads that were gaps: cumprod,
    sort, topk (all axes), plus a broad regression set."""
    import importlib

    from aesara_tpu.gradient import verify_grad
    from aesara_tpu.tensor import extra_ops as eo

    tsort_mod = importlib.import_module("aesara_tpu.tensor.sort")
    rng = np.random.RandomState(7)
    M = rng.randn(4, 5)
    v = rng.randn(6)

    verify_grad(lambda x: eo.cumprod(x + 2.0, axis=1), [M], rng=rng,
                abs_tol=1e-5, rel_tol=1e-5)
    verify_grad(lambda x: eo.cumprod(x + 2.0), [M], rng=rng,
                abs_tol=1e-5, rel_tol=1e-5)
    verify_grad(lambda x: tsort_mod.sort(x, axis=-1), [v], rng=rng)
    verify_grad(lambda x: tsort_mod.topk(x, 3, axis=-1), [v], rng=rng)
    verify_grad(lambda x: tsort_mod.topk(x, 2, axis=0), [M], rng=rng)
