"""Linalg case matrices (VERDICT r3 #5): the solver/factorization zoo
across shape/structure grids — QR modes, SVD variants, eig/eigh,
slogdet sign cases, matrix_power exponent grid, norm order grid,
lstsq over/under-determined, Lyapunov solvers, tensorsolve/tensorinv —
values vs numpy/scipy on both backends where lowered, py otherwise.

Reference model: ``/root/reference/tests/tensor/test_nlinalg.py`` +
``test_slinalg.py`` grids.
"""

import numpy as np
import pytest
import scipy.linalg as spla

import aesara_tpu.tensor as at
import aesara_tpu.tensor.nlinalg as nl
import aesara_tpu.tensor.slinalg as sl
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker
from tests.unittest_tools import verify_grad

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)
MODES = [(PY, "py"), (JAX, "jax")]

rng = np.random.default_rng(13)


def d(*shape):
    return rng.normal(size=shape)


def spd(n):
    a = d(n, n)
    return a @ a.T + n * np.eye(n)


def _dual(out, expect, rtol=1e-8, atol=1e-10, err="", modes=MODES):
    for mode, label in modes:
        r = np.asarray(function([], out, mode=mode)())
        np.testing.assert_allclose(r, expect, rtol=rtol, atol=atol,
                                   err_msg=f"{err} backend={label}")


class TestQRModes:
    @pytest.mark.parametrize("shape", [(4, 4), (5, 3), (3, 5)])
    def test_reduced_reconstructs(self, shape):
        v = d(*shape)
        q, r = nl.qr(at.as_tensor_variable(v), mode="reduced")
        for mode, label in MODES:
            qv, rv = [np.asarray(x) for x in
                      function([], [q, r], mode=mode)()]
            np.testing.assert_allclose(qv @ rv, v, rtol=1e-8, atol=1e-10,
                                       err_msg=label)
            k = min(shape)
            np.testing.assert_allclose(qv.T @ qv, np.eye(k), atol=1e-10,
                                       err_msg=label)
            # R upper triangular
            np.testing.assert_allclose(rv, np.triu(rv), atol=1e-12)

    def test_r_mode(self):
        v = d(4, 3)
        r = nl.qr(at.as_tensor_variable(v), mode="r")
        rv = np.asarray(function([], r, mode=PY)())
        np.testing.assert_allclose(np.abs(rv),
                                   np.abs(np.linalg.qr(v, mode="r")),
                                   rtol=1e-8)

    def test_complete_mode(self):
        v = d(5, 3)
        q, r = nl.qr(at.as_tensor_variable(v), mode="complete")
        qv, rv = [np.asarray(x) for x in function([], [q, r], mode=PY)()]
        assert qv.shape == (5, 5) and rv.shape == (5, 3)
        np.testing.assert_allclose(qv @ rv, v, rtol=1e-8, atol=1e-10)


class TestSVDVariants:
    @pytest.mark.parametrize("shape", [(4, 4), (6, 3), (3, 6)])
    def test_full_uv_reconstructs(self, shape):
        v = d(*shape)
        u, s, vt = nl.svd(at.as_tensor_variable(v), full_matrices=False)
        for mode, label in MODES:
            uv, sv, vtv = [np.asarray(x) for x in
                           function([], [u, s, vt], mode=mode)()]
            np.testing.assert_allclose(uv @ np.diag(sv) @ vtv, v,
                                       rtol=1e-7, atol=1e-9, err_msg=label)
            assert (np.diff(sv) <= 1e-12).all(), "singular values sorted"

    def test_values_only(self):
        v = d(5, 4)
        s = nl.svd(at.as_tensor_variable(v), compute_uv=False)
        _dual(s, np.linalg.svd(v, compute_uv=False), rtol=1e-8,
              err="svdvals")

    def test_pinv_via_svd_property(self):
        v = d(5, 3)
        p = nl.pinv(at.as_tensor_variable(v))
        pv = np.asarray(function([], p, mode=PY)())
        np.testing.assert_allclose(v @ pv @ v, v, rtol=1e-7, atol=1e-9)


class TestEig:
    def test_eigh_reconstructs(self):
        v = spd(4)
        w, q = nl.eigh(at.as_tensor_variable(v))
        for mode, label in MODES:
            wv, qv = [np.asarray(x) for x in
                      function([], [w, q], mode=mode)()]
            np.testing.assert_allclose(qv @ np.diag(wv) @ qv.T, v,
                                       rtol=1e-7, atol=1e-8, err_msg=label)

    def test_eigvalsh(self):
        v = spd(5)
        w = sl.eigvalsh(at.as_tensor_variable(v))
        _dual(w, np.linalg.eigvalsh(v), rtol=1e-8, err="eigvalsh")

    def test_eig_general_matches_numpy_spectrum(self):
        v = d(4, 4)
        w, _ = nl.eig(at.as_tensor_variable(v))
        wv = np.asarray(function([], w, mode=PY)())
        np.testing.assert_allclose(np.sort_complex(wv.astype("complex128")),
                                   np.sort_complex(np.linalg.eigvals(v)),
                                   rtol=1e-7)

    def test_eigh_grad(self):
        verify_grad(lambda x: nl.eigh((x + x.T) / 2)[0].sum(), [d(3, 3)],
                    rel_tol=1e-5)


class TestSLogDet:
    @pytest.mark.parametrize("mat,sign", [
        ("spd", 1.0), ("negated", -1.0),
    ])
    def test_sign_and_log(self, mat, sign):
        v = spd(3)
        if mat == "negated":
            v = v.copy()
            v[0] *= -1  # flip one row: det changes sign
        s, ld = nl.slogdet(at.as_tensor_variable(v))
        es, eld = np.linalg.slogdet(v)
        for mode, label in MODES:
            sv, ldv = [np.asarray(x) for x in
                       function([], [s, ld], mode=mode)()]
            assert float(sv) == es, label
            np.testing.assert_allclose(float(ldv), eld, rtol=1e-8)

    def test_singular_matrix(self):
        v = np.outer(d(3), d(3))  # rank 1 → det 0
        s, ld = nl.slogdet(at.as_tensor_variable(v))
        sv, ldv = [np.asarray(x) for x in function([], [s, ld],
                                                   mode=PY)()]
        assert float(sv) == 0.0 and np.isinf(float(ldv))


class TestMatrixPower:
    @pytest.mark.parametrize("n", [0, 1, 2, 3, 5, -1, -2])
    def test_exponent_grid(self, n):
        v = spd(3) / 3.0
        out = nl.matrix_power(at.as_tensor_variable(v), n)
        _dual(out, np.linalg.matrix_power(v, n), rtol=1e-7, atol=1e-9,
              err=f"power {n}", modes=[(PY, "py")])


class TestNormOrders:
    V = d(6)
    M = d(4, 5)

    @pytest.mark.parametrize("order", [2, 1, np.inf, -np.inf])
    def test_vector_orders(self, order):
        out = nl.norm(at.as_tensor_variable(self.V), order)
        _dual(out, np.linalg.norm(self.V, order), rtol=1e-10,
              err=f"vnorm {order}", modes=[(PY, "py")])

    @pytest.mark.parametrize("order", ["fro", 1, np.inf])
    def test_matrix_orders(self, order):
        out = nl.norm(at.as_tensor_variable(self.M), order)
        _dual(out, np.linalg.norm(self.M, order), rtol=1e-10,
              err=f"mnorm {order}", modes=[(PY, "py")])


class TestLstsq:
    def test_overdetermined(self):
        A, b = d(6, 3), d(6)
        out = nl.lstsq(at.as_tensor_variable(A), at.as_tensor_variable(b))
        sol = np.asarray(function([], out[0], mode=PY)())
        np.testing.assert_allclose(sol, np.linalg.lstsq(A, b, rcond=None)[0],
                                   rtol=1e-8)

    def test_underdetermined_min_norm(self):
        A, b = d(3, 6), d(3)
        out = nl.lstsq(at.as_tensor_variable(A), at.as_tensor_variable(b))
        sol = np.asarray(function([], out[0], mode=PY)())
        np.testing.assert_allclose(A @ sol, b, rtol=1e-8)


class TestSolveVariants:
    def test_cho_solve_matches_solve(self):
        A = spd(4)
        b = d(4, 2)
        c = sl.cholesky(at.as_tensor_variable(A))
        out = sl.cho_solve((c, True), at.as_tensor_variable(b))
        _dual(out, np.linalg.solve(A, b), rtol=1e-7, err="cho_solve")

    @pytest.mark.parametrize("lower,trans", [(True, 0), (False, 0),
                                             (True, 1)])
    def test_solve_triangular_grid(self, lower, trans):
        L = np.linalg.cholesky(spd(4))
        A = L if lower else L.T
        b = d(4)
        out = sl.solve_triangular(at.as_tensor_variable(A),
                                  at.as_tensor_variable(b),
                                  lower=lower, trans=trans)
        expect = spla.solve_triangular(A, b, lower=lower, trans=trans)
        _dual(out, expect, rtol=1e-8, err=f"tri {lower} {trans}")

    def test_continuous_lyapunov(self):
        A = -spd(3)  # stable
        Q = spd(3)
        out = sl.solve_continuous_lyapunov(at.as_tensor_variable(A),
                                           at.as_tensor_variable(Q))
        X = np.asarray(function([], out, mode=PY)())
        np.testing.assert_allclose(A @ X + X @ A.T, Q, rtol=1e-6,
                                   atol=1e-8)

    def test_discrete_lyapunov(self):
        A = d(3, 3) * 0.3  # spectral radius < 1
        Q = spd(3)
        out = sl.solve_discrete_lyapunov(at.as_tensor_variable(A),
                                         at.as_tensor_variable(Q))
        X = np.asarray(function([], out, mode=PY)())
        np.testing.assert_allclose(A @ X @ A.T - X + Q,
                                   np.zeros((3, 3)), atol=1e-8)


class TestTensorSolveInv:
    def test_tensorsolve(self):
        A = d(2, 3, 2, 3)
        b = d(2, 3)
        out = nl.tensorsolve(at.as_tensor_variable(A),
                             at.as_tensor_variable(b))
        x = np.asarray(function([], out, mode=PY)())
        np.testing.assert_allclose(x, np.linalg.tensorsolve(A, b),
                                   rtol=1e-8)

    def test_tensorinv_roundtrip(self):
        A = d(3, 2, 3, 2) + np.einsum(
            "ij,kl->ikjl", np.eye(3), np.eye(2)).reshape(3, 2, 3, 2) * 3
        inv = nl.tensorinv(at.as_tensor_variable(A), ind=2)
        iv = np.asarray(function([], inv, mode=PY)())
        np.testing.assert_allclose(iv, np.linalg.tensorinv(A, ind=2),
                                   rtol=1e-7)


class TestExpmFamily:
    def test_expm_vs_scipy(self):
        v = d(4, 4) * 0.4
        out = sl.expm(at.as_tensor_variable(v))
        _dual(out, spla.expm(v), rtol=1e-7, err="expm",
              modes=[(PY, "py")])

    def test_expm_of_skew_is_orthogonal(self):
        a = d(3, 3)
        skew = a - a.T
        out = sl.expm(at.as_tensor_variable(skew))
        r = np.asarray(function([], out, mode=PY)())
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-9)

    def test_matrix_dot_chain(self):
        a, b, c = d(3, 4), d(4, 5), d(5, 2)
        out = nl.matrix_dot(at.as_tensor_variable(a),
                            at.as_tensor_variable(b),
                            at.as_tensor_variable(c))
        _dual(out, a @ b @ c, rtol=1e-10, err="matrix_dot")
