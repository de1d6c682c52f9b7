"""Linalg rewrite pack (reference ``sandbox/linalg/ops.py``): solve
instead of inverse, triangular solves through cholesky, tag-hint
rewrites, determinant/log-prod restructuring."""

import numpy as np
import pytest
import scipy.linalg as spla

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.tensor.nlinalg import Det, MatrixInverse, det, matrix_inverse
from aesara_tpu.tensor.slinalg import Cholesky, Solve, SolveTriangular, cholesky, solve

M = atp.compile.mode.Mode("py", "fast_run")
rng = np.random.default_rng(23)


def _spd(n):
    a = rng.standard_normal((n, n))
    return (a @ a.T + n * np.eye(n)).astype("float64")


def _ops(f, kind):
    return [n.op for n in f.maker.fgraph.toposort() if isinstance(n.op, kind)]


class TestInvAsSolve:
    def test_inv_dot_becomes_solve(self):
        A = at.matrix("A", dtype="float64")
        b = at.matrix("b", dtype="float64")
        f = atp.function([A, b], tm.dot(matrix_inverse(A), b), mode=M)
        assert not _ops(f, MatrixInverse)
        assert _ops(f, (Solve, SolveTriangular))
        Av, bv = _spd(4), rng.standard_normal((4, 2))
        assert np.allclose(f(Av, bv), np.linalg.solve(Av, bv), rtol=1e-8)

    def test_dot_inv_right_becomes_solve(self):
        A = at.matrix("A", dtype="float64")
        l = at.matrix("l", dtype="float64")
        f = atp.function([A, l], tm.dot(l, matrix_inverse(A)), mode=M)
        assert not _ops(f, MatrixInverse)
        Av, lv = _spd(4), rng.standard_normal((2, 4))
        assert np.allclose(f(Av, lv), lv @ np.linalg.inv(Av), rtol=1e-8)

    def test_plain_inverse_kept(self):
        A = at.matrix("A", dtype="float64")
        f = atp.function([A], matrix_inverse(A), mode=M)
        assert _ops(f, MatrixInverse)


class TestCholeskySolve:
    def test_solve_of_cholesky_goes_triangular(self):
        A = at.matrix("A", dtype="float64")
        b = at.vector("b", dtype="float64")
        L = cholesky(A)
        f = atp.function([A, b], solve(L, b), mode=M)
        assert _ops(f, SolveTriangular)
        assert not [op for op in _ops(f, Solve)
                    if not isinstance(op, SolveTriangular)]
        Av, bv = _spd(5), rng.standard_normal(5)
        Lv = spla.cholesky(Av, lower=True)
        assert np.allclose(f(Av, bv), spla.solve_triangular(Lv, bv, lower=True),
                           rtol=1e-8)

    def test_psd_tag_uses_cholesky(self):
        A = at.matrix("A", dtype="float64")
        b = at.vector("b", dtype="float64")
        A.tag.psd = True
        f = atp.function([A, b], solve(A, b), mode=M)
        assert _ops(f, Cholesky)
        assert len(_ops(f, SolveTriangular)) == 2
        Av, bv = _spd(5), rng.standard_normal(5)
        assert np.allclose(f(Av, bv), np.linalg.solve(Av, bv), rtol=1e-7)


class TestSymmetricTags:
    def test_transpose_of_symmetric_removed(self):
        A = at.matrix("A", dtype="float64")
        A.tag.symmetric = True
        f = atp.function([A], A.T + 0.0, mode=M)
        from aesara_tpu.tensor.elemwise import DimShuffle

        assert not [op for op in _ops(f, DimShuffle)
                    if op.new_order == (1, 0)]

    def test_transinv_to_invtrans(self):
        A = at.matrix("A", dtype="float64")
        expr = matrix_inverse(A).T
        f = atp.function([A], expr, mode=M)
        Av = _spd(4)
        assert np.allclose(f(Av), np.linalg.inv(Av).T, rtol=1e-8)


class TestDetAndLog:
    def test_det_reuses_cholesky(self):
        A = at.matrix("A", dtype="float64")
        L = cholesky(A)
        f = atp.function([A], [L.sum(), det(A)], mode=M)
        assert not _ops(f, Det)
        Av = _spd(4)
        _, d = f(Av)
        assert np.allclose(d, np.linalg.det(Av), rtol=1e-8)

    def test_log_prod_positive_tag(self):
        p = at.matrix("p", dtype="float64")
        p.tag.positive = True
        f = atp.function([p], tm.log(tm.prod(p)), mode=M)
        from aesara_tpu.tensor.math import Prod

        assert not _ops(f, Prod)
        # values that would underflow prod directly
        pv = np.full((40, 40), 1e-30)
        assert np.isfinite(f(pv))
        assert np.allclose(f(pv), np.log(1e-30) * 1600)


class TestSpectralRadiusBound:
    def test_bound_holds(self):
        from aesara_tpu.sandbox.linalg import spectral_radius_bound

        X = at.matrix("X", dtype="float64")
        f = atp.function([X], spectral_radius_bound(X, 4), mode=M)
        Av = _spd(6)
        lam_max = np.linalg.eigvalsh(Av).max()
        bound = float(f(Av))
        assert bound >= lam_max - 1e-8
        assert bound <= lam_max * 6  # reasonably tight

    def test_bad_args(self):
        from aesara_tpu.sandbox.linalg import spectral_radius_bound

        X = at.matrix("X", dtype="float64")
        with pytest.raises(ValueError):
            spectral_radius_bound(X, 0)
        with pytest.raises(TypeError):
            spectral_radius_bound(at.vector("v", dtype="float64"), 2)
