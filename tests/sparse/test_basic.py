"""Sparse op tests: scipy oracle + BCOO lowering where sparse leaves are
constants (reference ``tests/sparse/test_basic.py`` strategy)."""

import numpy as np
import pytest
import scipy.sparse as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu import sparse as asp
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad, verify_grad
from tests.utils import py_mode, jax_mode

rng = np.random.default_rng(41)


def random_csr(m, n, density=0.3, dtype="float64"):
    return sp.random(m, n, density=density, format="csr",
                     random_state=np.random.RandomState(0)).astype(dtype)


def test_type_filter():
    t = asp.SparseTensorType("csr", "float64")
    m = random_csr(3, 4)
    assert t.filter(m) is not None
    dense = np.ones((3, 4))
    assert sp.issparse(t.filter(dense))


def test_dense_sparse_roundtrip():
    x = at.matrix("x", dtype="float64")
    s = asp.csr_from_dense(x)
    back = asp.dense_from_sparse(s)
    f = function([x], back, mode=py_mode)
    v = rng.normal(size=(3, 4))
    np.testing.assert_allclose(f(v), v)


def test_csm_properties_roundtrip():
    sm = random_csr(4, 5)
    x = asp.csr_matrix("x", dtype="float64")
    data, indices, indptr, shape = asp.csm_properties(x)
    rebuilt = asp.CSM("csr")(data, indices, indptr, shape)
    f = function([x], asp.dense_from_sparse(rebuilt), mode=py_mode)
    np.testing.assert_allclose(f(sm), sm.toarray())


def test_structured_dot_py():
    x = asp.csr_matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = asp.structured_dot(x, y)
    f = function([x, y], out, mode=py_mode)
    sm = random_csr(4, 6)
    yv = rng.normal(size=(6, 3))
    np.testing.assert_allclose(f(sm, yv), sm @ yv)


def test_structured_dot_jax_constant_sparse():
    sm = random_csr(4, 6)
    y = at.matrix("y", dtype="float64")
    out = asp.structured_dot(asp.constant(sm), y)
    f = function([y], out, mode=jax_mode)
    yv = rng.normal(size=(6, 3))
    np.testing.assert_allclose(np.asarray(f(yv)), sm @ yv, rtol=1e-10)


def test_structured_dot_grad_dense_operand():
    sm = random_csr(4, 6)

    def build(y):
        return asp.structured_dot(asp.constant(sm), y).sum()

    verify_grad(build, [rng.normal(size=(6, 3))], mode=py_mode)


def test_structured_grad_respects_pattern():
    sm = random_csr(4, 6, density=0.3)
    x = asp.csr_matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    cost = asp.structured_dot(x, y).sum()
    gx = grad(cost, x)
    f = function([x, y], asp.dense_from_sparse(gx), mode=py_mode)
    yv = rng.normal(size=(6, 3))
    g = f(sm, yv)
    # gradient restricted to the sparsity pattern
    mask = (sm.toarray() != 0)
    full = np.outer(np.ones(4), yv.sum(axis=1))
    np.testing.assert_allclose(g[mask], full[mask])
    np.testing.assert_allclose(g[~mask], 0.0)


def test_add_mul():
    a = random_csr(3, 4)
    b = random_csr(3, 4)
    x = asp.csr_matrix("x", dtype="float64")
    y = asp.csr_matrix("y", dtype="float64")
    f = function([x, y], asp.dense_from_sparse(asp.add(x, y)), mode=py_mode)
    np.testing.assert_allclose(f(a, b), (a + b).toarray())
    fm = function([x, y], asp.dense_from_sparse(asp.mul(x, y)), mode=py_mode)
    np.testing.assert_allclose(fm(a, b), a.multiply(b).toarray())


def test_add_sd():
    a = random_csr(3, 4)
    d = at.matrix("d", dtype="float64")
    x = asp.csr_matrix("x", dtype="float64")
    f = function([x, d], asp.add(x, d), mode=py_mode)
    dv = rng.normal(size=(3, 4))
    np.testing.assert_allclose(f(a, dv), a.toarray() + dv)


def test_transpose_neg_sum():
    a = random_csr(3, 4)
    x = asp.csr_matrix("x", dtype="float64")
    f = function([x], asp.dense_from_sparse(asp.transpose(x)), mode=py_mode)
    np.testing.assert_allclose(f(a), a.T.toarray())
    fn = function([x], asp.dense_from_sparse(asp.neg(x)), mode=py_mode)
    np.testing.assert_allclose(fn(a), -a.toarray())
    fs = function([x], asp.sp_sum(x), mode=py_mode)
    np.testing.assert_allclose(fs(a), a.sum())
    fs0 = function([x], asp.sp_sum(x, axis=0), mode=py_mode)
    np.testing.assert_allclose(fs0(a), np.asarray(a.sum(0)).ravel())


def test_sampling_dot():
    p = random_csr(3, 4, density=0.5)
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    pp = asp.csr_matrix("p", dtype="float64")
    out = asp.sampling_dot(x, y, pp)
    f = function([x, y, pp], asp.dense_from_sparse(out), mode=py_mode)
    xv = rng.normal(size=(3, 5))
    yv = rng.normal(size=(4, 5))
    expected = (xv @ yv.T) * p.toarray()
    np.testing.assert_allclose(f(xv, yv, p), expected)


def test_usmm():
    a = random_csr(3, 4)
    y = at.matrix("y", dtype="float64")
    z = at.matrix("z", dtype="float64")
    x = asp.csr_matrix("x", dtype="float64")
    out = asp.usmm(at.constant(0.5), x, y, z)
    f = function([x, y, z], out, mode=py_mode)
    yv = rng.normal(size=(4, 2))
    zv = rng.normal(size=(3, 2))
    np.testing.assert_allclose(f(a, yv, zv), 0.5 * (a @ yv) + zv)


def test_sparse_shared_glm():
    # sparse GLM: the BASELINE.json config 5 workload shape (py path)
    X = random_csr(20, 8, density=0.4)
    w = atp.shared(np.zeros(8), name="w")
    xs = asp.csr_matrix("X", dtype="float64")
    y = at.vector("y", dtype="float64")
    p = at.math.sigmoid(asp.structured_dot(xs, at.shape_padright(w, 1))[:, 0])
    cost = -at.math.mean(y * at.log(p) + (1 - y) * at.log(1 - p))
    g = grad(cost, w)
    step = function([xs, y], cost, updates={w: w - 0.5 * g}, mode=py_mode)
    yv = (rng.normal(size=20) > 0).astype("float64")
    c0 = step(X, yv)
    for _ in range(20):
        c = step(X, yv)
    assert c < c0
