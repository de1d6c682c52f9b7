"""Sparse stacking/comparison/indexing/structured-elemwise ops
(reference ``tests/sparse/test_basic.py`` HStack/VStack/GetItem/
comparison/structured sections)."""

import warnings

import numpy as np
import pytest
import scipy.sparse as sp

import aesara_tpu as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.sparse import basic as spb


@pytest.fixture
def mats():
    xv = sp.random(5, 7, density=0.4, format="csr",
                   random_state=np.random.RandomState(0))
    yv = sp.random(5, 7, density=0.4, format="csr",
                   random_state=np.random.RandomState(1))
    return xv, yv


def test_hstack_vstack(mats):
    xv, yv = mats
    x = spb.csr_matrix("x")
    y = spb.csr_matrix("y")
    f = function([x, y], spb.dense_from_sparse(spb.hstack([x, y], format="csr")),
                 mode="PY")
    assert np.allclose(f(xv, yv), sp.hstack([xv, yv]).toarray())
    fv = function([x, y], spb.dense_from_sparse(spb.vstack([x, y], format="csr")),
                  mode="PY")
    assert np.allclose(fv(xv, yv), sp.vstack([xv, yv]).toarray())


def test_hstack_vstack_grad(mats):
    xv, yv = mats
    x = spb.csr_matrix("x")
    y = spb.csr_matrix("y")
    h = spb.hstack([x, y], format="csr")
    gx = grad(spb.sp_sum(spb.mul(h, h), sparse_grad=False), x)
    fg = function([x, y], spb.dense_from_sparse(gx), mode="PY")
    assert np.allclose(fg(xv, yv), 2 * xv.toarray())
    v = spb.vstack([x, y], format="csr")
    gy = grad(spb.sp_sum(spb.mul(v, v), sparse_grad=False), y)
    fgv = function([x, y], spb.dense_from_sparse(gy), mode="PY")
    assert np.allclose(fgv(xv, yv), 2 * yv.toarray())


def test_comparisons(mats):
    xv, yv = mats
    x = spb.csr_matrix("x")
    y = spb.csr_matrix("y")
    for name, sym, ref in [
        ("lt", spb.lt, lambda a, b: a < b),
        ("gt", spb.gt, lambda a, b: a > b),
        ("neq", spb.neq, lambda a, b: a != b),
    ]:
        f = function([x, y], spb.dense_from_sparse(sym(x, y)), mode="PY")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            expect = ref(xv, yv).toarray().astype("uint8")
        assert np.array_equal(f(xv, yv), expect), name


def test_get_item_2d_and_scalar(mats):
    xv, _ = mats
    x = spb.csr_matrix("x")
    f2 = function([x], spb.dense_from_sparse(
        spb.get_item_2d(x, slice(1, 4), slice(None))), mode="PY")
    assert np.allclose(f2(xv), xv[1:4, :].toarray())
    f3 = function([x], spb.GetItemScalar()(x, 2, 3), mode="PY")
    assert np.allclose(f3(xv), xv[2, 3])


def test_structured_elemwise_keeps_pattern(mats):
    xv, _ = mats
    x = spb.csr_matrix("x")
    f = function([x], spb.dense_from_sparse(spb.structured_sigmoid(x)), mode="PY")
    res = f(xv)
    mask = xv.toarray() != 0
    assert np.allclose(res[mask], 1 / (1 + np.exp(-xv.toarray()[mask])))
    assert np.all(res[~mask] == 0)


def test_cast_diag_square_diag_clean(mats):
    xv, _ = mats
    x = spb.csr_matrix("x")
    fc = function([x], spb.dense_from_sparse(spb.sp_cast(x, "float32")), mode="PY")
    assert fc(xv).dtype == np.float32

    sq = sp.random(5, 5, density=0.4, format="csr",
                   random_state=np.random.RandomState(2))
    fd = function([x], spb.diag(x), mode="PY")
    assert np.allclose(fd(sq), sq.toarray().diagonal())

    d = at.tensor.vector("d")
    fsq = function([d], spb.dense_from_sparse(spb.square_diagonal(d)), mode="PY")
    assert np.allclose(fsq(np.arange(4.0)), np.diag(np.arange(4.0)))

    z = xv.copy()
    z.data[0] = 0.0
    fr = function([x], spb.dense_from_sparse(spb.clean(x)), mode="PY")
    assert np.allclose(fr(z), z.toarray())
    # clean actually dropped the explicit zero
    direct = spb.Remove0()
    g = function([x], spb.csm_data(spb.remove0(x)), mode="PY")
    assert g(z).size == z.nnz - 1


def test_square_diagonal_grad():
    d = at.tensor.vector("d")
    sq = spb.square_diagonal(d)
    g = grad(spb.sp_sum(spb.mul(sq, sq), sparse_grad=False), d)
    f = function([d], g, mode="PY")
    dv = np.arange(1.0, 5.0)
    assert np.allclose(f(dv), 2 * dv)
