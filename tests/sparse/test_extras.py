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
    x = spb.csr_matrix("x", dtype="float64")
    y = spb.csr_matrix("y", dtype="float64")
    f = function([x, y], spb.dense_from_sparse(spb.hstack([x, y], format="csr")),
                 mode="PY")
    assert np.allclose(f(xv, yv), sp.hstack([xv, yv]).toarray())
    fv = function([x, y], spb.dense_from_sparse(spb.vstack([x, y], format="csr")),
                  mode="PY")
    assert np.allclose(fv(xv, yv), sp.vstack([xv, yv]).toarray())


def test_hstack_vstack_grad(mats):
    xv, yv = mats
    x = spb.csr_matrix("x", dtype="float64")
    y = spb.csr_matrix("y", dtype="float64")
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
    x = spb.csr_matrix("x", dtype="float64")
    y = spb.csr_matrix("y", dtype="float64")
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
    x = spb.csr_matrix("x", dtype="float64")
    f2 = function([x], spb.dense_from_sparse(
        spb.get_item_2d(x, slice(1, 4), slice(None))), mode="PY")
    assert np.allclose(f2(xv), xv[1:4, :].toarray())
    f3 = function([x], spb.GetItemScalar()(x, 2, 3), mode="PY")
    assert np.allclose(f3(xv), xv[2, 3])


def test_structured_elemwise_keeps_pattern(mats):
    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    f = function([x], spb.dense_from_sparse(spb.structured_sigmoid(x)), mode="PY")
    res = f(xv)
    mask = xv.toarray() != 0
    assert np.allclose(res[mask], 1 / (1 + np.exp(-xv.toarray()[mask])))
    assert np.all(res[~mask] == 0)


def test_cast_diag_square_diag_clean(mats):
    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    fc = function([x], spb.dense_from_sparse(spb.sp_cast(x, "float32")), mode="PY")
    assert fc(xv).dtype == np.float32

    sq = sp.random(5, 5, density=0.4, format="csr",
                   random_state=np.random.RandomState(2))
    fd = function([x], spb.diag(x), mode="PY")
    assert np.allclose(fd(sq), sq.toarray().diagonal())

    d = at.tensor.vector("d", dtype="float64")
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
    d = at.tensor.vector("d", dtype="float64")
    sq = spb.square_diagonal(d)
    g = grad(spb.sp_sum(spb.mul(sq, sq), sparse_grad=False), d)
    f = function([d], g, mode="PY")
    dv = np.arange(1.0, 5.0)
    assert np.allclose(f(dv), 2 * dv)


def test_mul_s_v_and_grad(mats):
    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    v = at.tensor.vector("v", dtype="float64")
    vv = np.arange(1.0, 8.0)
    f = function([x, v], spb.dense_from_sparse(spb.mul_s_v(x, v)), mode="PY")
    assert np.allclose(f(xv, vv), xv.toarray() * vv)
    loss = spb.sp_sum(spb.mul(spb.mul_s_v(x, v), spb.mul_s_v(x, v)),
                      sparse_grad=False)
    fg = function([x, v], grad(loss, v), mode="PY")
    assert np.allclose(fg(xv, vv), 2 * (xv.toarray() ** 2 * vv).sum(axis=0))


def test_structured_add_s_v(mats):
    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    v = at.tensor.vector("v", dtype="float64")
    vv = np.arange(1.0, 8.0)
    f = function([x, v], spb.dense_from_sparse(spb.structured_add_s_v(x, v)),
                 mode="PY")
    expect = xv.toarray().copy()
    mask = xv.toarray() != 0
    expect[mask] += np.broadcast_to(vv, expect.shape)[mask]
    assert np.allclose(f(xv, vv), expect)
    fg = function([x, v], grad(spb.sp_sum(spb.structured_add_s_v(x, v),
                                          sparse_grad=False), v), mode="PY")
    assert np.allclose(fg(xv, vv), mask.sum(axis=0).astype("float64"))


def test_get_item_list_and_grad(mats):
    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    idx = at.tensor.as_tensor_variable(np.array([2, 0, 2], dtype="int64"))
    gl = spb.get_item_list(x, idx)
    f = function([x], spb.dense_from_sparse(gl), mode="PY")
    assert np.allclose(f(xv), xv[np.array([2, 0, 2])].toarray())
    fg = function([x], spb.dense_from_sparse(
        grad(spb.sp_sum(spb.mul(gl, gl), sparse_grad=False), x)), mode="PY")
    expected = np.zeros_like(xv.toarray())
    for r in [2, 0, 2]:
        expected[r] += 2 * xv.toarray()[r]
    assert np.allclose(fg(xv), expected)


def test_get_item_2lists_and_construct(mats):
    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    f = function([x], spb.get_item_2lists(
        x, np.array([0, 1], dtype="int64"), np.array([1, 2], dtype="int64")),
        mode="PY")
    assert np.allclose(f(xv), [xv[0, 1], xv[1, 2]])

    vals = at.tensor.matrix("vals", dtype="float64")
    idx = at.tensor.as_tensor_variable(np.array([2, 0, 2], dtype="int64"))
    # reference signature: (x supplying the shape, values, ilist)
    cs = spb.construct_sparse_from_list(
        at.tensor.as_tensor_variable(np.zeros((5, 7), dtype="float32")),
        vals, idx)
    f5 = function([vals], spb.dense_from_sparse(cs), mode="PY")
    vv2 = np.ones((3, 7), dtype="float32")
    exp = np.zeros((5, 7))
    for r in [2, 0, 2]:
        exp[r] += 1
    assert np.allclose(f5(vv2), exp)


def test_pattern_samplers(mats):
    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    f = function([x], spb.dense_from_sparse(spb.poisson(x)), mode="PY")
    out = f(xv)
    assert np.all(out[xv.toarray() == 0] == 0)  # pattern preserved (or shrunk)
    fb = function([x], spb.dense_from_sparse(spb.binomial_sample(x)), mode="PY")
    assert set(np.unique(fb(xv))) <= {0.0, 1.0}


def test_true_dot_sparse_result(mats):
    xv, _ = mats                      # 5x7 csr
    wv = np.random.RandomState(2).standard_normal((7, 3))
    x = spb.csr_matrix("x", dtype="float64")
    w = at.tensor.matrix("w", dtype="float64")
    out = spb.true_dot(x, w)
    assert isinstance(out.type, type(x.type))
    f = function([x, w], spb.dense_from_sparse(out), mode="PY")
    assert np.allclose(f(xv, wv), xv.toarray() @ wv)
    # sparse @ sparse stays sparse
    yv = sp.random(7, 4, density=0.4, format="csr",
                   random_state=np.random.RandomState(3))
    y = spb.csr_matrix("y", dtype="float64")
    g = function([x, y], spb.dense_from_sparse(spb.true_dot(x, y)), mode="PY")
    assert np.allclose(g(xv, yv), (xv @ yv).toarray())


def test_true_dot_grad(mats):
    xv, _ = mats
    wv = np.random.RandomState(4).standard_normal((7, 3)).astype("float64")
    x = spb.csr_matrix("x", dtype="float64")
    w = at.tensor.matrix("w", dtype="float64")
    cost = spb.sp_sum(spb.true_dot(x, w))
    gw = grad(cost, w)
    f = function([x, w], gw, mode="PY")
    got = f(xv, wv)
    # d/dw sum(x@w) = x^T @ ones
    want = xv.toarray().T @ np.ones((5, 3))
    assert np.allclose(got, want)


def test_col_row_scale_values(mats):
    xv, _ = mats
    sv = np.random.RandomState(5).standard_normal(7)
    rv = np.random.RandomState(6).standard_normal(5)
    for fmt in ("csr", "csc"):
        x = spb.matrix(fmt, "x", dtype="float64")
        s = at.tensor.vector("s", dtype="float64")
        f = function([x, s], spb.dense_from_sparse(spb.col_scale(x, s)), mode="PY")
        assert np.allclose(f(xv.asformat(fmt), sv), xv.toarray() * sv[None, :])
        r = at.tensor.vector("r", dtype="float64")
        g = function([x, r], spb.dense_from_sparse(spb.row_scale(x, r)), mode="PY")
        assert np.allclose(g(xv.asformat(fmt), rv), xv.toarray() * rv[:, None])


def test_col_scale_grad(mats):
    xv, _ = mats
    sv = np.random.RandomState(7).standard_normal(7)
    x = spb.csc_matrix("x", dtype="float64")
    s = at.tensor.vector("s", dtype="float64")
    cost = spb.sp_sum(spb.col_scale(x, s))
    gs = grad(cost, s)
    f = function([x, s], gs, mode="PY")
    # d/ds_j sum(x * s_j per column) = sum of column j of x
    assert np.allclose(f(xv.tocsc(), sv), np.asarray(xv.sum(axis=0)).ravel())


def test_add_s_s_data(mats):
    xv, _ = mats
    yv = xv.copy()
    yv.data = np.random.RandomState(8).standard_normal(len(xv.data))
    x = spb.csr_matrix("x", dtype="float64")
    y = spb.csr_matrix("y", dtype="float64")
    f = function([x, y], spb.dense_from_sparse(spb.add_s_s_data(x, y)), mode="PY")
    assert np.allclose(f(xv, yv), (xv + yv).toarray())
    cost = spb.sp_sum(spb.add_s_s_data(x, y))
    gx = grad(cost, x)
    gfn = function([x, y], spb.dense_from_sparse(gx), mode="PY")
    got = gfn(xv, yv)
    assert np.allclose(got[xv.toarray() != 0], 1.0)


def test_sparse_dense_comparisons(mats):
    xv, _ = mats
    dv = np.random.RandomState(9).standard_normal((5, 7))
    x = spb.csr_matrix("x", dtype="float64")
    d = at.tensor.matrix("d", dtype="float64")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for fn, npop in ((spb.lt, np.less), (spb.gt, np.greater),
                         (spb.le, np.less_equal), (spb.ge, np.greater_equal)):
            out = fn(x, d)
            f = function([x, d], out, mode="PY")
            assert np.array_equal(f(xv, dv), npop(xv.toarray(), dv).astype("uint8"))
            # mirrored: dense on the left
            out2 = fn(d, x)
            f2 = function([x, d], out2, mode="PY")
            assert np.array_equal(f2(xv, dv), npop(dv, xv.toarray()).astype("uint8"))


def test_sparse_operator_sugar(mats):
    xv, yv = mats
    x = spb.csr_matrix("x", dtype="float64")
    y = spb.csr_matrix("y", dtype="float64")
    out = (-x) * y + x - y
    f = function([x, y], spb.dense_from_sparse(out), mode="PY")
    want = (-xv.toarray()) * yv.toarray() + xv.toarray() - yv.toarray()
    assert np.allclose(f(xv, yv), want)
    # .T is a sparse transpose, not a dimshuffle
    t = x.T
    assert isinstance(t.type, type(x.type))
    ft = function([x], spb.dense_from_sparse(t), mode="PY")
    assert np.allclose(ft(xv), xv.toarray().T)


def test_get_item_2lists_grad(mats):
    xv, _ = mats
    rows = np.array([0, 2, 4])
    cols = np.array([1, 3, 6])
    x = spb.csr_matrix("x", dtype="float64")
    cost = spb.get_item_2lists(x, rows, cols).sum()
    gx = grad(cost, x)
    f = function([x], spb.dense_from_sparse(gx), mode="PY")
    got = f(xv)
    want = np.zeros((5, 7))
    want[rows, cols] = 1.0
    assert np.allclose(got, want)


def test_sparse_function_output_stays_sparse(mats):
    # regression: Function._to_host used to np.asarray sparse outputs
    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    f = function([x], spb.transpose(x), mode="PY")
    out = f(xv)
    assert sp.issparse(out)
    assert out.shape == (7, 5)
    assert np.allclose(out.toarray(), xv.toarray().T)


def test_sparse_sandbox_sp2(mats):
    from aesara_tpu.sparse.sandbox import sp2

    xv, _ = mats
    x = spb.csr_matrix("x", dtype="float64")
    f = function([x], sp2.poisson(x), mode="PY")
    out = f((xv * 5).tocsr())
    assert sp.issparse(out) and out.shape == xv.shape
    # zero pattern preserved (or shrunk)
    assert np.all(out.toarray()[xv.toarray() == 0] == 0)

    fb = function([], sp2.Binomial("csr", "int64")(20, 0.5, np.array([3, 4])),
                  mode="PY")
    assert fb().shape == (3, 4)

    pv = sp.csr_matrix(np.array([[0.5, 0.5, 0.0], [0.0, 0.2, 0.8]],
                               dtype="float32"))
    p = spb.csr_matrix("p")
    fm = function([p], sp2.multinomial(9, p), mode="PY")
    assert np.all(np.asarray(fm(pv).sum(axis=1)).ravel() == 9)
