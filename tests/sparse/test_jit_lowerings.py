"""Sparse ops on the WHOLE-GRAPH XLA path: when the sparse value is
built on-device (SparseFromDense/CSM over dense inputs), the entire
pipeline must jit — no py fallback (reference boundary only applies to
scipy containers crossing the function boundary).

Each test turns the fallback warning into an error, so a silent
degrade to the py path fails loudly."""

import warnings

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.sparse import basic as sb

rng = np.random.default_rng(2024)


@pytest.fixture(autouse=True)
def _no_py_fallback():
    with warnings.catch_warnings():
        warnings.filterwarnings(
            "error", message=".*py path instead of XLA.*"
        )
        yield


def _data():
    dv = (rng.random((5, 6)) > 0.6) * rng.normal(size=(5, 6))
    mv = rng.normal(size=(5, 6))
    return dv, mv


def test_mul_sd_jits():
    d, m = at.matrix("d", dtype="float64"), at.matrix("m", dtype="float64")
    out = sb.dense_from_sparse(sb.MulSD()(sb.SparseFromDense("csr")(d), m))
    f = function([d, m], out, mode="FAST_RUN")
    dv, mv = _data()
    np.testing.assert_allclose(np.asarray(f(dv, mv)), dv * mv, rtol=1e-7)


def test_mul_sv_jits():
    d = at.matrix("d", dtype="float64")
    v = at.vector("v", dtype="float64")
    out = sb.dense_from_sparse(sb.MulSV()(sb.SparseFromDense("csr")(d), v))
    f = function([d, v], out, mode="FAST_RUN")
    dv, _ = _data()
    vv = rng.normal(size=6)
    np.testing.assert_allclose(np.asarray(f(dv, vv)), dv * vv, rtol=1e-7)


def test_mul_ss_jits():
    d, m = at.matrix("d", dtype="float64"), at.matrix("m", dtype="float64")
    out = sb.dense_from_sparse(
        sb.MulSS()(sb.SparseFromDense("csr")(d), sb.SparseFromDense("csr")(m))
    )
    f = function([d, m], out, mode="FAST_RUN")
    dv, mv = _data()
    np.testing.assert_allclose(np.asarray(f(dv, mv)), dv * mv, rtol=1e-7)


def test_add_sd_jits():
    d, m = at.matrix("d", dtype="float64"), at.matrix("m", dtype="float64")
    out = sb.AddSD()(sb.SparseFromDense("csr")(d), m)
    f = function([d, m], out, mode="FAST_RUN")
    dv, mv = _data()
    np.testing.assert_allclose(np.asarray(f(dv, mv)), dv + mv, rtol=1e-7)


def test_add_ss_jits():
    d, m = at.matrix("d", dtype="float64"), at.matrix("m", dtype="float64")
    out = sb.dense_from_sparse(
        sb.AddSS()(sb.SparseFromDense("csr")(d), sb.SparseFromDense("csr")(m))
    )
    f = function([d, m], out, mode="FAST_RUN")
    dv, mv = _data()
    np.testing.assert_allclose(np.asarray(f(dv, mv)), dv + mv, rtol=1e-7)


def test_sampling_dot_jits():
    d = at.matrix("d", dtype="float64")
    x, y = at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
    out = sb.dense_from_sparse(
        sb.SamplingDot()(x, y, sb.SparseFromDense("csr")(d))
    )
    f = function([x, y, d], out, mode="FAST_RUN")
    dv, _ = _data()
    xv, yv = rng.normal(size=(5, 3)), rng.normal(size=(6, 3))
    np.testing.assert_allclose(
        np.asarray(f(xv, yv, dv)), (xv @ yv.T) * dv, rtol=1e-7
    )


def test_structured_dot_chain_jits():
    """masked-weight training pattern: sparse mask applied on-device,
    structured product, gradient — one XLA program."""
    from aesara_tpu.gradient import grad

    w = at.matrix("w", dtype="float64")
    x = at.matrix("x", dtype="float64")
    mask = sb.SparseFromDense("csr")(w)
    out = sb.structured_dot(mask, x).sum()
    gw = grad(out, w)
    f = function([w, x], [out, gw], mode="FAST_RUN")
    dv, _ = _data()
    xv = rng.normal(size=(6, 4))
    tot, g = f(dv, xv)
    np.testing.assert_allclose(
        float(np.asarray(tot)), (dv @ xv).sum(), rtol=1e-7
    )
    assert np.asarray(g).shape == dv.shape


def test_sparse_function_input_jits_through_bridge():
    """scipy containers at the function boundary now bridge onto the
    device (densify plan here: the whole cone is densify-safe) and run
    as ONE jitted XLA program — no py fallback, no warning."""
    import warnings

    import scipy.sparse as sp
    from aesara_tpu.sparse.basic import SparseTensorType

    s = SparseTensorType("csr", "float64")("s")
    out = sb.dense_from_sparse(s) * 2.0
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning = failure
        f = function([s], out, mode="FAST_RUN")
    assert f.fn.jit_fn is not None
    assert f.fn.sparse_plan == ("dense",)
    sv = sp.random(4, 5, density=0.4, format="csr", random_state=1)
    np.testing.assert_allclose(np.asarray(f(sv)), sv.toarray() * 2)


# ---------------------------------------------------------------------------
# round-5b lowerings: Diag / SquareDiagonal / CSMProperties on XLA
# ---------------------------------------------------------------------------

def test_diag_lowers_no_fallback():
    import warnings

    import scipy.sparse as sp
    from aesara_tpu.sparse.basic import SparseTensorType

    s = SparseTensorType("csr", "float64")("s")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        f = function([s], sb.diag(s), mode="FAST_RUN")
    sv = sp.random(4, 6, density=0.5, format="csr", random_state=3)
    np.testing.assert_allclose(np.asarray(f(sv)),
                               sv.toarray().diagonal())


def test_square_diagonal_lowers_roundtrip():
    import warnings

    import aesara_tpu.tensor as at

    d = at.vector("d", dtype="float64")
    # keep the output DENSE so the whole graph jits (sparse outputs
    # convert at the thunk boundary)
    out = sb.dense_from_sparse(sb.square_diagonal(d))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        f = function([d], out, mode="FAST_RUN")
    dv = np.array([1.5, -2.0, 0.5])
    np.testing.assert_allclose(np.asarray(f(dv)), np.diag(dv))


def test_csm_properties_roundtrip_both_formats():
    import warnings

    import scipy.sparse as sp
    from aesara_tpu.sparse.basic import CSM, SparseTensorType, csm_properties

    for fmt in ("csr", "csc"):
        s = SparseTensorType(fmt, "float64")("s")
        d_, i_, p_, s_ = csm_properties(s)
        out = sb.dense_from_sparse(CSM(fmt)(d_, i_, p_, s_))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            f = function([s], out, mode="FAST_RUN")
        sv = sp.random(5, 3, density=0.5, format=fmt, random_state=7)
        np.testing.assert_allclose(np.asarray(f(sv)), sv.toarray())


def test_diag_grad_rectangular_on_xla():
    """The full Diag-gradient chain (CSMProperties shape → arange/
    minimum indptr → CSM scatter) compiles as one XLA program."""
    import warnings

    import scipy.sparse as sp
    import aesara_tpu.tensor as at
    from aesara_tpu.gradient import grad as _grad
    from aesara_tpu.sparse.basic import SparseTensorType

    s = SparseTensorType("csr", "float64")("s")
    (g,) = _grad(at.sum(sb.diag(s) ** 2), [s])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        f = function([s], g, mode="FAST_RUN")
    sv = sp.random(4, 6, density=0.6, format="csr", random_state=2)
    gv = f(sv)
    assert gv.shape == (4, 6)
    want = np.zeros((4, 6))
    dg = sv.toarray().diagonal()
    want[np.arange(4), np.arange(4)] = 2 * dg
    np.testing.assert_allclose(gv.toarray(), want)
