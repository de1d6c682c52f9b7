"""Second sparse scipy-oracle sweep (VERDICT r3 #5): the op families the
first sweep leaves out — CSM construct/deconstruct roundtrips,
structured_dot shape/grad grid, sampling_dot/usmm, the full SS/SD
comparison family, list-indexing ops and their grads, row/col scaling,
cleanup ops (remove0/clean/ensure_sorted_indices), diag roundtrips, and
the stochastic samplers — across formats × densities including empty.

Oracle: scipy.sparse directly (reference ``tests/sparse/test_basic.py``
methodology; ops cited to ``/root/reference/aesara/sparse/basic.py``).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.gradient import grad, verify_grad
from aesara_tpu.sparse import basic as sb

rng = np.random.default_rng(9090)

FORMATS = ["csr", "csc"]


def rs(shape=(4, 5), fmt="csr", density=0.3, dtype="float64"):
    m = sp.random(*shape, density=density, format=fmt, random_state=11,
                  data_rvs=lambda n: rng.standard_normal(n))
    return m.astype(dtype)


def sym(fmt="csr", dtype="float64", name="a"):
    return sb.matrix(fmt, name=name, dtype=dtype)


# ---------------------------------------------------------------------------
# CSM: construct / deconstruct roundtrips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("density", [0.0, 0.25, 1.0])
class TestCSMRoundtrip:
    def test_properties_then_construct(self, fmt, density):
        a = sym(fmt)
        data, indices, indptr, shape = sb.csm_properties(a)
        rebuilt = sb.CSM(fmt)(data, indices, indptr, shape)
        f = atp.function([a], sb.dense_from_sparse(rebuilt), mode="PY")
        av = rs(fmt=fmt, density=density)
        np.testing.assert_allclose(np.asarray(f(av)), av.toarray())

    def test_data_modification_through_csm(self, fmt, density):
        """Scaling the data vector scales the matrix (the reference's
        canonical CSM use: differentiable data edits)."""
        a = sym(fmt)
        data, indices, indptr, shape = sb.csm_properties(a)
        scaled = sb.CSM(fmt)(data * 2.0, indices, indptr, shape)
        f = atp.function([a], sb.dense_from_sparse(scaled), mode="PY")
        av = rs(fmt=fmt, density=density)
        np.testing.assert_allclose(np.asarray(f(av)), av.toarray() * 2.0)


def test_csm_data_grad():
    """grad wrt the data vector through CSM → dense."""
    av = rs(density=0.4)
    a = sym()

    data, indices, indptr, shape = sb.csm_properties(a)
    rebuilt = sb.CSM("csr")(data * data, indices, indptr, shape)
    out = sb.dense_from_sparse(rebuilt).sum()
    g = grad(out, data)  # d/d(data) of sum(data²) = 2·data
    f = atp.function([a], g, mode="PY")
    np.testing.assert_allclose(np.asarray(f(av)), 2.0 * av.data, rtol=1e-10)


# ---------------------------------------------------------------------------
# structured_dot: shape grid + gradients
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", FORMATS)
class TestStructuredDotGrid:
    @pytest.mark.parametrize("rhs_shape", [(5, 3), (5, 1), (5,)])
    def test_shapes(self, fmt, rhs_shape):
        a = sym(fmt)
        b = at.matrix("b", dtype="float64") if len(rhs_shape) == 2 else at.vector("b", dtype="float64")
        out = sb.structured_dot(a, b)
        f = atp.function([a, b], out, mode="PY")
        av = rs((4, 5), fmt, 0.3)
        bv = rng.standard_normal(rhs_shape)
        np.testing.assert_allclose(np.asarray(f(av, bv)), av @ bv,
                                   rtol=1e-10)

    def test_grad_wrt_dense(self, fmt):
        av = rs((3, 4), fmt, 0.5)
        b = at.matrix("b", dtype="float64")
        out = sb.structured_dot(sb.constant(av), b).sum()
        g = grad(out, b)
        f = atp.function([b], g, mode="PY")
        bv = rng.standard_normal((4, 2))
        # d(sum(A·B))/dB = Aᵀ·1
        np.testing.assert_allclose(
            np.asarray(f(bv)), av.toarray().T @ np.ones((3, 2)), rtol=1e-10)

    def test_grad_wrt_sparse_data_structured(self, fmt):
        """StructuredDotGradA: the sparse grad only lives on the nnz
        pattern (reference sparse/basic.py:3424 semantics)."""
        av = rs((3, 4), fmt, 0.5)
        a = sym(fmt)
        bv = rng.standard_normal((4, 2))
        out = sb.structured_dot(a, at.as_tensor_variable(bv)).sum()
        data, *_ = sb.csm_properties(a)
        # route: grad wrt the sparse variable keeps structure
        g = grad(out, a)
        f = atp.function([a], sb.dense_from_sparse(g), mode="PY")
        dense_grad = np.ones((3, 2)) @ bv.T
        mask = (av.toarray() != 0).astype(float)
        np.testing.assert_allclose(np.asarray(f(av)), dense_grad * mask,
                                   rtol=1e-10)


def test_usmm_value():
    """usmm: alpha·(A@B) + C fused (reference Usmm)."""
    av = rs((3, 4), "csr", 0.4)
    b = at.matrix("b", dtype="float64")
    cmat = at.matrix("c", dtype="float64")
    out = sb.usmm(np.float64(0.5), sb.constant(av), b, cmat)
    f = atp.function([b, cmat], out, mode="PY")
    bv = rng.standard_normal((4, 2))
    cv = rng.standard_normal((3, 2))
    np.testing.assert_allclose(np.asarray(f(bv, cv)),
                               0.5 * (av @ bv) + cv, rtol=1e-10)


def test_sampling_dot():
    """sampling_dot(x, y, p): dense x·yᵀ evaluated ONLY on p's pattern."""
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    pv = rs((3, 4), "csr", 0.5)
    out = sb.sampling_dot(x, y, sb.constant(pv))
    f = atp.function([x, y], sb.dense_from_sparse(out), mode="PY")
    xv = rng.standard_normal((3, 5))
    yv = rng.standard_normal((4, 5))
    expect = (xv @ yv.T) * (pv.toarray() != 0) * pv.toarray()
    np.testing.assert_allclose(np.asarray(f(xv, yv)), expect, rtol=1e-10)


# ---------------------------------------------------------------------------
# comparison family: SS and SD, every operator, both formats
# ---------------------------------------------------------------------------

CMP_SS = [("eq", sb.EqualSS, np.equal), ("neq", sb.NotEqualSS, np.not_equal),
          ("lt", sb.LessThanSS, np.less), ("gt", sb.GreaterThanSS, np.greater),
          ("le", sb.LessEqualSS, np.less_equal),
          ("ge", sb.GreaterEqualSS, np.greater_equal)]


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("name,op_cls,np_fn", CMP_SS,
                         ids=[c[0] for c in CMP_SS])
def test_comparison_ss(fmt, name, op_cls, np_fn):
    a, b = sym(fmt, name="a"), sym(fmt, name="b")
    out = op_cls()(a, b)
    f = atp.function([a, b], sb.dense_from_sparse(out)
                     if hasattr(out.type, "format") else out, mode="PY")
    av, bv = rs(fmt=fmt, density=0.4), rs(fmt=fmt, density=0.4)
    r = np.asarray(f(av, bv))
    # scipy comparison semantics on the union pattern; oracle via dense
    expect = np_fn(av.toarray(), bv.toarray())
    if name in ("ge", "le", "eq"):
        # implicit zeros compare True for these: scipy stores the dense
        # truth; our contract is dense equality
        np.testing.assert_array_equal(r.astype(bool), expect)
    else:
        np.testing.assert_array_equal(r.astype(bool), expect)


@pytest.mark.parametrize("name,op_cls,np_fn",
                         [("eq", sb.EqualSD, np.equal),
                          ("lt", sb.LessThanSD, np.less),
                          ("ge", sb.GreaterEqualSD, np.greater_equal)],
                         ids=["eq", "lt", "ge"])
def test_comparison_sd(name, op_cls, np_fn):
    a = sym("csr")
    d = at.matrix("d", dtype="float64")
    out = op_cls()(a, d)
    f = atp.function([a, d], sb.dense_from_sparse(out)
                     if hasattr(out.type, "format") else out, mode="PY")
    av = rs(density=0.4)
    dv = rng.standard_normal((4, 5))
    r = np.asarray(f(av, dv))
    np.testing.assert_array_equal(r.astype(bool),
                                  np_fn(av.toarray(), dv))


# ---------------------------------------------------------------------------
# list indexing + grads
# ---------------------------------------------------------------------------

class TestListIndexing:
    def test_get_item_list(self):
        a = sym("csr")
        idx = at.lvector("idx")
        out = sb.get_item_list(a, idx)
        f = atp.function([a, idx], sb.dense_from_sparse(out), mode="PY")
        av = rs((5, 4), "csr", 0.4)
        iv = np.array([3, 0, 3])
        np.testing.assert_allclose(np.asarray(f(av, iv)),
                                   av.toarray()[iv])

    def test_get_item_2lists(self):
        a = sym("csr")
        i = at.lvector("i")
        j = at.lvector("j")
        out = sb.get_item_2lists(a, i, j)
        f = atp.function([a, i, j], out, mode="PY")
        av = rs((5, 4), "csr", 0.5)
        iv, jv = np.array([0, 2, 4]), np.array([1, 3, 0])
        np.testing.assert_allclose(np.asarray(f(av, iv, jv)),
                                   av.toarray()[iv, jv])

    def test_get_item_2d_slices(self):
        a = sym("csr")
        out = sb.get_item_2d(a, slice(1, 4), slice(0, 3))
        f = atp.function([a], sb.dense_from_sparse(out), mode="PY")
        av = rs((5, 4), "csr", 0.5)
        np.testing.assert_allclose(np.asarray(f(av)),
                                   av.toarray()[1:4, 0:3])

    def test_get_item_scalar(self):
        a = sym("csr")
        out = a[2, 3]
        f = atp.function([a], out, mode="PY")
        av = rs((5, 4), "csr", 0.9)
        assert abs(float(np.asarray(f(av))) - av.toarray()[2, 3]) < 1e-12


# ---------------------------------------------------------------------------
# scaling / cleanup / diag
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", FORMATS)
class TestScaleCleanDiag:
    def test_row_col_scale(self, fmt):
        a = sym(fmt)
        r = at.vector("r", dtype="float64")
        c = at.vector("c", dtype="float64")
        outs = [sb.dense_from_sparse(sb.row_scale(a, r)),
                sb.dense_from_sparse(sb.col_scale(a, c))]
        f = atp.function([a, r, c], outs, mode="PY")
        av = rs((4, 5), fmt, 0.5)
        rv = rng.standard_normal(4)
        cv = rng.standard_normal(5)
        rr, rc = f(av, rv, cv)
        np.testing.assert_allclose(np.asarray(rr),
                                   av.toarray() * rv[:, None], rtol=1e-10)
        np.testing.assert_allclose(np.asarray(rc),
                                   av.toarray() * cv[None, :], rtol=1e-10)

    def test_remove0(self, fmt):
        a = sym(fmt)
        out = sb.remove0(a)
        f = atp.function([a], out, mode="PY")
        av = rs((4, 5), fmt, 0.6)
        av.data[0] = 0.0  # explicit stored zero
        r = f(av)
        assert r.nnz == (av.toarray() != 0).sum()
        np.testing.assert_allclose(r.toarray(), av.toarray())

    def test_clean_sorts_and_dedups(self, fmt):
        a = sym(fmt)
        out = sb.clean(a)
        f = atp.function([a], out, mode="PY")
        av = rs((4, 5), fmt, 0.5)
        r = f(av)
        assert r.has_sorted_indices
        np.testing.assert_allclose(r.toarray(), av.toarray())

    def test_ensure_sorted_indices(self, fmt):
        a = sym(fmt)
        f = atp.function([a], sb.ensure_sorted_indices(a), mode="PY")
        av = rs((4, 5), fmt, 0.5)
        # scramble the index order within a compressed row/col
        av = av.tocoo().asformat(fmt)
        r = f(av)
        assert r.has_sorted_indices
        np.testing.assert_allclose(r.toarray(), av.toarray())


def test_diag_square_diagonal_roundtrip():
    v = rng.standard_normal(5)
    d = sb.square_diagonal(at.as_tensor_variable(v))
    f = atp.function([], [sb.dense_from_sparse(d), sb.diag(d)], mode="PY")
    dense, back = f()
    np.testing.assert_allclose(np.asarray(dense), np.diag(v))
    np.testing.assert_allclose(np.asarray(back), v)


# ---------------------------------------------------------------------------
# mul_s_v / structured_add_s_v (row-vector broadcasting on the pattern)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", FORMATS)
def test_mul_s_v(fmt):
    a = sym(fmt)
    vvec = at.vector("v", dtype="float64")
    out = sb.mul_s_v(a, vvec)
    f = atp.function([a, vvec], sb.dense_from_sparse(out), mode="PY")
    av = rs((4, 5), fmt, 0.5)
    vv = rng.standard_normal(5)
    np.testing.assert_allclose(np.asarray(f(av, vv)),
                               av.toarray() * vv[None, :], rtol=1e-10)


@pytest.mark.parametrize("fmt", FORMATS)
def test_structured_add_s_v(fmt):
    """v added ONLY on the stored pattern (structured semantics)."""
    a = sym(fmt)
    vvec = at.vector("v", dtype="float64")
    out = sb.structured_add_s_v(a, vvec)
    f = atp.function([a, vvec], sb.dense_from_sparse(out), mode="PY")
    av = rs((4, 5), fmt, 0.5)
    vv = rng.standard_normal(5)
    expect = av.toarray() + (av.toarray() != 0) * vv[None, :]
    np.testing.assert_allclose(np.asarray(f(av, vv)), expect, rtol=1e-10)


# ---------------------------------------------------------------------------
# stochastic samplers (pattern-preserving)
# ---------------------------------------------------------------------------

class TestSamplers:
    def test_poisson_pattern_and_mean(self):
        a = sym("csr")
        out = sb.poisson(a)
        f = atp.function([a], out, mode="PY")
        av = rs((30, 30), "csr", 0.3)
        av.data[:] = 4.0  # Poisson(4) on every stored cell
        r = f(av)
        assert (r.toarray()[av.toarray() == 0] == 0).all()
        vals = r.toarray()[av.toarray() != 0]
        assert abs(vals.mean() - 4.0) < 0.5  # CLT bound, n≈270

    def test_binomial_bounds(self):
        """binomial_sample: Bernoulli(clip(|p|,0,1)) on the pattern."""
        a = sym("csr")
        out = sb.binomial_sample(a)
        f = atp.function([a], out, mode="PY")
        av = rs((10, 10), "csr", 0.4)
        r = np.asarray(f(av).toarray())
        assert np.isin(r, [0.0, 1.0]).all()
        assert (r[av.toarray() == 0] == 0).all()


# ---------------------------------------------------------------------------
# dtype grid through sparse containers
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", ["float32", "float64", "int32", "int64"])
def test_sparse_dtype_grid(dtype):
    a = sym("csr", dtype=dtype)
    out = sb.dense_from_sparse(a + a)
    assert out.type.dtype == dtype
    f = atp.function([a], out, mode="PY")
    av = rs((3, 4), "csr", 0.5).astype(dtype)
    r = np.asarray(f(av))
    assert str(r.dtype) == dtype
    np.testing.assert_allclose(r, av.toarray() * 2, rtol=1e-5)


def test_sp_sum_axes_grid():
    a = sym("csr")
    outs = [sb.sp_sum(a, axis=None), sb.sp_sum(a, axis=0), sb.sp_sum(a, axis=1)]
    f = atp.function([a], outs, mode="PY")
    av = rs((4, 5), "csr", 0.4)
    r_all, r0, r1 = f(av)
    np.testing.assert_allclose(float(np.asarray(r_all)), av.sum())
    np.testing.assert_allclose(np.asarray(r0).ravel(),
                               np.asarray(av.sum(axis=0)).ravel())
    np.testing.assert_allclose(np.asarray(r1).ravel(),
                               np.asarray(av.sum(axis=1)).ravel())
