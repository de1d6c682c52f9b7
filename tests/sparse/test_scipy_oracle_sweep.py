"""Sparse op sweep against scipy as the direct oracle, over both
formats × several densities (incl. empty and full), with gradient
checks through the structured paths — the reference's
``tests/sparse/test_basic.py`` breadth pattern."""

import numpy as np
import pytest
import scipy.sparse as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.gradient import grad
from aesara_tpu.sparse import basic as sb

rng = np.random.default_rng(53)

FORMATS = ["csr", "csc"]
DENSITIES = [0.0, 0.15, 1.0]


def _rand_sparse(shape, fmt, density):
    m = sp.random(*shape, density=density, format=fmt, random_state=7,
                  data_rvs=lambda n: rng.standard_normal(n))
    return m.astype("float64")


def _sym(fmt, name):
    return sb.matrix(fmt, name=name, dtype="float64")


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("density", DENSITIES)
class TestElementwiseSweep:
    def test_add_sub_mul_ss(self, fmt, density):
        a = _sym(fmt, "a")
        b = _sym(fmt, "b")
        f = atp.function(
            [a, b],
            [sb.dense_from_sparse(a + b), sb.dense_from_sparse(a - b),
             sb.dense_from_sparse(a * b)],
            mode="PY",
        )
        av = _rand_sparse((4, 5), fmt, density)
        bv = _rand_sparse((4, 5), fmt, density)
        radd, rsub, rmul = [np.asarray(v) for v in f(av, bv)]
        np.testing.assert_allclose(radd, (av + bv).toarray())
        np.testing.assert_allclose(rsub, (av - bv).toarray())
        np.testing.assert_allclose(rmul, (av.multiply(bv)).toarray())

    def test_neg_transpose_cast(self, fmt, density):
        a = _sym(fmt, "a")
        f = atp.function(
            [a],
            [sb.dense_from_sparse(-a), sb.dense_from_sparse(a.T),
             sb.dense_from_sparse(sb.sp_cast(a, "float32"))],
            mode="PY",
        )
        av = _rand_sparse((3, 6), fmt, density)
        rneg, rT, rcast = [np.asarray(v) for v in f(av)]
        np.testing.assert_allclose(rneg, -av.toarray())
        np.testing.assert_allclose(rT, av.toarray().T)
        np.testing.assert_allclose(rcast, av.toarray().astype("float32"),
                                   rtol=1e-6)

    def test_structured_elemwise(self, fmt, density):
        from aesara_tpu.sparse.basic import structured_exp, structured_log

        a = _sym(fmt, "a")
        f = atp.function([a], sb.dense_from_sparse(structured_exp(a)),
                         mode="PY")
        av = _rand_sparse((4, 4), fmt, density)
        got = np.asarray(f(av))
        expect = av.copy()
        expect.data = np.exp(expect.data)
        np.testing.assert_allclose(got, expect.toarray())

    def test_sp_sum_axes(self, fmt, density):
        a = _sym(fmt, "a")
        outs = [sb.sp_sum(a, axis=ax, sparse_grad=False)
                for ax in (None, 0, 1)]
        f = atp.function([a], outs, mode="PY")
        av = _rand_sparse((5, 3), fmt, density)
        full, ax0, ax1 = [np.asarray(v) for v in f(av)]
        np.testing.assert_allclose(full, av.toarray().sum())
        np.testing.assert_allclose(ax0, av.toarray().sum(0))
        np.testing.assert_allclose(ax1, av.toarray().sum(1))


@pytest.mark.parametrize("fmt", FORMATS)
class TestDotSweep:
    def test_structured_dot_and_grad(self, fmt):
        a = _sym(fmt, "a")
        d = at.matrix("d", dtype="float64")
        out = sb.structured_dot(a, d)
        cost = (out ** 2).sum()
        gd = grad(cost, d)
        f = atp.function([a, d], [out, gd], mode="PY")
        av = _rand_sparse((4, 6), fmt, 0.3)
        dv = rng.standard_normal((6, 2))
        o, g = [np.asarray(v) for v in f(av, dv)]
        np.testing.assert_allclose(o, av.toarray() @ dv)
        np.testing.assert_allclose(g, 2 * av.toarray().T @ (av.toarray() @ dv))

    def test_true_dot_sparse_result(self, fmt):
        a = _sym(fmt, "a")
        b = _sym(fmt, "b")
        f = atp.function([a, b], sb.dense_from_sparse(sb.true_dot(a, b)),
                         mode="PY")
        av = _rand_sparse((3, 4), fmt, 0.4)
        bv = _rand_sparse((4, 5), fmt, 0.4)
        np.testing.assert_allclose(np.asarray(f(av, bv)),
                                   (av @ bv).toarray())

    def test_sampling_dot(self, fmt):
        if fmt != "csr":
            pytest.skip("sampling_dot defined on csr pattern")
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        p = _sym("csr", "p")
        f = atp.function([x, y, p],
                         sb.dense_from_sparse(sb.sampling_dot(x, y, p)),
                         mode="PY")
        xv = rng.standard_normal((3, 4))
        yv = rng.standard_normal((5, 4))
        pv = _rand_sparse((3, 5), "csr", 0.4)
        expect = pv.multiply(xv @ yv.T).toarray()
        np.testing.assert_allclose(np.asarray(f(xv, yv, pv)), expect)


@pytest.mark.parametrize("fmt", FORMATS)
class TestStructureOps:
    def test_csm_roundtrip(self, fmt):
        a = _sym(fmt, "a")
        data, indices, indptr, shape = sb.csm_properties(a)
        rebuilt = sb.CSM(fmt)(data, indices, indptr, shape)
        f = atp.function([a], sb.dense_from_sparse(rebuilt), mode="PY")
        av = _rand_sparse((4, 5), fmt, 0.3)
        np.testing.assert_allclose(np.asarray(f(av)), av.toarray())

    def test_getitem(self, fmt):
        a = _sym(fmt, "a")
        f = atp.function([a], [sb.dense_from_sparse(a[1:3]),
                               a[2, 1]], mode="PY")
        av = _rand_sparse((5, 4), fmt, 0.5)
        rows, scalar = f(av)
        np.testing.assert_allclose(np.asarray(rows), av.toarray()[1:3])
        np.testing.assert_allclose(np.asarray(scalar), av.toarray()[2, 1])

    def test_hstack_vstack(self, fmt):
        a = _sym(fmt, "a")
        b = _sym(fmt, "b")
        f = atp.function(
            [a, b],
            [sb.dense_from_sparse(sb.hstack([a, b], format=fmt)),
             sb.dense_from_sparse(sb.vstack([a, b], format=fmt))],
            mode="PY",
        )
        av = _rand_sparse((3, 4), fmt, 0.4)
        bv = _rand_sparse((3, 4), fmt, 0.4)
        h, v = [np.asarray(x) for x in f(av, bv)]
        np.testing.assert_allclose(h, np.hstack([av.toarray(), bv.toarray()]))
        np.testing.assert_allclose(v, np.vstack([av.toarray(), bv.toarray()]))
