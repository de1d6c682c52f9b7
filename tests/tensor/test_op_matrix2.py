"""Second golden-vs-NumPy sweep: special functions with parameters,
structural ops the first matrix skipped, dtype-promotion behavior, and
bad build/runtime cases (reference ``tests/tensor/test_basic.py`` +
``test_math.py`` makeTester breadth)."""

import numpy as np
import pytest
import scipy.special as scipy_special

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker
from tests.unittest_tools import makeTester

rng = np.random.default_rng(777)


def d(*shape):
    return rng.normal(size=shape)


def pos(*shape):
    return np.abs(rng.normal(size=shape)) + 0.3


def unit(*shape):
    return rng.uniform(-0.85, 0.85, size=shape)


def frac(*shape):
    return rng.uniform(0.05, 0.95, size=shape)


def ints(*shape, lo=1, hi=9):
    return rng.integers(lo, hi, size=shape)


# ---------------------------------------------------------------------------
# parameterized special functions (2-4 args)
# ---------------------------------------------------------------------------

TestErfinvMatrix = makeTester(
    "TestErfinvMatrix", tm.erfinv, scipy_special.erfinv,
    good={"unit": (unit(4, 3),)},
    grad={"unit": (unit(3, 3) * 0.7,)},
)

TestErfcinvMatrix = makeTester(
    "TestErfcinvMatrix", tm.erfcinv, scipy_special.erfcinv,
    good={"frac": (frac(4, 3) + 0.5,)},
)

TestErfcxMatrix = makeTester(
    "TestErfcxMatrix", tm.erfcx, scipy_special.erfcx,
    good={"pos": (pos(4, 3),)},
)

TestGammaincMatrix = makeTester(
    "TestGammaincMatrix", tm.gammainc, scipy_special.gammainc,
    good={"kx": (pos(4, 3) + 0.5, pos(4, 3)),
          "broadcast": (pos(1, 3) + 0.5, pos(4, 3))},
)

TestGammainccMatrix = makeTester(
    "TestGammainccMatrix", tm.gammaincc, scipy_special.gammaincc,
    good={"kx": (pos(4, 3) + 0.5, pos(4, 3))},
)

TestGammaUMatrix = makeTester(
    "TestGammaUMatrix", tm.gammau,
    lambda k, x: scipy_special.gammaincc(k, x) * scipy_special.gamma(k),
    good={"kx": (pos(3, 3) + 0.5, pos(3, 3))},
)

TestGammaLMatrix = makeTester(
    "TestGammaLMatrix", tm.gammal,
    lambda k, x: scipy_special.gammainc(k, x) * scipy_special.gamma(k),
    good={"kx": (pos(3, 3) + 0.5, pos(3, 3))},
)

TestBetaincMatrix = makeTester(
    "TestBetaincMatrix", tm.betainc, scipy_special.betainc,
    good={"abx": (pos(3, 3) + 0.5, pos(3, 3) + 0.5, frac(3, 3))},
    grad={"abx": (pos(2, 2) + 1.0, pos(2, 2) + 1.0, frac(2, 2))},
)

TestHyp2f1Matrix = makeTester(
    "TestHyp2f1Matrix", tm.hyp2f1, scipy_special.hyp2f1,
    good={"abcz": (pos(3) + 0.2, pos(3) + 0.2, pos(3) + 1.5, unit(3) * 0.5)},
)

TestJvMatrix = makeTester(
    "TestJvMatrix", tm.jv, scipy_special.jv,
    good={"vx": (np.full((3, 3), 1.5), pos(3, 3) + 0.5)},
)

TestIvMatrix = makeTester(
    "TestIvMatrix", tm.iv, scipy_special.iv,
    good={"vx": (np.full((3, 3), 0.5), pos(3, 3))},
)

TestJ1Matrix = makeTester(
    "TestJ1Matrix", tm.j1, scipy_special.j1,
    good={"x": (d(4, 3),)},
    grad={"x": (d(3, 3),)},
)

TestI1Matrix = makeTester(
    "TestI1Matrix", tm.i1, scipy_special.i1,
    good={"x": (d(4, 3) * 0.8,)},
)

TestTriGammaMatrix = makeTester(
    "TestTriGammaMatrix", tm.tri_gamma,
    lambda x: scipy_special.polygamma(1, x),
    good={"pos": (pos(4, 3) + 0.5,)},
)

TestOwensTMatrix = makeTester(
    "TestOwensTMatrix", tm.owens_t, scipy_special.owens_t,
    good={"ha": (d(3, 3), d(3, 3))},
)

TestLogAddExpMatrix = makeTester(
    "TestLogAddExpMatrix", tm.logaddexp, np.logaddexp,
    good={"mats": (d(3, 4), d(3, 4)), "big": (50 + d(3, 3), 50 + d(3, 3))},
    grad={"mats": (d(3, 3), d(3, 3))},
)

TestLog1mexpMatrix = makeTester(
    "TestLog1mexpMatrix", tm.log1mexp,
    lambda x: np.log1p(-np.exp(x)),
    good={"neg": (-pos(4, 3) - 0.05,)},
    grad={"neg": (-pos(3, 3) - 0.1,)},
)

TestLogSumExpAxMatrix = makeTester(
    "TestLogSumExpAxMatrix",
    lambda x: tm.logsumexp(x, axis=1),
    lambda x: scipy_special.logsumexp(x, axis=1),
    good={"mat": (d(4, 6),), "big": (200 * d(3, 4),)},
    grad={"mat": (d(3, 4),)},
)

TestChi2sfMatrix = makeTester(
    "TestChi2sfMatrix", tm.chi2sf,
    lambda x, k: scipy_special.chdtrc(k, x),
    good={"xk": (pos(3, 3) * 2, np.full((3, 3), 3.0))},
)

TestSigmoidBigMatrix = makeTester(
    "TestSigmoidBigMatrix", tm.sigmoid, scipy_special.expit,
    good={"saturating": (np.array([[-100.0, -30.0, 0.0, 30.0, 100.0]]),)},
)


# ---------------------------------------------------------------------------
# structural ops the first matrix skipped
# ---------------------------------------------------------------------------

TestChooseMatrix = makeTester(
    "TestChooseMatrix",
    lambda a, c: at.choose(a, c),
    lambda a, c: np.choose(a, c),
    good={"basic": (ints(5, lo=0, hi=3), d(3, 5))},
)

TestPermuteRowElementsMatrix = makeTester(
    "TestPermuteRowElementsMatrix",
    lambda x, p: at.basic.permute_row_elements(x, p),
    lambda x, p: x[..., p] if x.ndim == 1 else
    np.take_along_axis(x, np.broadcast_to(p, x.shape), axis=-1),
    good={"vec": (d(5), np.asarray(rng.permutation(5))),
          "mat_shared_perm": (d(3, 5), np.asarray(rng.permutation(5)))},
)

TestExtractDiagMatrix = makeTester(
    "TestExtractDiagMatrix",
    lambda x: at.basic.extract_diag(x),
    np.diagonal,
    good={"square": (d(4, 4),), "wide": (d(3, 6),)},
    grad={"square": (d(3, 3),)},
)

TestDiagonalOffsetMatrix = makeTester(
    "TestDiagonalOffsetMatrix",
    lambda x: at.diagonal(x, offset=1),
    lambda x: np.diagonal(x, offset=1),
    good={"square": (d(4, 4),)},
    grad={"square": (d(4, 4),)},
)

TestRollMatrix = makeTester(
    "TestRollMatrix",
    lambda x: at.roll(x, 2, axis=1),
    lambda x: np.roll(x, 2, axis=1),
    good={"mat": (d(3, 5),)},
    grad={"mat": (d(2, 4),)},
)

TestRollFlatMatrix = makeTester(
    "TestRollFlatMatrix",
    lambda x: at.roll(x, -1),
    lambda x: np.roll(x, -1),
    good={"mat": (d(3, 4),)},
)

TestPtpMatrix = makeTester(
    "TestPtpMatrix",
    lambda x: tm.ptp(x, axis=1),
    lambda x: np.ptp(x, axis=1),
    good={"mat": (d(4, 6),)},
)

TestCumsumFlatMatrix = makeTester(
    "TestCumsumFlatMatrix",
    lambda x: at.extra_ops.cumsum(x),
    lambda x: np.cumsum(x),
    good={"mat": (d(3, 4),)},
    grad={"mat": (d(3, 3),)},
)

TestIroundMatrix = makeTester(
    "TestIroundMatrix", tm.iround,
    lambda x: np.round(x).astype("int64"),
    good={"mat": (d(4, 3) * 3,)},
)

TestDivmodMatrix = makeTester(
    "TestDivmodMatrix", tm.divmod_,
    lambda a, b: list(np.divmod(a, b)),
    good={"ints": (ints(4, 3, lo=-9), ints(4, 3))},
)

TestCeilIntdivMatrix = makeTester(
    "TestCeilIntdivMatrix", tm.ceil_intdiv,
    lambda a, b: -(-a // b),
    good={"ints": (ints(4, 3, lo=1, hi=30), ints(4, 3, lo=1, hi=5))},
)

TestLargestMatrix = makeTester(
    "TestLargestMatrix",
    lambda a, b, c: tm.largest(a, b, c),
    lambda a, b, c: np.maximum(np.maximum(a, b), c),
    good={"three": (d(3, 3), d(3, 3), d(3, 3))},
)

TestSmallestMatrix = makeTester(
    "TestSmallestMatrix",
    lambda a, b, c: tm.smallest(a, b, c),
    lambda a, b, c: np.minimum(np.minimum(a, b), c),
    good={"three": (d(3, 3), d(3, 3), d(3, 3))},
)

TestIscloseMatrix = makeTester(
    "TestIscloseMatrix",
    lambda a, b: tm.isclose(a, b),
    lambda a, b: np.isclose(a, b),
    good={"near": (d(3, 4), d(3, 4) + 1e-9), "far": (d(3, 4), d(3, 4) + 1.0)},
)

TestCovMatrix = makeTester(
    "TestCovMatrix", tm.cov, np.cov,
    good={"mat": (d(4, 9),)},
)

TestIsnanValuesMatrix = makeTester(
    "TestIsnanValuesMatrix", tm.isnan, np.isnan,
    good={"with_nan": (np.array([[1.0, np.nan, np.inf, -np.inf, 0.0]]),)},
)

TestIsinfValuesMatrix = makeTester(
    "TestIsinfValuesMatrix", tm.isinf, np.isinf,
    good={"with_inf": (np.array([[1.0, np.nan, np.inf, -np.inf, 0.0]]),)},
)

TestXorMatrix = makeTester(
    "TestXorMatrix", tm.xor, np.bitwise_xor,
    good={"ints": (ints(4, 3), ints(4, 3)),
          "bools": (ints(5, lo=0, hi=2).astype(bool),
                    ints(5, lo=0, hi=2).astype(bool))},
)

TestInvertMatrix = makeTester(
    "TestInvertMatrix", tm.invert, np.invert,
    good={"ints": (ints(4, 3),), "bools": (ints(5, lo=0, hi=2).astype(bool),)},
)

TestShiftLeftMatrix = makeTester(
    "TestShiftLeftMatrix", tm.shift_left, np.left_shift,
    good={"ints": (ints(4, 3), ints(4, 3, lo=0, hi=4))},
)

TestShiftRightMatrix = makeTester(
    "TestShiftRightMatrix", tm.shift_right, np.right_shift,
    good={"ints": (ints(4, 3, lo=8, hi=64), ints(4, 3, lo=0, hi=3))},
)

TestRound2Matrix = makeTester(
    "TestRound2Matrix",
    lambda x: tm.round(x, mode="half_away_from_zero"),
    lambda x: np.sign(x) * np.floor(np.abs(x) + 0.5),
    good={"halves": (np.array([[0.5, 1.5, -0.5, -1.5, 2.49]]),)},
)

TestMaxAndArgmaxMatrix = makeTester(
    "TestMaxAndArgmaxMatrix",
    lambda x: list(tm.max_and_argmax(x, axis=1)),
    lambda x: [np.max(x, axis=1), np.argmax(x, axis=1)],
    good={"mat": (d(4, 6),)},
)

TestSumKeepdimsMatrix = makeTester(
    "TestSumKeepdimsMatrix",
    lambda x: at.sum(x, axis=1, keepdims=True),
    lambda x: np.sum(x, axis=1, keepdims=True),
    good={"mat": (d(3, 5),)},
    grad={"mat": (d(3, 4),)},
)

TestProdAxisMatrix = makeTester(
    "TestProdAxisMatrix",
    lambda x: at.prod(x, axis=0),
    lambda x: np.prod(x, axis=0),
    good={"mat": (d(3, 4),)},
    grad={"pos": (pos(3, 3),)},
)

TestVarDdofMatrix = makeTester(
    "TestVarDdofMatrix",
    lambda x: tm.var(x, axis=1, ddof=1),
    lambda x: np.var(x, axis=1, ddof=1),
    good={"mat": (d(4, 6),)},
)

TestNormLsMatrix = makeTester(
    "TestNormLsMatrix",
    lambda x: tm.norm(x, 1),
    lambda x: np.linalg.norm(x, 1),
    good={"vec": (d(6),)},
)

from aesara_tpu.tensor.sort import topk as _topk

TestTopKMatrix = makeTester(
    "TestTopKMatrix",
    lambda x: _topk(x, 3, axis=-1, sorted=True),
    lambda x: -np.sort(-x, axis=-1)[..., :3],
    good={"mat": (d(4, 8),)},
)


# ---------------------------------------------------------------------------
# dtype promotion sweep: build-time dtype must match both backends and
# the framework's own promotion table (checked for self-consistency)
# ---------------------------------------------------------------------------

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)

PROMO_DTYPES = ["bool", "int8", "int32", "int64", "float32", "float64"]


class TestDtypePromotion:
    @pytest.mark.parametrize("da", PROMO_DTYPES)
    @pytest.mark.parametrize("db", PROMO_DTYPES)
    def test_add_promotion(self, da, db):
        a = at.tensor("a", dtype=da, shape=(None,))
        b = at.tensor("b", dtype=db, shape=(None,))
        out = a + b
        av = np.ones(3, dtype=da)
        bv = np.ones(3, dtype=db)
        f_py = function([a, b], out, mode=PY)
        r_py = np.asarray(f_py(av, bv))
        # declared dtype == delivered dtype on the py oracle
        assert r_py.dtype.name == out.type.dtype
        f_jx = function([a, b], out, mode=JAX)
        r_jx = np.asarray(f_jx(av, bv))
        assert r_jx.dtype.name == out.type.dtype
        np.testing.assert_array_equal(r_py, r_jx)

    @pytest.mark.parametrize("da", ["int32", "float32", "float64"])
    def test_true_div_always_floats(self, da):
        a = at.tensor("a", dtype=da, shape=(None,))
        out = a / a
        assert out.type.dtype.startswith("float")

    @pytest.mark.parametrize("da", ["int8", "int64", "float32"])
    def test_comparison_is_bool(self, da):
        a = at.tensor("a", dtype=da, shape=(None,))
        assert (a < a).type.dtype == "bool"
        assert tm.eq(a, a).type.dtype == "bool"

    def test_exp_of_int_is_float(self):
        a = at.lvector("a")
        assert at.exp(a).type.dtype in ("float32", "float64")


# ---------------------------------------------------------------------------
# bad build / bad runtime matrices for core ops
# ---------------------------------------------------------------------------


class TestBadCases:
    def test_dot_static_mismatch_build(self):
        a = at.tensor("a", dtype="float64", shape=(3, 4))
        b = at.tensor("b", dtype="float64", shape=(5, 2))
        with pytest.raises(Exception):
            at.dot(a, b)

    def test_dot_runtime_mismatch(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        f = function([a, b], at.dot(a, b), mode=PY)
        with pytest.raises(Exception):
            f(d(3, 4), d(5, 2))

    def test_solve_nonsquare_runtime(self):
        import aesara_tpu.tensor.slinalg as sl

        a = at.matrix("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        f = function([a, b], sl.solve(a, b), mode=PY)
        with pytest.raises(Exception):
            f(d(3, 4), d(3))

    def test_wrong_ndim_input_raises(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], x * 2, mode=PY)
        with pytest.raises(TypeError):
            f(d(3))

    def test_wrong_dtype_strictness(self):
        x = at.matrix("x", dtype="int64")
        f = function([x], x * 2, mode=PY)
        with pytest.raises(TypeError):
            f(d(3, 3))  # float64 data into int64 input must not downcast

    def test_static_shape_violation_runtime(self):
        x = at.tensor("x", dtype="float64", shape=(3, 4))
        f = function([x], x.sum(), mode=PY)
        with pytest.raises(Exception):
            f(d(2, 4))

    def test_join_axis_out_of_range_build(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        with pytest.raises(Exception):
            at.join(5, a, b)

    def test_reshape_bad_ndim_build(self):
        x = at.matrix("x", dtype="float64")
        with pytest.raises(Exception):
            at.reshape(x, (2, 2, 2), ndim=1)

    def test_alloc_shrink_nonbroadcast_build(self):
        v = at.tensor("v", dtype="float64", shape=(3,))
        with pytest.raises(Exception):
            at.alloc(v, 7)  # 3 -> 7 is not a broadcast

    def test_split_sizes_mismatch_runtime(self):
        x = at.vector("x", dtype="float64")
        parts = at.split(x, [2, 2], 2, axis=0)
        f = function([x], list(parts), mode=PY)
        with pytest.raises(Exception):
            f(d(5))  # sizes sum to 4 != 5

    def test_specify_shape_violation_runtime(self):
        from aesara_tpu.tensor.shape import specify_shape

        x = at.vector("x", dtype="float64")
        f = function([x], specify_shape(x, (4,)), mode=PY)
        with pytest.raises(Exception):
            f(d(6))

    def test_arccosh_domain_nan(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], tm.arccosh(x), mode=PY)
        res = np.asarray(f(np.full((2, 2), 0.5)))
        assert np.isnan(res).all()


class TestBesselDeviceLowering:
    """Regression pins for the device jv/iv approximations (review
    findings: Miller depth, series truncation, x<=0 domain)."""

    def _eval(self, fn, v, x):
        import jax

        from aesara_tpu.link.jax.dispatch import _iv_general, _jv_general

        impl = {"jv": _jv_general, "iv": _iv_general}[fn]
        return np.asarray(jax.jit(impl)(np.float64(v), np.asarray(x, "float64")))

    @pytest.mark.parametrize("v,x", [(20.0, 400.0), (16.0, 350.0),
                                     (12.0, 400.0), (10.0, 290.0),
                                     (7.5, 100.0), (3.0, 50.0)])
    def test_large_order_large_x(self, v, x):
        got_j = self._eval("jv", v, [x])[0]
        got_i = self._eval("iv", v, [x])[0]
        np.testing.assert_allclose(got_j, scipy_special.jv(v, x),
                                   rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(got_i, scipy_special.iv(v, x), rtol=5e-3)

    @pytest.mark.parametrize("v,x,expect_nan", [
        (0.0, 0.0, False), (2.0, 0.0, False), (1.0, -5.0, False),
        (2.0, -5.0, False), (1.5, -5.0, True),
    ])
    def test_domain_edges(self, v, x, expect_nan):
        got_j = self._eval("jv", v, [x])[0]
        got_i = self._eval("iv", v, [x])[0]
        if expect_nan:
            assert np.isnan(got_j) and np.isnan(got_i)
        else:
            np.testing.assert_allclose(got_j, scipy_special.jv(v, x),
                                       rtol=1e-6, atol=1e-12)
            np.testing.assert_allclose(got_i, scipy_special.iv(v, x),
                                       rtol=1e-6, atol=1e-12)


class TestTensorCoreReviewRegressions:
    def test_slice_over_unknown_dim_has_no_static_len(self):
        x = at.vector("x", dtype="float64")
        assert x[0:5].type.shape == (None,)
        f = function([x], x[0:5], mode=PY)
        assert np.asarray(f(np.arange(3.0))).shape == (3,)

    def test_join_symbolic_axis_all_none(self):
        a = at.tensor("a", dtype="float64", shape=(3, 4))
        b = at.tensor("b", dtype="float64", shape=(3, 4))
        ax = at.lscalar("ax")
        out = at.join(ax, a, b)
        assert out.type.shape == (None, None)
        f = function([ax, a, b], out, mode=PY)
        assert np.asarray(f(0, d(3, 4), d(3, 4))).shape == (6, 4)

    def test_batched_tensordot_int_axes(self):
        a = at.tensor3("a", dtype="float64")
        b = at.tensor3("b", dtype="float64")
        out = tm.batched_tensordot(a, b, axes=1)
        f = function([a, b], out, mode=PY)
        av, bv = d(2, 3, 4), d(2, 4, 5)
        np.testing.assert_allclose(
            np.asarray(f(av, bv)), np.einsum("bij,bjk->bik", av, bv)
        )

    def test_ellipsis_with_matrix_bool_mask(self):
        x = at.tensor3("x", dtype="float64")
        m = np.zeros((3, 4), dtype=bool)
        m[1, 2] = m[0, 0] = True
        out = x[..., m]
        f = function([x], out, mode=PY)
        xv = d(2, 3, 4)
        np.testing.assert_allclose(np.asarray(f(xv)), xv[..., m])

    def test_argmin_unsigned(self):
        x = at.tensor("x", dtype="uint8", shape=(None,))
        f = function([x], tm.argmin(x), mode=PY)
        assert int(f(np.array([3, 0, 2], dtype="uint8"))) == 1
        assert int(f(np.array([0, 1, 2], dtype="uint8"))) == 0
        f2 = function([x], tm.argmin(x), mode=JAX)
        assert int(f2(np.array([0, 1, 2], dtype="uint8"))) == 0

    def test_prod_grad_with_zeros(self):
        import aesara_tpu as atp

        x = at.vector("x", dtype="float64")
        g = atp.grad(at.prod(x), x)
        f = function([x], g, mode=PY)
        np.testing.assert_allclose(
            np.asarray(f(np.array([2.0, 0.0, 3.0]))), [0.0, 6.0, 0.0]
        )
        np.testing.assert_allclose(
            np.asarray(f(np.array([2.0, 0.0, 0.0]))), [0.0, 0.0, 0.0]
        )
        np.testing.assert_allclose(
            np.asarray(f(np.array([2.0, 4.0, 3.0]))), [12.0, 6.0, 8.0]
        )

    def test_extract_diag_grad_swapped_axes(self):
        import aesara_tpu as atp

        x = at.matrix("x", dtype="float64")
        cost = at.diagonal(x, offset=1, axis1=1, axis2=0).sum()
        g = atp.grad(cost, x)
        f = function([x], g, mode=PY)
        got = np.asarray(f(d(4, 4)))
        # reads x[i+1, i]: gradient on the SUB-diagonal
        want = np.zeros((4, 4))
        for i in range(3):
            want[i + 1, i] = 1.0
        np.testing.assert_array_equal(got, want)

    def test_alloc_static_only_broadcast(self):
        v = at.vector("v", dtype="float64")  # unknown length
        out = at.alloc(v, 5)
        f = function([v], out, mode=PY)
        with pytest.raises(Exception):
            f(np.ones(1))  # runtime-1 over a None dim must NOT broadcast

    def test_argmax_axis_out_of_range(self):
        x = at.matrix("x", dtype="float64")
        with pytest.raises(ValueError):
            tm.argmax(x, axis=2)

    def test_isclose_inf_nan(self):
        a = at.vector("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        f = function([a, b], tm.isclose(a, b, equal_nan=True), mode=PY)
        av = np.array([1.0, np.inf, -np.inf, np.nan])
        bv = np.array([1.0, np.inf, np.inf, np.nan])
        np.testing.assert_array_equal(
            np.asarray(f(av, bv)).astype(bool),
            np.isclose(av, bv, equal_nan=True),
        )


class TestLinalgSortReviewRegressions:
    def test_pinv_grad_rectangular(self):
        import aesara_tpu.tensor.nlinalg as nl
        from tests.unittest_tools import verify_grad

        verify_grad(lambda m: nl.pinv(m).sum(), [d(5, 3)])
        verify_grad(lambda m: nl.pinv(m).sum(), [d(3, 5)])
        verify_grad(lambda m: nl.pinv(m).sum(), [d(4, 4)])

    def test_eigh_grad_nonsymmetric_point(self):
        import aesara_tpu.tensor.nlinalg as nl
        from tests.unittest_tools import verify_grad

        verify_grad(lambda m: nl.eigh(m)[0].sum(), [d(4, 4)])

    def test_eigvalsh_grad_nonsymmetric_point(self):
        import aesara_tpu.tensor.slinalg as sl
        from tests.unittest_tools import verify_grad

        verify_grad(lambda m: sl.eigvalsh(m).sum(), [d(4, 4)])

    def test_solve_pos_lower_triangle(self):
        import scipy.linalg as spla

        import aesara_tpu.tensor.slinalg as sl

        a = at.matrix("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        out = sl.solve(a, b, assume_a="pos", lower=True)
        f = function([a, b], out, mode=PY)
        spd = d(3, 3); spd = spd @ spd.T + 3 * np.eye(3)
        av = np.tril(spd)  # garbage (zeros) in the upper triangle
        av_garbage = av + np.triu(np.full((3, 3), 1e6), 1)
        bv = d(3)
        np.testing.assert_allclose(
            np.asarray(f(av_garbage, bv)),
            spla.solve(spd, bv),
            rtol=1e-10,
        )

    def test_bincount_static_guard(self):
        from aesara_tpu.tensor import extra_ops as xo

        i = at.lvector("i")
        out = xo.bincount(i, minlength=5)
        f = function([i], out, mode=PY)
        np.testing.assert_array_equal(
            np.asarray(f(np.array([0, 1, 1, 3]))), [1, 2, 0, 1, 0]
        )
        with pytest.raises(Exception):
            f(np.array([0, 5]))  # >= minlength must raise, not miscount
        # numpy grow semantics without minlength
        f2 = function([i], xo.bincount(i), mode=PY)
        np.testing.assert_array_equal(
            np.asarray(f2(np.array([0, 5]))), np.bincount([0, 5])
        )

    def test_topk_unsigned_and_negative_k(self):
        from aesara_tpu.tensor.sort import topk

        x = at.tensor("x", dtype="uint8", shape=(None,))
        f = function([x], topk(x, 1), mode=PY)
        assert np.asarray(f(np.array([0, 5, 3], "uint8"))).tolist() == [5]
        y = at.vector("y", dtype="float64")
        fb = function([y], topk(y, -2, sorted=True), mode=PY)
        got = np.asarray(fb(np.array([4.0, -1.0, 7.0, 2.0])))
        np.testing.assert_array_equal(got, [-1.0, 2.0])

    def test_sort_axis_none_flattens(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], at.sort(x, axis=None), mode=PY)
        v = d(2, 3)
        np.testing.assert_array_equal(np.asarray(f(v)), np.sort(v, axis=None))
        f2 = function([x], at.argsort(x, axis=None), mode=PY)
        np.testing.assert_array_equal(
            np.asarray(f2(v)), np.argsort(v, axis=None, kind="stable")
        )

    def test_norm_neg_inf(self):
        v = at.vector("v", dtype="float64")
        f = function([v], tm.norm(v, -np.inf), mode=PY)
        assert float(f(np.array([1.0, 3.0]))) == 1.0

    def test_fused_attention_dv_differs(self):
        from aesara_tpu.tensor.nnet.attention import fused_attention

        q = at.tensor3("q", dtype="float64")
        k = at.tensor3("k", dtype="float64")
        v = at.tensor3("v", dtype="float64")
        out = fused_attention(q, k, v)
        f = function([q, k, v], out, mode=PY)
        res = np.asarray(f(d(2, 5, 4), d(2, 5, 4), d(2, 5, 6)))
        assert res.shape == (2, 5, 6)

    def test_integer_pooling(self):
        from aesara_tpu.tensor.signal.pool import pool_2d

        x = at.tensor4("x", dtype="int32")
        out = pool_2d(x, ws=(2, 2), ignore_border=True, mode="sum")
        f = function([x], out, mode=PY)
        xv = np.arange(16, dtype="int32").reshape(1, 1, 4, 4)
        got = np.asarray(f(xv))
        assert got.dtype == np.int32
        np.testing.assert_array_equal(
            got[0, 0], [[10, 18], [42, 50]]
        )
