"""Math behavior-depth corpus: pins the semantic contracts the
reference exercises throughout ``tests/tensor/test_math.py`` (4,670
LoC) — reduction axis/keepdims grids, argmax tie-breaking, NaN
propagation, mod/floor-div sign rules, rounding modes, power and clip
edge cases, isclose NaN/inf handling, tensordot axes forms, accumulator
dtype widening — each checked against the NumPy oracle on BOTH the
py-oracle and XLA backends."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function

rng = np.random.default_rng(4242)

MODES = ["PY", "FAST_RUN"]


def _sym_like(v, name):
    return at.tensor(dtype=str(v.dtype), shape=(None,) * v.ndim, name=name)


def check(build, arrays, oracle, modes=MODES, rtol=1e-6, atol=1e-6):
    """Compile ``build(*syms)`` under each mode and compare with
    ``oracle(*arrays)``; returns the PY-mode results."""
    syms = [_sym_like(v, f"a{i}") for i, v in enumerate(arrays)]
    out = build(*syms)
    outs = list(out) if isinstance(out, (list, tuple)) else [out]
    want = oracle(*arrays)
    wants = list(want) if isinstance(want, (list, tuple)) else [want]
    got0 = None
    for mode in modes:
        f = function(syms, outs, mode=mode)
        got = f(*arrays)
        assert len(got) == len(wants)
        for g, w in zip(got, wants):
            np.testing.assert_allclose(
                np.asarray(g), w, rtol=rtol, atol=atol,
                err_msg=f"mode={mode}")
        if got0 is None:
            got0 = got
    return got0


# ---------------------------------------------------------------------------
# reductions: axis grids, keepdims, argmax contracts
# ---------------------------------------------------------------------------

AXES_3D = [None, 0, 1, 2, -1, -3, (0, 1), (0, 2), (1, 2), (0, 1, 2)]


class TestReductionAxisGrid:
    @pytest.mark.parametrize("axis", AXES_3D)
    @pytest.mark.parametrize("keepdims", [False, True])
    @pytest.mark.parametrize(
        "op,np_op",
        [(tm.sum, np.sum), (tm.prod, np.prod), (tm.max, np.max),
         (tm.min, np.min), (tm.mean, np.mean)],
    )
    def test_grid(self, axis, keepdims, op, np_op):
        x = rng.normal(size=(3, 4, 5)).astype("float64") * 0.5
        check(lambda s: op(s, axis=axis, keepdims=keepdims), [x],
              lambda v: np_op(v, axis=axis, keepdims=keepdims))

    @pytest.mark.parametrize("axis", [None, 0, 1, -1])
    def test_var_std_ddof(self, axis):
        x = rng.normal(size=(4, 6)).astype("float64")
        for ddof in (0, 1):
            check(lambda s: tm.var(s, axis=axis, ddof=ddof), [x],
                  lambda v: np.var(v, axis=axis, ddof=ddof))
            check(lambda s: tm.std(s, axis=axis, ddof=ddof), [x],
                  lambda v: np.std(v, axis=axis, ddof=ddof))

    def test_ptp(self):
        x = rng.normal(size=(3, 5)).astype("float64")
        for axis in (None, 0, 1):
            check(lambda s: tm.ptp(s, axis=axis), [x],
                  lambda v: np.ptp(v, axis=axis))

    def test_empty_axis_sum_is_identity_shape(self):
        # reduction over an empty tuple of axes: numpy returns x itself
        x = rng.normal(size=(3, 4))
        check(lambda s: tm.sum(s, axis=()), [x], lambda v: np.sum(v, axis=()))


class TestArgmaxContracts:
    @pytest.mark.parametrize("axis", [None, 0, 1, 2, -1])
    def test_matches_numpy(self, axis):
        x = rng.normal(size=(3, 4, 5)).astype("float64")
        check(lambda s: tm.argmax(s, axis=axis), [x],
              lambda v: np.argmax(v, axis=axis))
        check(lambda s: tm.argmin(s, axis=axis), [x],
              lambda v: np.argmin(v, axis=axis))

    def test_tie_takes_first(self):
        # the numpy contract: first occurrence wins on ties
        x = np.array([[1.0, 3.0, 3.0, 0.0], [2.0, 2.0, 1.0, 2.0]])
        check(lambda s: tm.argmax(s, axis=1), [x],
              lambda v: np.argmax(v, axis=1))
        check(lambda s: tm.argmin(s, axis=0), [x],
              lambda v: np.argmin(v, axis=0))

    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_max_and_argmax_pair(self, axis):
        x = rng.normal(size=(4, 6)).astype("float64")
        check(lambda s: list(tm.max_and_argmax(s, axis=axis)), [x],
              lambda v: [np.max(v, axis=axis), np.argmax(v, axis=axis)])

    def test_max_and_argmax_keepdims(self):
        x = rng.normal(size=(4, 6)).astype("float64")
        mx, am = tm.max_and_argmax(at.matrix("m", dtype="float64"),
                                   axis=1, keepdims=True)
        assert mx.type.ndim == 2 and am.type.ndim == 2

    def test_argmax_negative_values_unsigned_case(self):
        x = np.array([[5, 1, 9], [2, 8, 3]], dtype="uint8")
        check(lambda s: tm.argmax(s, axis=1), [x],
              lambda v: np.argmax(v, axis=1))


class TestNaNPropagation:
    """max/min/maximum/minimum propagate NaN exactly like numpy."""

    def test_reduce_propagates(self):
        x = np.array([1.0, np.nan, 3.0])
        for op, np_op in [(tm.max, np.max), (tm.min, np.min),
                          (tm.sum, np.sum), (tm.prod, np.prod)]:
            got = check(lambda s: op(s), [x], lambda v: np_op(v))
            assert np.isnan(np.asarray(got[0]))

    def test_elemwise_maximum_propagates(self):
        a = np.array([1.0, np.nan, 2.0])
        b = np.array([np.nan, 1.0, 3.0])
        check(lambda s, t: tm.maximum(s, t), [a, b], np.maximum)
        check(lambda s, t: tm.minimum(s, t), [a, b], np.minimum)

    def test_argmax_with_nan(self):
        # numpy: argmax returns the nan's position
        x = np.array([1.0, np.nan, 3.0])
        check(lambda s: tm.argmax(s), [x], lambda v: np.argmax(v))


# ---------------------------------------------------------------------------
# division / modulo sign semantics
# ---------------------------------------------------------------------------

class TestModFloorDivSigns:
    """mod/floor-div follow the numpy (Python) sign convention: the
    result takes the DIVISOR's sign — not C's truncation."""

    INT_CASES = [(7, 3), (-7, 3), (7, -3), (-7, -3), (6, 3), (-6, 3)]

    @pytest.mark.parametrize("a,b", INT_CASES)
    def test_int_mod(self, a, b):
        av = np.array([a], dtype="int64")
        bv = np.array([b], dtype="int64")
        check(lambda s, t: tm.mod(s, t), [av, bv], np.mod)

    @pytest.mark.parametrize("a,b", INT_CASES)
    def test_int_floor_div(self, a, b):
        av = np.array([a], dtype="int64")
        bv = np.array([b], dtype="int64")
        check(lambda s, t: tm.int_div(s, t), [av, bv],
              np.floor_divide)

    @pytest.mark.parametrize("a,b", [(7.5, 2.0), (-7.5, 2.0),
                                     (7.5, -2.0), (-7.5, -2.0)])
    def test_float_mod(self, a, b):
        av = np.array([a])
        bv = np.array([b])
        check(lambda s, t: tm.mod(s, t), [av, bv], np.mod)
        check(lambda s, t: tm.floor_div(s, t), [av, bv], np.floor_divide)

    def test_python_operator_routes_to_same(self):
        a = at.vector("a", dtype="int64")
        b = at.vector("b", dtype="int64")
        f = function([a, b], [a % b, a // b], mode="PY")
        r = f(np.array([-7], dtype="int64"), np.array([3], dtype="int64"))
        assert int(np.asarray(r[0])) == 2 and int(np.asarray(r[1])) == -3


# ---------------------------------------------------------------------------
# rounding modes
# ---------------------------------------------------------------------------

class TestRounding:
    HALVES = np.array([-2.5, -1.5, -0.5, 0.5, 1.5, 2.5, 3.5])

    def test_round_half_to_even_matches_numpy(self):
        check(lambda s: tm.round_half_to_even(s), [self.HALVES], np.round)

    def test_default_round_is_half_to_even(self):
        # the reference's round() default mode is half_to_even
        check(lambda s: tm.round(s), [self.HALVES], np.round)

    def test_round_half_away_from_zero(self):
        want = np.array([-3.0, -2.0, -1.0, 1.0, 2.0, 3.0, 4.0])
        got = check(lambda s: tm.round_half_away_from_zero(s),
                    [self.HALVES], lambda v: want)
        np.testing.assert_allclose(np.asarray(got[0]), want)

    def test_iround_returns_int(self):
        x = at.vector("x", dtype="float64")
        y = tm.iround(x)
        assert y.type.dtype.startswith("int")

    def test_floor_ceil_trunc_negatives(self):
        x = np.array([-2.7, -0.5, 0.5, 2.7])
        check(lambda s: tm.floor(s), [x], np.floor)
        check(lambda s: tm.ceil(s), [x], np.ceil)
        check(lambda s: tm.trunc(s), [x], np.trunc)


# ---------------------------------------------------------------------------
# power / sign / clip edge cases
# ---------------------------------------------------------------------------

class TestPowerEdges:
    def test_zero_to_zero_is_one(self):
        a = np.array([0.0])
        b = np.array([0.0])
        check(lambda s, t: tm.power(s, t), [a, b], np.power)

    def test_int_zero_to_zero(self):
        a = np.array([0], dtype="int64")
        b = np.array([0], dtype="int64")
        check(lambda s, t: tm.power(s, t), [a, b], np.power)

    def test_negative_base_fractional_exp_nan(self):
        a = np.array([-2.0])
        b = np.array([0.5])
        got = check(lambda s, t: tm.power(s, t), [a, b],
                    lambda u, v: np.full(1, np.nan))
        assert np.isnan(np.asarray(got[0])).all()

    def test_sqrt_negative_is_nan(self):
        got = check(lambda s: tm.sqrt(s), [np.array([-1.0])],
                    lambda v: np.full(1, np.nan))
        assert np.isnan(np.asarray(got[0])).all()

    def test_sign_of_signed_zero_and_nan(self):
        x = np.array([-0.0, 0.0, -3.0, 4.0])
        check(lambda s: tm.sgn(s), [x], np.sign)


class TestClipEdges:
    def test_min_above_max_takes_max(self):
        # numpy contract: when min > max, result == max
        x = np.array([1.0, 5.0, 9.0])
        check(lambda s: tm.clip(s, 6.0, 2.0), [x],
              lambda v: np.clip(v, 6.0, 2.0))

    def test_clip_with_array_bounds(self):
        x = rng.normal(size=(3, 4))
        lo = np.full((3, 4), -0.5)
        hi = np.full((3, 4), 0.5)
        check(lambda s, a, b: tm.clip(s, a, b), [x, lo, hi], np.clip)

    def test_clip_int_dtype_preserved(self):
        x = at.vector("x", dtype="int32")
        y = tm.clip(x, 0, 10)
        assert y.type.dtype == "int32"


# ---------------------------------------------------------------------------
# isclose / allclose NaN & inf handling
# ---------------------------------------------------------------------------

class TestIsClose:
    A = np.array([1.0, np.nan, np.inf, -np.inf, 2.0])
    B = np.array([1.0 + 1e-9, np.nan, np.inf, np.inf, 2.1])

    def test_isclose_default(self):
        check(lambda s, t: tm.isclose(s, t), [self.A, self.B], np.isclose)

    def test_isclose_equal_nan(self):
        check(lambda s, t: tm.isclose(s, t, equal_nan=True),
              [self.A, self.B],
              lambda u, v: np.isclose(u, v, equal_nan=True))

    def test_allclose_scalar_result(self):
        a = np.array([1.0, 2.0])
        b = np.array([1.0 + 1e-9, 2.0])
        got = check(lambda s, t: tm.allclose(s, t), [a, b], np.allclose)
        assert bool(np.asarray(got[0]))


# ---------------------------------------------------------------------------
# tensordot axes forms / batched_dot validation
# ---------------------------------------------------------------------------

class TestTensordotForms:
    def test_axes_zero_is_outer(self):
        a = rng.normal(size=(2, 3))
        b = rng.normal(size=(4,))
        check(lambda s, t: tm.tensordot(s, t, axes=0), [a, b],
              lambda u, v: np.tensordot(u, v, axes=0))

    def test_axes_two_default(self):
        a = rng.normal(size=(3, 4, 5))
        b = rng.normal(size=(4, 5, 6))
        check(lambda s, t: tm.tensordot(s, t, axes=2), [a, b],
              lambda u, v: np.tensordot(u, v, axes=2))

    @pytest.mark.parametrize("axes", [
        ([2], [0]), ([0, 2], [1, 0]), ((2, 0), (0, 1)),
    ])
    def test_axes_list_pairs(self, axes):
        a = rng.normal(size=(3, 4, 5))
        b = rng.normal(size=(5, 3, 6))
        check(lambda s, t: tm.tensordot(s, t, axes=axes), [a, b],
              lambda u, v: np.tensordot(u, v, axes=axes))

    def test_mismatched_contraction_raises(self):
        a = at.tensor3("a", dtype="float64")
        b = at.tensor3("b", dtype="float64")
        av = rng.normal(size=(3, 4, 5))
        bv = rng.normal(size=(6, 3, 2))
        f = function([a, b], tm.tensordot(a, b, axes=([2], [0])), mode="PY")
        with pytest.raises(Exception):
            f(av, bv)

    def test_batched_dot_values(self):
        a = rng.normal(size=(4, 2, 3))
        b = rng.normal(size=(4, 3, 5))
        check(lambda s, t: tm.batched_dot(s, t), [a, b],
              lambda u, v: np.einsum("bij,bjk->bik", u, v))

    def test_outer_ravel_contract(self):
        # reference outer() ravels >1d inputs
        a = rng.normal(size=(2, 3))
        b = rng.normal(size=(4,))
        check(lambda s, t: tm.outer(s, t), [a, b],
              lambda u, v: np.outer(u, v))


# ---------------------------------------------------------------------------
# accumulator dtype widening
# ---------------------------------------------------------------------------

class TestAccumulatorDtypes:
    """sum/prod on narrow ints widen the ACCUMULATOR (the reference's
    CAReduce acc_dtype contract): int8 sums don't wrap at 127."""

    def test_int8_sum_widens(self):
        x = np.full(100, 100, dtype="int8")
        got = check(lambda s: tm.sum(s), [x],
                    lambda v: np.sum(v, dtype="int64"))
        assert int(np.asarray(got[0])) == 10000

    def test_uint8_prod_widens(self):
        x = np.full(5, 4, dtype="uint8")
        got = check(lambda s: tm.prod(s), [x],
                    lambda v: np.prod(v, dtype="uint64"))
        assert int(np.asarray(got[0])) == 1024

    def test_bool_sum_counts(self):
        x = np.array([True, True, False, True])
        got = check(lambda s: tm.sum(s), [x],
                    lambda v: np.sum(v, dtype="int64"))
        assert int(np.asarray(got[0])) == 3

    def test_explicit_dtype_param(self):
        x = np.arange(10, dtype="int8")
        y = tm.sum(at.vector("v", dtype="int8"), dtype="float64")
        assert y.type.dtype == "float64"
        check(lambda s: tm.sum(s, dtype="float64"), [x],
              lambda v: np.sum(v, dtype="float64"))

    def test_mean_of_int_is_float(self):
        x = np.arange(5, dtype="int32")
        y = tm.mean(at.vector("v", dtype="int32"))
        assert y.type.dtype.startswith("float")
        check(lambda s: tm.mean(s), [x], np.mean)


# ---------------------------------------------------------------------------
# logaddexp / logsumexp stability
# ---------------------------------------------------------------------------

class TestLogExpStability:
    def test_logaddexp_large_args(self):
        a = np.array([1000.0, -1000.0, 0.0])
        b = np.array([1000.0, -999.0, 0.0])
        check(lambda s, t: tm.logaddexp(s, t), [a, b], np.logaddexp)

    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_logsumexp_matches_scipy(self, axis):
        from scipy.special import logsumexp as sp_lse

        x = rng.normal(size=(3, 4)) * 100.0
        check(lambda s: tm.logsumexp(s, axis=axis), [x],
              lambda v: sp_lse(v, axis=axis))

    def test_logsumexp_keepdims(self):
        from scipy.special import logsumexp as sp_lse

        x = rng.normal(size=(3, 4))
        check(lambda s: tm.logsumexp(s, axis=1, keepdims=True), [x],
              lambda v: sp_lse(v, axis=1, keepdims=True))


# ---------------------------------------------------------------------------
# cov
# ---------------------------------------------------------------------------

class TestCov:
    def test_default(self):
        x = rng.normal(size=(3, 8))
        check(lambda s: tm.cov(s), [x], np.cov)

    @pytest.mark.parametrize("ddof,rowvar", [(None, True), (0, True),
                                             (1, False)])
    def test_params(self, ddof, rowvar):
        x = rng.normal(size=(4, 6))
        check(lambda s: tm.cov(s, rowvar=rowvar, ddof=ddof), [x],
              lambda v: np.cov(v, rowvar=rowvar, ddof=ddof))
