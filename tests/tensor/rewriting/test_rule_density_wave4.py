"""Rule-density wave 4 (VERDICT r4 #4): the sigmoid/softplus/erf
stabilization family and the algebraic specializations that previously
had NO dedicated per-rule cases — each rule pinned with firing
patterns, operand-position/broadcast variants, and must-NOT-fire
negatives, asserting topology + py-oracle value equality
(reference pack: ``/root/reference/aesara/tensor/rewriting/math.py``
and its ~10-case/rule suite)."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from tests.rewrite_corpus import (
    count_label, op_labels, rewrite_and_check, rewrite_only)

rng = np.random.default_rng(50505)

CANON = ("canonicalize",)
STAB = ("canonicalize", "stabilize")
SPEC = ("canonicalize", "stabilize", "specialize")


def v(*shape, lo=-2.0, hi=2.0):
    return rng.uniform(lo, hi, size=shape).astype("float64")


def fvec(name="x"):
    return at.vector(name, dtype="float64")


def fmat(name="x"):
    return at.matrix(name, dtype="float64")


# ---------------------------------------------------------------------------
# sigmoid recognition family (stabilize)
# ---------------------------------------------------------------------------

class TestExpOver1PlusExp:
    """exp(x)/(1+exp(x)) → sigmoid(x)."""

    def test_fires(self):
        x = fvec()
        out = tm.exp(x) / (1.0 + tm.exp(x))
        rewrite_and_check([x], out, [v(5)], include=STAB,
                          present=("Sigmoid",))

    def test_matrix_and_broadcast(self):
        x = fmat()
        out = tm.exp(x) / (1.0 + tm.exp(x))
        rewrite_and_check([x], out, [v(3, 4)], include=STAB,
                          present=("Sigmoid",))

    def test_large_args_stable(self):
        # the raw form overflows at x=800; the rewritten one must not
        x = fvec()
        out = tm.exp(x) / (1.0 + tm.exp(x))
        res = rewrite_only(out, include=STAB)
        from tests.rewrite_corpus import py_mode
        from aesara_tpu.compile.function import function

        f = function([x], res, mode=py_mode)
        got = np.asarray(f(np.array([800.0, -800.0])))
        np.testing.assert_allclose(got, [1.0, 0.0], atol=1e-12)

    def test_not_fire_different_args(self):
        x, y = fvec("x"), fvec("y")
        out = tm.exp(x) / (1.0 + tm.exp(y))
        res = rewrite_only(out, include=STAB)
        assert "Sigmoid" not in op_labels(res)


class TestReciprocal1PlusExp:
    """1/(1+exp(-x)) → sigmoid(x)."""

    def test_fires(self):
        x = fvec()
        out = 1.0 / (1.0 + tm.exp(-x))
        rewrite_and_check([x], out, [v(5)], include=STAB,
                          present=("Sigmoid",))

    def test_reciprocal_form(self):
        x = fvec()
        out = tm.reciprocal(1.0 + tm.exp(-x))
        rewrite_and_check([x], out, [v(5)], include=STAB,
                          present=("Sigmoid",))

    def test_value_parity_extremes(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fvec()
        res = rewrite_only(1.0 / (1.0 + tm.exp(-x)), include=STAB)
        f = function([x], res, mode=py_mode)
        got = np.asarray(f(np.array([30.0, -30.0, 0.0])))
        want = 1.0 / (1.0 + np.exp(-np.array([30.0, -30.0, 0.0])))
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_not_fire_on_plus_exp_x(self):
        # 1/(1+exp(x)) is sigmoid(-x); whether it fires or not, value
        # must hold — pin at least the value
        x = fvec()
        out = 1.0 / (1.0 + tm.exp(x))
        rewrite_and_check([x], out, [v(5)], include=STAB)


class Test1mSigmoid:
    """1 - sigmoid(x) → sigmoid(-x)."""

    def test_fires(self):
        x = fvec()
        out = 1.0 - tm.sigmoid(x)
        res = rewrite_and_check([x], out, [v(5)], include=STAB,
                                present=("Sigmoid",))
        assert count_label(res, "Sub") == 0

    def test_matrix(self):
        x = fmat()
        out = 1.0 - tm.sigmoid(x)
        rewrite_and_check([x], out, [v(2, 3)], include=STAB)

    def test_not_fire_other_constant(self):
        x = fvec()
        out = 2.0 - tm.sigmoid(x)
        rewrite_and_check([x], out, [v(5)], include=STAB)


class TestLogSigmoidToSoftplus:
    """log(sigmoid(x)) → -softplus(-x)."""

    def test_fires(self):
        x = fvec()
        out = tm.log(tm.sigmoid(x))
        res = rewrite_and_check([x], out, [v(5)], include=STAB,
                                present=("Softplus",))
        assert "Log" not in op_labels(res) or "Sigmoid" not in op_labels(res)

    def test_stable_at_large_negative(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fvec()
        res = rewrite_only(tm.log(tm.sigmoid(x)), include=STAB)
        f = function([x], res, mode=py_mode)
        got = np.asarray(f(np.array([-800.0])))
        np.testing.assert_allclose(got, [-800.0])  # raw form gives -inf

    def test_grad_form_log1p_exp(self):
        x = fvec()
        out = tm.log1p(tm.exp(x))
        rewrite_and_check([x], out, [v(5)], include=STAB,
                          present=("Softplus",))

    def test_log1p_exp_large(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fvec()
        res = rewrite_only(tm.log1p(tm.exp(x)), include=STAB)
        f = function([x], res, mode=py_mode)
        got = np.asarray(f(np.array([900.0])))
        np.testing.assert_allclose(got, [900.0])


class TestExpm1Recognition:
    """exp(x) - 1 → expm1(x)."""

    def test_fires(self):
        x = fvec()
        out = tm.exp(x) - 1.0
        rewrite_and_check([x], out, [v(5)], include=STAB,
                          present=("Expm1",))

    def test_small_x_precision(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fvec()
        res = rewrite_only(tm.exp(x) - 1.0, include=STAB)
        f = function([x], res, mode=py_mode)
        tiny = np.array([1e-12])
        np.testing.assert_allclose(np.asarray(f(tiny)),
                                   np.expm1(tiny), rtol=1e-12)

    def test_not_fire_minus_two(self):
        x = fvec()
        out = tm.exp(x) - 2.0
        res = rewrite_only(out, include=STAB)
        assert "Expm1" not in op_labels(res)


class TestLogAddExp:
    """log(exp(a)+exp(b)) → logaddexp(a,b) (stable)."""

    def test_fires_and_stable(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        a, b = fvec("a"), fvec("b")
        out = tm.log(tm.exp(a) + tm.exp(b))
        res = rewrite_only(out, include=STAB)
        f = function([a, b], res, mode=py_mode)
        got = np.asarray(f(np.array([900.0]), np.array([899.0])))
        want = np.logaddexp(900.0, 899.0)
        np.testing.assert_allclose(got, [want])

    def test_value_parity(self):
        a, b = fvec("a"), fvec("b")
        out = tm.log(tm.exp(a) + tm.exp(b))
        rewrite_and_check([a, b], out, [v(5), v(5)], include=STAB)


class TestSigmTimesExp:
    """sigmoid(x) * exp(-x) → sigmoid(-x) (the reference's
    sigm_times_exp family)."""

    def test_value_parity(self):
        x = fvec()
        out = tm.sigmoid(x) * tm.exp(-x)
        rewrite_and_check([x], out, [v(5)], include=STAB)

    def test_nested_products(self):
        x, y = fvec("x"), fvec("y")
        out = tm.sigmoid(x) * tm.exp(-x) * tm.sigmoid(y)
        rewrite_and_check([x, y], out, [v(5), v(5)], include=STAB)


# ---------------------------------------------------------------------------
# erf family
# ---------------------------------------------------------------------------

class TestErfFamily:
    def test_complement_fires(self):
        x = fvec()
        out = 1.0 - tm.erf(x)
        rewrite_and_check([x], out, [v(5)], include=STAB,
                          present=("Erfc",))

    def test_complement_tail_stable(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fvec()
        res = rewrite_only(1.0 - tm.erf(x), include=STAB)
        f = function([x], res, mode=py_mode)
        got = np.asarray(f(np.array([9.0])))
        assert got[0] > 0.0          # raw form underflows to exactly 0

    def test_erf_neg_canonicalizes(self):
        x = fvec()
        out = tm.erf(-x)
        res = rewrite_and_check([x], out, [v(5)], include=CANON)
        # erf(-x) → -erf(x): the negation moved outside
        assert "Erf" in op_labels(res)

    def test_erfc_of_neg_value(self):
        x = fvec()
        out = tm.erfc(-x)
        rewrite_and_check([x], out, [v(5)], include=SPEC)


# ---------------------------------------------------------------------------
# algebraic specializations
# ---------------------------------------------------------------------------

class TestMulToSqr:
    def test_fires(self):
        x = fvec()
        res = rewrite_and_check([x], x * x, [v(5)], include=SPEC,
                                present=("Sqr",))
        assert "Mul" not in op_labels(res)

    def test_matrix(self):
        x = fmat()
        rewrite_and_check([x], x * x, [v(3, 3)], include=SPEC,
                          present=("Sqr",))

    def test_not_fire_x_times_y(self):
        x, y = fvec("x"), fvec("y")
        res = rewrite_only(x * y, include=SPEC)
        assert "Sqr" not in op_labels(res)


class TestAddNegToSub:
    def test_fires(self):
        x, y = fvec("x"), fvec("y")
        out = x + (-y)
        res = rewrite_and_check([x, y], out, [v(5), v(5)], include=SPEC,
                                present=("Sub",))

    def test_value_neg_first(self):
        x, y = fvec("x"), fvec("y")
        out = (-y) + x
        rewrite_and_check([x, y], out, [v(5), v(5)], include=SPEC)


class TestZeroAndOneDiv:
    def test_zero_div_folds(self):
        x = fvec()
        out = 0.0 / x
        res = rewrite_and_check([x], out, [v(5, lo=0.5, hi=2.0)],
                                include=CANON)
        assert "TrueDiv" not in op_labels(res)

    def test_div_one_folds(self):
        x = fvec()
        out = x / 1.0
        res = rewrite_and_check([x], out, [v(5)], include=CANON)
        assert "TrueDiv" not in op_labels(res)

    def test_div_minus_one_is_neg(self):
        x = fvec()
        out = x / -1.0
        rewrite_and_check([x], out, [v(5)], include=SPEC)

    def test_int_div_by_one(self):
        x = at.lvector("x")
        out = x // 1
        res = rewrite_and_check([x], out,
                                [rng.integers(-5, 5, size=4)],
                                include=CANON)
        assert "IntDiv" not in op_labels(res)


class TestPowCanonicalize:
    @pytest.mark.parametrize("e,label_gone", [
        (0.0, "Pow"), (1.0, "Pow"),
    ])
    def test_trivial_exponents(self, e, label_gone):
        x = fvec()
        out = x ** e
        res = rewrite_and_check([x], out, [v(5, lo=0.5, hi=2.0)],
                                include=CANON)
        assert label_gone not in op_labels(res)

    def test_pow_two_specializes_to_sqr(self):
        x = fvec()
        res = rewrite_and_check([x], x ** 2.0, [v(5)], include=SPEC)
        assert "Pow" not in op_labels(res)

    def test_pow_half_specializes_to_sqrt(self):
        x = fvec()
        res = rewrite_and_check([x], x ** 0.5, [v(5, lo=0.2, hi=2.0)],
                                include=SPEC)
        assert "Pow" not in op_labels(res)

    def test_pow_minus_one_is_reciprocal(self):
        x = fvec()
        res = rewrite_and_check([x], x ** -1.0, [v(5, lo=0.5, hi=2.0)],
                                include=SPEC)
        assert "Pow" not in op_labels(res)

    def test_symbolic_exponent_untouched(self):
        x, e = fvec("x"), at.scalar("e", dtype="float64")
        res = rewrite_only(x ** e, include=SPEC)
        assert "Pow" in op_labels(res)


class TestAbsFamily:
    def test_useless_abs_of_sqr(self):
        x = fvec()
        out = tm.abs(tm.sqr(x))
        res = rewrite_and_check([x], out, [v(5)], include=CANON)
        assert "Abs" not in op_labels(res)

    def test_useless_abs_of_exp(self):
        x = fvec()
        out = tm.abs(tm.exp(x))
        res = rewrite_and_check([x], out, [v(5)], include=CANON)
        assert "Abs" not in op_labels(res)

    def test_abs_of_neg_lifts(self):
        x = fvec()
        out = tm.abs(-x)
        res = rewrite_and_check([x], out, [v(5)], include=CANON)
        assert "Neg" not in op_labels(res)

    def test_abs_merge_product(self):
        x, y = fvec("x"), fvec("y")
        out = tm.abs(x) * tm.abs(y)
        rewrite_and_check([x, y], out, [v(5), v(5)], include=SPEC)

    def test_abs_kept_on_plain_input(self):
        x = fvec()
        res = rewrite_only(tm.abs(x), include=SPEC)
        assert "Abs" in op_labels(res)


class TestUselessComparisons:
    def test_eq_same_arg(self):
        x = fvec()
        res = rewrite_and_check([x], tm.eq(x, x), [v(5)], include=CANON)
        assert "EQ" not in op_labels(res) and "Eq" not in op_labels(res)

    def test_le_same_arg(self):
        x = fvec()
        rewrite_and_check([x], tm.le(x, x), [v(5)], include=CANON)

    def test_lt_same_arg_is_zeros(self):
        x = fvec()
        res = rewrite_and_check([x], tm.lt(x, x), [v(5)], include=CANON)
        assert "LT" not in op_labels(res) and "Lt" not in op_labels(res)

    def test_not_fire_different_args(self):
        x, y = fvec("x"), fvec("y")
        rewrite_and_check([x, y], tm.eq(x, y), [v(5), v(5)],
                          include=CANON)

    def test_maximum_same_arg(self):
        x = fvec()
        res = rewrite_and_check([x], tm.maximum(x, x), [v(5)],
                                include=CANON)
        assert "Maximum" not in op_labels(res)

    def test_minimum_same_arg(self):
        x = fvec()
        res = rewrite_and_check([x], tm.minimum(x, x), [v(5)],
                                include=CANON)
        assert "Minimum" not in op_labels(res)


class TestCastRules:
    def test_useless_cast_same_dtype(self):
        x = fvec()
        out = at.cast(x, "float64")
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        assert res is x or "Cast" not in op_labels(res)

    def test_cast_cast_collapses_widening_chain(self):
        x = at.vector("x", dtype="float32")
        out = at.cast(at.cast(x, "float64"), "float64")
        res = rewrite_and_check(
            [x], out, [v(4).astype("float32")], include=CANON)
        # one cast survives, not two
        assert count_label(res, "Cast") <= 1

    def test_narrowing_then_widening_not_merged(self):
        # f64 → f32 → f64 LOSES precision; folding to identity would be
        # wrong.  Value equality against the unrewritten graph pins it.
        x = fvec()
        out = at.cast(at.cast(x, "float32"), "float64")
        rewrite_and_check([x], out, [v(4) + 1e-10], include=CANON)

    def test_int_cast_chain(self):
        x = at.lvector("x")
        out = at.cast(at.cast(x, "int32"), "int64")
        rewrite_and_check([x], out, [rng.integers(0, 100, size=4)],
                          include=CANON)


class TestUselessConj:
    def test_real_input_conj_gone(self):
        x = fvec()
        out = tm.conj(x)
        res = rewrite_and_check([x], out, [v(5)], include=CANON)
        assert "Conj" not in op_labels(res)

    def test_complex_input_conj_kept(self):
        z = at.vector("z", dtype="complex128")
        res = rewrite_only(tm.conj(z), include=CANON)
        assert "Conj" in op_labels(res)


class TestFuncInv:
    """f(f^-1(x)) composition elimination (exp/log, neg/neg, ...)."""

    def test_exp_log(self):
        x = fvec()
        out = tm.exp(tm.log(x))
        res = rewrite_and_check([x], out, [v(5, lo=0.3, hi=3.0)],
                                include=SPEC)
        assert "Exp" not in op_labels(res)

    def test_neg_neg(self):
        x = fvec()
        res = rewrite_and_check([x], -(-x), [v(5)], include=SPEC)
        assert "Neg" not in op_labels(res)

    def test_conj_conj(self):
        z = at.vector("z", dtype="complex128")
        out = tm.conj(tm.conj(z))
        res = rewrite_only(out, include=SPEC)
        assert count_label(res, "Conj") == 0

    def test_log_exp_only_under_canon(self):
        x = fvec()
        out = tm.log(tm.exp(x))
        rewrite_and_check([x], out, [v(5)], include=SPEC)


# ---------------------------------------------------------------------------
# softmax graph recognition (specialize)
# ---------------------------------------------------------------------------

class TestSoftmaxRecognition:
    def test_exp_over_sum_exp(self):
        x = fmat()
        e = tm.exp(x)
        out = e / tm.sum(e, axis=-1, keepdims=True)
        rewrite_and_check([x], out, [v(3, 5)], include=SPEC,
                          present=("Softmax",))

    def test_value_extremes(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fmat()
        e = tm.exp(x)
        res = rewrite_only(e / tm.sum(e, axis=-1, keepdims=True),
                           include=SPEC)
        f = function([x], res, mode=py_mode)
        big = np.array([[1000.0, 999.0, 0.0]])
        got = np.asarray(f(big))
        assert np.isfinite(got).all()          # raw form is nan
        np.testing.assert_allclose(got.sum(), 1.0, rtol=1e-12)

    def test_log_softmax_fuses(self):
        from aesara_tpu.tensor.special import softmax

        x = fmat()
        out = tm.log(softmax(x, axis=-1))
        res = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)
        labels = op_labels(res)
        assert "LogSoftmax" in labels or "Log" not in labels

    def test_logsoftmax_stable(self):
        from aesara_tpu.compile.function import function
        from aesara_tpu.tensor.special import softmax
        from tests.rewrite_corpus import py_mode

        x = fmat()
        res = rewrite_only(tm.log(softmax(x, axis=-1)), include=SPEC)
        f = function([x], res, mode=py_mode)
        got = np.asarray(f(np.array([[-1000.0, 0.0]])))
        assert np.isfinite(got).all()          # raw log(softmax) is -inf
