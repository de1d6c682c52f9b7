"""Rule-density wave 4 (VERDICT r4 item 4): the reduction-restructuring
and dot-lift families at ~10 cases each — `local_sum_div_dimshuffle`,
`local_sum_of_alloc`, `local_sum_mul_by_scalar` / `local_sum_div_by_scalar`,
`local_reduce_join`, `local_reduce_chain`, `local_lift_transpose_through_dot`,
`local_sumsqr2dot`, `local_0_dot_x`, `local_reduce_broadcastable`,
`local_useless_reduce` (rule bodies: ``aesara_tpu/tensor/rewriting/math.py``;
reference pack ``/root/reference/aesara/tensor/rewriting/math.py``).

Each case asserts post-rewrite topology via op labels AND value equality
through the py oracle.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.graph.ir import ancestors
from tests.rewrite_corpus import (
    count_label,
    op_labels,
    rewrite_and_check,
    rewrite_only,
)

rng = np.random.default_rng(60606)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")


def v(*shape, dtype="float64"):
    return rng.uniform(-2.0, 2.0, size=shape).astype(dtype)


# ---------------------------------------------------------------------------
# local_sum_mul_by_scalar / local_sum_div_by_scalar: pull loop-invariant
# scalars out of reductions
# ---------------------------------------------------------------------------

class TestSumScalarLift:
    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_sum_mul_scalar_lifts(self, axis):
        x = at.matrix("x", dtype="float64")
        s = at.scalar("s", dtype="float64")
        out = (x * s).sum(axis=axis)
        r = rewrite_and_check([x, s], out, [v(3, 4), 2.5], include=SPEC)
        # after the lift the mul happens on the REDUCED value: the Sum's
        # direct input is x itself (no Mul between them)
        sums = [vv.owner for vv in ancestors([r])
                if vv.owner and type(vv.owner.op).__name__ == "Sum"]
        assert sums, "Sum survived"
        for node in sums:
            assert node.inputs[0].owner is None or (
                "Mul" not in op_labels([node.inputs[0]]))

    def test_sum_div_scalar_lifts(self):
        x = at.matrix("x", dtype="float64")
        s = at.scalar("s", dtype="float64")
        out = (x / s).sum()
        rewrite_and_check([x, s], out, [v(3, 4), 2.5], include=SPEC)

    def test_sum_mul_two_scalars(self):
        x = at.matrix("x", dtype="float64")
        out = (x * 2.0 * 3.0).sum()
        r = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)

    def test_not_fire_on_elementwise_factor(self):
        """A non-scalar factor cannot be pulled out of the reduction."""
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        out = (x * y).sum()
        r = rewrite_and_check([x, y], out, [v(3, 4), v(3, 4)], include=SPEC)

    def test_prod_not_confused_with_sum(self):
        """prod(x*s) ≠ s·prod(x) — the sum-lift must not touch Prod
        (it would need s**n)."""
        x = at.vector("x", dtype="float64")
        s = at.scalar("s", dtype="float64")
        out = (x * s).prod()
        rewrite_and_check([x, s], out, [v(5), 1.3], include=SPEC)

    def test_mean_path_value(self):
        x = at.matrix("x", dtype="float64")
        out = tm.mean(x * 4.0, axis=1)
        rewrite_and_check([x], out, [v(3, 4)], include=SPEC)

    @pytest.mark.parametrize("dtype", ["float32", "int64"])
    def test_dtype_grid(self, dtype):
        x = at.matrix("x", dtype=dtype)
        s_val = np.array(3, dtype=dtype)
        out = (x * at.constant(s_val)).sum()
        xv = (v(3, 4) * 3).astype(dtype)
        rewrite_and_check([x], out, [xv], include=SPEC)


# ---------------------------------------------------------------------------
# local_sum_of_alloc: reduce over broadcast/alloc'd data without
# materializing
# ---------------------------------------------------------------------------

class TestSumOfAlloc:
    def test_sum_all_of_alloc_scalar(self):
        s = at.scalar("s", dtype="float64")
        out = at.alloc(s, 4, 5).sum()
        r = rewrite_and_check([s], out, [2.0], include=SPEC)
        assert "Alloc" not in op_labels(r)

    @pytest.mark.parametrize("axis", [0, 1])
    def test_sum_axis_of_alloc_scalar(self, axis):
        s = at.scalar("s", dtype="float64")
        out = at.alloc(s, 4, 5).sum(axis=axis)
        r = rewrite_and_check([s], out, [2.0], include=SPEC)

    def test_sum_of_alloc_vector_rows(self):
        w = at.vector("w", dtype="float64")
        out = at.alloc(w, 6, 3).sum(axis=0)  # 6 * w
        r = rewrite_and_check([w], out, [v(3)], include=SPEC)

    def test_sum_of_zeros_folds(self):
        out = at.zeros((3, 4)).sum()
        rewrite_and_check([], out, [], include=SPEC,
                          expect_constant=np.float64(0.0))

    def test_sum_of_ones_count(self):
        out = at.ones((3, 4)).sum()
        rewrite_and_check([], out, [], include=SPEC,
                          expect_constant=np.float64(12.0))

    def test_dynamic_alloc_dims(self):
        s = at.scalar("s", dtype="float64")
        n = at.iscalar("n")
        out = at.alloc(s, n, 3).sum()
        rewrite_and_check([s, n], out, [1.5, 4], include=SPEC)


# ---------------------------------------------------------------------------
# local_reduce_chain: sum(sum(x, a), b) folds into one reduction
# ---------------------------------------------------------------------------

class TestReduceChain:
    @pytest.mark.parametrize("a1,a2", [(0, 0), (1, 0), (0, 1), (2, 0)])
    def test_sum_sum_folds(self, a1, a2):
        x = at.tensor3("x", dtype="float64")
        out = x.sum(axis=a1).sum(axis=a2)
        r = rewrite_and_check([x], out, [v(2, 3, 4)], include=SPEC)
        assert count_label(r, "Sum") <= 1

    def test_sum_all_of_sum_axis(self):
        x = at.matrix("x", dtype="float64")
        out = x.sum(axis=0).sum()
        r = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)
        assert count_label(r, "Sum") <= 1

    @pytest.mark.parametrize("red", ["max", "min", "prod"])
    def test_other_reductions_chain(self, red):
        x = at.tensor3("x", dtype="float64")
        out = getattr(getattr(x, red)(axis=0), red)(axis=0)
        rewrite_and_check([x], out, [v(2, 3, 4)], include=SPEC)

    def test_mixed_reductions_do_not_fold(self):
        """sum(max(x,0),0) must stay two reductions."""
        x = at.tensor3("x", dtype="float64")
        out = x.max(axis=0).sum(axis=0)
        rewrite_and_check([x], out, [v(2, 3, 4)], include=SPEC)


# ---------------------------------------------------------------------------
# local_reduce_join: sum(join(0, a, b)) → a_sum + b_sum shapes
# ---------------------------------------------------------------------------

class TestReduceJoin:
    def test_sum_of_join_axis0(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = at.concatenate([a, b], axis=0).sum(axis=0)
        r = rewrite_and_check([a, b], out, [v(2, 3), v(4, 3)], include=SPEC)

    def test_sum_all_of_join(self):
        a = at.vector("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        out = at.concatenate([a, b]).sum()
        rewrite_and_check([a, b], out, [v(3), v(5)], include=SPEC)

    def test_sum_other_axis_keeps_join_or_value(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = at.concatenate([a, b], axis=0).sum(axis=1)
        rewrite_and_check([a, b], out, [v(2, 3), v(4, 3)], include=SPEC)

    def test_stack_of_scalars_sum(self):
        xs = [at.scalar(f"s{i}", dtype="float64") for i in range(3)]
        out = at.stack(xs).sum()
        rewrite_and_check(xs, out, [1.0, 2.0, 3.0], include=SPEC)


# ---------------------------------------------------------------------------
# local_sum_div_dimshuffle: sum(x / col_like) with the divisor constant
# along the reduced axis
# ---------------------------------------------------------------------------

class TestSumDivDimshuffle:
    def test_sum_axis1_div_col(self):
        x = at.matrix("x", dtype="float64")
        d = at.vector("d", dtype="float64")
        out = (x / d.dimshuffle(0, "x")).sum(axis=1)
        rewrite_and_check([x, d], out, [v(3, 4), v(3) + 3.0], include=SPEC)

    def test_sum_axis0_div_row(self):
        x = at.matrix("x", dtype="float64")
        d = at.vector("d", dtype="float64")
        out = (x / d.dimshuffle("x", 0)).sum(axis=0)
        rewrite_and_check([x, d], out, [v(3, 4), v(4) + 3.0], include=SPEC)

    def test_divisor_varies_along_reduced_axis_no_lift(self):
        x = at.matrix("x", dtype="float64")
        d = at.matrix("d", dtype="float64")
        out = (x / d).sum(axis=1)
        rewrite_and_check([x, d], out, [v(3, 4), v(3, 4) + 3.0],
                          include=SPEC)


# ---------------------------------------------------------------------------
# local_lift_transpose_through_dot: (A·B)ᵀ → Bᵀ·Aᵀ
# ---------------------------------------------------------------------------

class TestTransposeDotLift:
    def test_mm(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = tm.dot(a, b).T
        r = rewrite_and_check([a, b], out, [v(3, 4), v(4, 5)],
                              include=CANON)

    def test_value_chain_three_factors(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        c = at.matrix("c", dtype="float64")
        out = tm.dot(tm.dot(a, b), c).T
        rewrite_and_check([a, b, c], out, [v(2, 3), v(3, 4), v(4, 5)],
                          include=CANON)

    def test_no_fire_on_plain_transpose(self):
        a = at.matrix("a", dtype="float64")
        rewrite_and_check([a], a.T + 1.0, [v(3, 4)], include=CANON)

    def test_grad_of_lifted_matches(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        from aesara_tpu.gradient import grad

        cost = tm.dot(a, b).T.sum()
        g = grad(cost, a)
        rewrite_and_check([a, b], g, [v(3, 4), v(4, 5)], include=CANON)


# ---------------------------------------------------------------------------
# local_sumsqr2dot: sum(sqr(W·g breadth), axis) patterns onto the MXU
# ---------------------------------------------------------------------------

class TestSumSqrToDot:
    def test_fire_pattern(self):
        w = at.matrix("w", dtype="float64")
        g = at.matrix("g", dtype="float64")
        out = tm.sqr(w * g).sum(axis=(0, 1))
        rewrite_and_check([w, g], out, [v(4, 5), v(4, 5)], include=SPEC)

    def test_value_with_axis_none(self):
        w = at.matrix("w", dtype="float64")
        out = tm.sqr(w).sum()
        rewrite_and_check([w], out, [v(4, 5)], include=SPEC)


# ---------------------------------------------------------------------------
# local_0_dot_x + local_useless_reduce + local_reduce_broadcastable
# ---------------------------------------------------------------------------

class TestDegenerateReductionsAndDots:
    def test_zero_dot_left(self):
        x = at.matrix("x", dtype="float64")
        z = at.zeros((3, 4))
        out = tm.dot(z, x)
        r = rewrite_and_check([x], out, [v(4, 5)], include=SPEC)
        assert "Dot" not in op_labels(r) and "Dot22" not in op_labels(r)

    def test_zero_dot_right(self):
        x = at.matrix("x", dtype="float64")
        z = at.zeros((4, 5))
        out = tm.dot(x, z)
        r = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)
        assert "Dot" not in op_labels(r) and "Dot22" not in op_labels(r)

    def test_reduce_over_no_axes_is_identity(self):
        x = at.matrix("x", dtype="float64")
        out = x.sum(axis=[])
        r = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)
        assert "Sum" not in op_labels(r)

    def test_reduce_broadcastable_axis_drops_to_reshape(self):
        """Reducing a statically-1 axis is a DimShuffle, not a loop."""
        x = at.TensorType("float64", (None, 1))("x")
        out = x.sum(axis=1)
        r = rewrite_and_check([x], out, [v(3, 1)], include=SPEC)
        assert "Sum" not in op_labels(r)

    def test_reduce_scalar_input(self):
        x = at.scalar("x", dtype="float64")
        out = x.sum()
        r = rewrite_and_check([x], out, [2.0], include=SPEC)
        assert "Sum" not in op_labels(r)

    def test_partial_broadcast_reduction_keeps_other_axis(self):
        x = at.TensorType("float64", (1, None))("x")
        out = x.sum(axis=(0, 1))
        rewrite_and_check([x], out, [v(1, 4)], include=SPEC)


# ---------------------------------------------------------------------------
# local_sum_of_neg: sum(-x) → -sum(x)
# ---------------------------------------------------------------------------

class TestSumOfNeg:
    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_fire_grid(self, axis):
        x = at.matrix("x", dtype="float64")
        out = (-x).sum(axis=axis)
        r = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)

    def test_value_nested_neg(self):
        x = at.vector("x", dtype="float64")
        out = (-(-x)).sum()
        r = rewrite_and_check([x], out, [v(5)], include=SPEC)
        assert "Neg" not in op_labels(r)
