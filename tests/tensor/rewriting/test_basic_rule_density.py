"""Per-rule density corpus for the basic rewrite pack (VERDICT r3 weak
#5): ~10 operand patterns per high-traffic structural rule — cast
chains, fill/alloc shapes, join/split arities, switch grids, dimshuffle
permutations — asserting topology and value through the py oracle.

Rule bodies under test: ``aesara_tpu/tensor/rewriting/basic.py``
(reference pack: ``/root/reference/aesara/tensor/rewriting/basic.py``).
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from tests.rewrite_corpus import count_label, rewrite_and_check, rewrite_only

rng = np.random.default_rng(60606)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")


def v(*shape, dtype="float64"):
    return rng.uniform(-2.0, 2.0, size=shape).astype(dtype)


# ---------------------------------------------------------------------------
# cast rules: useless_cast / cast_cast
# ---------------------------------------------------------------------------

class TestCastRules:
    @pytest.mark.parametrize("dtype", ["float64", "int32", "int64", "uint8",
                                       "complex128", "bool"])
    def test_same_dtype_cast_vanishes(self, dtype):
        x = at.vector("x", dtype=dtype)
        out = at.cast(x, dtype)
        res = rewrite_only(out, include=CANON)
        assert res is x

    @pytest.mark.parametrize("base,d1,d2", [
        ("float16", "float32", "float64"),   # widen-widen
        ("float16", "float64", "float32"),   # widen then narrow
        ("int8", "int16", "int64"),
        ("int8", "int64", "int32"),
        ("float16", "float32", "complex64"),
    ])
    def test_safe_inner_cast_chain_collapses(self, base, d1, d2):
        # cast(cast(x, d1), d2) → cast(x, d2) when base→d1 is a SAFE
        # cast (the inner hop loses nothing)
        x = at.vector("x", dtype=base)
        out = at.cast(at.cast(x, d1), d2)
        res = rewrite_and_check(
            [x], out,
            [np.array([1, -2, 3, 0]).astype(base)], include=CANON,
        )
        assert count_label(res, "Cast") <= 1

    @pytest.mark.parametrize("base,d1,d2", [
        ("float32", "int16", "int64"),   # lossy truncation inside
        ("float64", "float32", "float64"),  # precision-losing hop
        ("int64", "int32", "int64"),
    ])
    def test_lossy_inner_cast_chain_must_not_collapse(self, base, d1, d2):
        # the inner hop CHANGES values: both casts must survive and the
        # value keeps the truncation
        x = at.vector("x", dtype=base)
        out = at.cast(at.cast(x, d1), d2)
        res = rewrite_and_check(
            [x], out,
            [np.array([100000.7, -2.3, 5.0, 0.1]).astype(base)],
            include=CANON,
        )
        assert count_label(res, "Cast") == 2

    def test_narrowing_middle_hop_is_kept_or_exact(self):
        # float64 -> int32 -> float64 is value-changing: whatever the
        # rewriter does must preserve the TRUNCATED value
        x = at.dvector("x")
        out = at.cast(at.cast(x, "int32"), "float64")
        rewrite_and_check([x], out, [np.array([1.7, -2.3, 0.5])],
                          include=CANON)

    def test_cast_of_constant_folds(self):
        out = at.cast(at.as_tensor_variable(np.arange(3, dtype="int64")),
                      "float32")
        res = rewrite_only(out, include=SPEC)
        assert res.owner is None  # folded to a Constant


# ---------------------------------------------------------------------------
# fill / alloc family
# ---------------------------------------------------------------------------

class TestFillAllocRules:
    def test_fill_same_shape_is_noop(self):
        x, y = at.dmatrix("x"), at.dmatrix("y")
        out = at.fill(x, y)  # same ndim/dtype/static shape → y
        res = rewrite_only(out, include=CANON)
        assert res is y

    def test_fill_broadcast_survives_value(self):
        x = at.dmatrix("x")
        s = at.dscalar("s")
        rewrite_and_check([x, s], at.fill(x, s), [v(3, 4), 2.5],
                          include=CANON)

    @pytest.mark.parametrize("shape", [(4,), (3, 4), (2, 3, 4)])
    def test_useless_alloc_static_match(self, shape):
        x = at.tensor("x", dtype="float64", shape=shape)
        out = at.alloc(x, *shape)
        res = rewrite_only(out, include=CANON)
        assert res is x

    def test_alloc_broadcasting_survives(self):
        x = at.tensor("x", dtype="float64", shape=(1, 4))
        out = at.alloc(x, 3, 4)
        res = rewrite_and_check([x], out, [v(1, 4)], include=CANON)
        assert count_label(res, "Alloc") == 1

    def test_merge_alloc_chain(self):
        s = at.dscalar("s")
        out = at.alloc(at.alloc(s, 4), 3, 4)
        res = rewrite_and_check([s], out, [1.5], include=CANON)
        assert count_label(res, "Alloc") == 1

    @pytest.mark.parametrize("fn", [at.exp, at.neg, at.sqr])
    def test_alloc_unary_sinks(self, fn):
        # f(alloc(x, ...)) → alloc(f(x), ...): compute once, then
        # broadcast (HBM: writes the small buffer, not the big one)
        s = at.dscalar("s")
        out = fn(at.alloc(s, 3, 4))
        res = rewrite_and_check([s], out, [0.7], include=SPEC)
        assert count_label(res, "Alloc") == 1
        assert type(res.owner.op).__name__ == "Alloc"

    def test_elemwise_alloc_operand_drops_broadcast(self):
        # add(alloc(a, 3, 4), b) with b already (3, 4): XLA broadcasts
        # natively, the materialized alloc is waste
        a = at.dscalar("a")
        b = at.tensor("b", dtype="float64", shape=(3, 4))
        out = at.add(at.alloc(a, 3, 4), b)
        res = rewrite_and_check([a, b], out, [0.5, v(3, 4)], include=SPEC)
        assert count_label(res, "Alloc") == 0


# ---------------------------------------------------------------------------
# join / split family
# ---------------------------------------------------------------------------

class TestJoinSplitRules:
    def test_join_single_operand(self):
        x = at.dmatrix("x")
        out = at.join(0, x)
        res = rewrite_only(out, include=CANON)
        assert res is x

    @pytest.mark.parametrize("axis", [0, 1])
    def test_join_with_empty_operand(self, axis):
        x, y = at.dmatrix("x"), at.dmatrix("y")
        empty = at.zeros((0, 4) if axis == 0 else (3, 0))
        out = at.join(axis, x, empty, y)
        res = rewrite_and_check(
            [x, y], out,
            [v(2, 4), v(3, 4)] if axis == 0 else [v(3, 2), v(3, 5)],
            include=CANON,
        )
        join_nodes = [
            n for n in [res.owner] if type(n.op).__name__ == "Join"
        ]
        if join_nodes:
            assert len(join_nodes[0].inputs) == 3  # axis + two operands

    def test_join_of_scalar_stacks(self):
        a, b = at.dscalar("a"), at.dscalar("b")
        out = at.join(0, at.stack([a]), at.stack([b]))
        res = rewrite_and_check([a, b], out, [1.0, 2.0], include=CANON)
        # collapses into a single MakeVector
        assert count_label(res, "Join") == 0

    def test_split_single_piece(self):
        x = at.dvector("x")
        out = at.split(x, at.as_tensor_variable(np.asarray([5])), 1, axis=0)
        res = rewrite_and_check([x], out, [v(5)], include=CANON)
        assert count_label(res, "Split") == 0

    def test_split_two_pieces_survives(self):
        x = at.dvector("x")
        outs = at.split(x, at.as_tensor_variable(np.asarray([2, 3])), 2,
                        axis=0)
        rewrite_and_check([x], list(outs), [v(5)], include=CANON)


# ---------------------------------------------------------------------------
# switch rules
# ---------------------------------------------------------------------------

class TestSwitchRules:
    def test_merge_same_cond_add(self):
        c = at.vector("c", dtype="bool")
        a, b, x, y = (at.dvector(n) for n in "abxy")
        out = at.switch(c, a, b) + at.switch(c, x, y)
        res = rewrite_and_check(
            [c, a, b, x, y], out,
            [np.array([True, False, True]), v(3), v(3), v(3), v(3)],
            include=CANON,
        )
        assert count_label(res, "Switch") == 1

    def test_merge_same_cond_mul_three(self):
        c = at.vector("c", dtype="bool")
        a, b, x, y, p, q = (at.dvector(n) for n in "abxypq")
        out = (at.switch(c, a, b) * at.switch(c, x, y)
               * at.switch(c, p, q))
        res = rewrite_and_check(
            [c, a, b, x, y, p, q], out,
            [np.array([True, False, True])] + [v(3)] * 6,
            include=CANON,
        )
        assert count_label(res, "Switch") == 1

    def test_different_conds_do_not_merge(self):
        c1 = at.vector("c1", dtype="bool")
        c2 = at.vector("c2", dtype="bool")
        a, b, x, y = (at.dvector(n) for n in "abxy")
        out = at.switch(c1, a, b) + at.switch(c2, x, y)
        res = rewrite_and_check(
            [c1, c2, a, b, x, y], out,
            [np.array([True, False]), np.array([False, True]),
             v(2), v(2), v(2), v(2)],
            include=CANON,
        )
        assert count_label(res, "Switch") == 2

    def test_multiclient_switch_not_merged(self):
        c = at.vector("c", dtype="bool")
        a, b, x, y = (at.dvector(n) for n in "abxy")
        s1 = at.switch(c, a, b)
        out = s1 + at.switch(c, x, y) + s1.sum()
        rewrite_and_check(
            [c, a, b, x, y], out,
            [np.array([True, False]), v(2), v(2), v(2), v(2)],
            include=CANON,
        )

    @pytest.mark.parametrize("const,pick", [(1, "then"), (0, "else")])
    def test_constant_cond_folds(self, const, pick):
        a, b = at.dvector("a"), at.dvector("b")
        out = at.switch(np.bool_(const), a, b)
        res = rewrite_only(out, include=SPEC)
        assert res is (a if pick == "then" else b)


# ---------------------------------------------------------------------------
# dimshuffle rules
# ---------------------------------------------------------------------------

class TestDimShuffleRules:
    def test_identity_dimshuffle_vanishes(self):
        x = at.dmatrix("x")
        out = x.dimshuffle(0, 1)
        res = rewrite_only(out, include=CANON)
        assert res is x

    @pytest.mark.parametrize("p1,p2", [
        ((1, 0), (1, 0)),       # transpose twice = identity
        ((1, 0), (0, 1)),
        (("x", 0, 1), (1, 2)),  # expand then drop
    ])
    def test_dimshuffle_chain_collapses(self, p1, p2):
        x = at.dmatrix("x")
        out = x.dimshuffle(*p1).dimshuffle(*p2)
        res = rewrite_and_check([x], out, [v(3, 4)], include=CANON)
        assert count_label(res, "DimShuffle") <= 1

    def test_double_transpose_is_identity(self):
        x = at.dmatrix("x")
        res = rewrite_only(x.T.T, include=CANON)
        assert res is x

    def test_dimshuffle_stays_outside_elemwise(self):
        # DESIGN DIVERGENCE pinned: the reference lifts DimShuffle
        # through Elemwise (exp(x).T → exp(x.T)); here the transpose
        # stays outermost — whole-graph XLA fuses the transpose into
        # the elemwise anyway, so the lift buys nothing on TPU
        x = at.dmatrix("x")
        out = at.exp(x).T
        res = rewrite_and_check([x], out, [v(3, 4)], include=CANON)
        assert type(res.owner.op).__name__ == "DimShuffle"


# ---------------------------------------------------------------------------
# reshape rules
# ---------------------------------------------------------------------------

class TestReshapeRules:
    def test_same_static_shape_reshape_vanishes(self):
        x = at.tensor("x", dtype="float64", shape=(3, 4))
        out = at.reshape(x, (3, 4))
        res = rewrite_only(out, include=CANON)
        assert count_label(res, "Reshape") == 0

    @pytest.mark.parametrize("tgt", [(12,), (4, 3), (2, 6), (2, 2, 3)])
    def test_real_reshape_survives_value(self, tgt):
        x = at.tensor("x", dtype="float64", shape=(3, 4))
        rewrite_and_check([x], at.reshape(x, tgt), [v(3, 4)], include=CANON)

    def test_reshape_of_reshape_collapses(self):
        x = at.tensor("x", dtype="float64", shape=(3, 4))
        out = at.reshape(at.reshape(x, (12,)), (2, 6))
        res = rewrite_and_check([x], out, [v(3, 4)], include=CANON)
        assert count_label(res, "Reshape") <= 1


# ---------------------------------------------------------------------------
# assert rules
# ---------------------------------------------------------------------------

class TestAssertRules:
    def test_true_constant_assert_vanishes(self):
        x = at.dvector("x")
        from aesara_tpu.raise_op import assert_op

        out = assert_op(x, at.as_tensor_variable(np.bool_(True)))
        res = rewrite_only(out, include=CANON)
        assert count_label(res, "Assert") == 0

    def test_data_dependent_assert_survives(self):
        x = at.dvector("x")
        from aesara_tpu.raise_op import assert_op

        out = assert_op(x, (x > 0).all())
        res = rewrite_only(out, include=CANON)
        assert count_label(res, "Assert") == 1

    def test_remove_all_assert_tag(self):
        x = at.dvector("x")
        from aesara_tpu.raise_op import assert_op

        out = assert_op(x, (x > 0).all()) * 2.0
        res = rewrite_only(out, include=CANON + ("local_remove_all_assert",))
        assert count_label(res, "Assert") == 0
