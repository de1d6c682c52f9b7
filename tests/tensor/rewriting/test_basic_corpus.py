"""Basic/structural rewrite behavior-spec corpus.

Re-expresses the reference's ``tests/tensor/rewriting/test_basic.py``
(1,892 LoC) methodology against this pack: >=5 operand patterns per rule
with topology + py-oracle value assertions and unsound-case negatives.
Rules: ``aesara_tpu/tensor/rewriting/basic.py`` (reference
``/root/reference/aesara/tensor/rewriting/basic.py``).
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.ir import Constant
from tests.rewrite_corpus import op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(20260819)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")


def vec(n=7):
    return rng.normal(size=(n,)).astype("float32")


def mat(shape=(3, 4)):
    return rng.normal(size=shape).astype("float32")


# ---------------------------------------------------------------------------
# dimshuffle
# ---------------------------------------------------------------------------


class TestDimShuffle:
    @pytest.mark.parametrize(
        "mk,order",
        [
            (at.vector, (0,)),
            (at.matrix, (0, 1)),
            (at.tensor3, (0, 1, 2)),
            (at.row, (0, 1)),
            (at.col, (0, 1)),
        ],
        ids=["vec", "mat", "t3", "row", "col"],
    )
    def test_identity_dimshuffle_removed(self, mk, order):
        x = mk("x")
        out = x.dimshuffle(*order)
        shapes = {at.vector: (7,), at.matrix: (3, 4), at.tensor3: (2, 3, 4),
                  at.row: (1, 5), at.col: (6, 1)}
        res = rewrite_and_check(
            [x], out, [rng.normal(size=shapes[mk]).astype("float32")],
            include=CANON,
        )
        assert "DimShuffle" not in op_labels(res)

    def test_double_transpose_removed(self):
        x = at.matrix("x")
        res = rewrite_and_check([x], x.T.T, [mat()], include=CANON)
        assert "DimShuffle" not in op_labels(res)

    def test_chain_merges_to_one(self):
        x = at.tensor3("x")
        out = x.dimshuffle(2, 0, 1).dimshuffle(1, 2, 0)
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(2, 3, 4)).astype("float32")],
            include=CANON,
        )
        assert op_labels(res).count("DimShuffle") <= 1

    def test_expand_then_permute_merges(self):
        x = at.vector("x")
        out = x.dimshuffle("x", 0).dimshuffle(1, 0)
        res = rewrite_and_check([x], out, [vec()], include=CANON)
        assert op_labels(res).count("DimShuffle") <= 1

    def test_single_transpose_stays(self):
        x = at.matrix("x")
        res = rewrite_only(x.T, include=CANON)
        assert "DimShuffle" in op_labels(res)


# ---------------------------------------------------------------------------
# cast chains
# ---------------------------------------------------------------------------


class TestCast:
    @pytest.mark.parametrize(
        "dtype", ["float32", "float64", "int32", "int64", "int8"]
    )
    def test_same_dtype_cast_removed(self, dtype):
        x = at.vector("x", dtype=dtype)
        xv = (
            rng.normal(size=(5,)).astype(dtype)
            if dtype.startswith("float")
            else rng.integers(0, 5, size=(5,)).astype(dtype)
        )
        res = rewrite_and_check([x], at.cast(x, dtype), [xv], include=CANON)
        assert "Cast" not in op_labels(res)

    def test_widening_chain_collapses(self):
        # f32 → f64 → f64 chain collapses (inner widening is lossless)
        x = at.vector("x", dtype="float32")
        out = at.cast(at.cast(x, "float64"), "float64")
        res = rewrite_and_check([x], out, [vec(5)], include=CANON)
        assert op_labels(res).count("Cast") <= 1

    def test_int_widening_chain(self):
        x = at.vector("x", dtype="int16")
        out = at.cast(at.cast(x, "int32"), "int64")
        res = rewrite_and_check(
            [x], out, [rng.integers(-5, 5, size=(5,)).astype("int16")],
            include=CANON,
        )
        assert op_labels(res).count("Cast") == 1

    def test_lossy_inner_cast_stays(self):
        # f32 → int32 → f32 truncates: collapsing would change values
        x = at.vector("x", dtype="float32")
        out = at.cast(at.cast(x, "int32"), "float32")
        res = rewrite_and_check(
            [x], out, [np.array([1.7, -2.3, 0.5], "float32")], include=CANON
        )
        assert op_labels(res).count("Cast") == 2

    def test_f64_to_f32_to_f64_stays(self):
        x = at.vector("x", dtype="float64")
        out = at.cast(at.cast(x, "float32"), "float64")
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(4,)).astype("float64")], include=CANON
        )
        assert op_labels(res).count("Cast") == 2


# ---------------------------------------------------------------------------
# fill family
# ---------------------------------------------------------------------------


class TestFill:
    def test_same_shape_fill_removed(self):
        x, y = at.matrix("x"), at.matrix("y")
        out = at.fill(x, y)
        res = rewrite_only(out, include=CANON)
        # fill is only removable with a shape PROOF; same-typed Nones is
        # not one, so here it must either survive or become an alloc
        x2 = at.specify_shape(at.matrix("x2"), (3, 4))
        y2 = at.specify_shape(at.matrix("y2"), (3, 4))
        res2 = rewrite_only(at.fill(x2, y2), include=CANON)
        assert "Second" not in op_labels(res2)

    def test_fill_sink_enables_algebra(self):
        # fill wrappers must not block log(exp(x)) cancellation
        x, t = at.vector("x"), at.vector("t")
        out = at.log(at.fill(t, at.exp(x)))
        res = rewrite_and_check(
            [x, t], out, [vec(), vec()], include=CANON, rtol=1e-4
        )
        lbls = op_labels(res)
        assert "Exp" not in lbls and "Log" not in lbls

    def test_fill_to_alloc_at_specialize(self):
        t = at.matrix("t")
        s = at.scalar("s")
        out = at.fill(t, s)
        res = rewrite_and_check(
            [t, s], out, [mat(), np.float32(2.5)], include=SPEC
        )
        lbls = op_labels(res)
        assert "Second" not in lbls
        assert "Alloc" in lbls

    def test_fill_value_broadcasts_template_stays(self):
        # value has MORE structure than template row: can't alloc from
        # the template dims alone when v broadcasts t upward
        t = at.row("t")
        v = at.matrix("v")
        out = at.fill(t, v)
        rewrite_and_check(
            [t, v],
            out,
            [rng.normal(size=(1, 4)).astype("float32"), mat()],
            include=SPEC,
        )

    def test_zeros_like_times_x(self):
        x = at.vector("x")
        out = at.zeros_like(x) * x
        res = rewrite_and_check([x], out, [vec()], include=CANON)
        assert "Mul" not in op_labels(res)


# ---------------------------------------------------------------------------
# alloc family
# ---------------------------------------------------------------------------


class TestAlloc:
    def test_useless_alloc_static_shape(self):
        x = at.specify_shape(at.matrix("x"), (3, 4))
        out = at.alloc(x, 3, 4)
        res = rewrite_and_check([x.owner.inputs[0]], out, [mat()], include=CANON)
        assert "Alloc" not in op_labels(res)

    def test_alloc_broadcast_stays(self):
        x = at.vector("x")
        out = at.alloc(x, 5, 7)
        res = rewrite_only(out, include=CANON)
        assert "Alloc" in op_labels(res)

    def test_merge_alloc_same_dims(self):
        s = at.scalar("s")
        out = at.alloc(at.alloc(s, 3, 4), 3, 4)
        res = rewrite_and_check([s], out, [np.float32(1.0)], include=CANON)
        assert op_labels(res).count("Alloc") == 1

    def test_merge_alloc_inner_one(self):
        s = at.scalar("s")
        out = at.alloc(at.alloc(s, 1, 4), 3, 4)
        res = rewrite_and_check([s], out, [np.float32(2.0)], include=CANON)
        assert op_labels(res).count("Alloc") == 1

    def test_merge_alloc_mismatched_dims_stay(self):
        s = at.scalar("s")
        n = at.iscalar("n")
        out = at.alloc(at.alloc(s, n, 4), 3, 4)
        res = rewrite_only(out, include=CANON)
        # runtime n vs 3: merging would drop the broadcast-compat check
        assert op_labels(res).count("Alloc") == 2

    @pytest.mark.parametrize(
        "f", [at.exp, at.neg, at.sqr, at.tanh, at.log],
        ids=lambda f: f.__name__,
    )
    def test_alloc_unary_lifts(self, f):
        s = at.scalar("s")
        out = f(at.alloc(s, 4, 5))
        res = rewrite_and_check(
            [s], out, [np.float32(1.3)], include=SPEC, rtol=1e-4
        )
        # unary applied to the scalar, THEN alloc
        node = res.owner
        assert node is not None and type(node.op).__name__ == "Alloc"

    def test_elemwise_alloc_dropped_with_anchor(self):
        x = at.specify_shape(at.matrix("x"), (4, 5))
        s = at.scalar("s")
        out = x + at.alloc(s, 4, 5)
        res = rewrite_and_check(
            [x.owner.inputs[0], s],
            out,
            [mat((4, 5)), np.float32(2.0)],
            include=SPEC,
        )
        assert "Alloc" not in op_labels(res)

    def test_elemwise_alloc_no_anchor_stays(self):
        s, t = at.scalar("s"), at.scalar("t")
        out = at.alloc(s, 4, 5) + at.alloc(t, 4, 5)
        res = rewrite_only(out, include=SPEC)
        assert "Alloc" in op_labels(res)


# ---------------------------------------------------------------------------
# join / split
# ---------------------------------------------------------------------------


class TestJoinSplit:
    def test_join_single_operand(self):
        x = at.matrix("x")
        out = at.join(0, x)
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Join" not in op_labels(res)

    @pytest.mark.parametrize("axis", [0, 1])
    def test_join_with_empty_dropped(self, axis):
        x = at.matrix("x")
        empty_shape = (0, 4) if axis == 0 else (3, 0)
        e = at.constant(np.zeros(empty_shape, dtype="float32"))
        out = at.join(axis, x, e)
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Join" not in op_labels(res)

    def test_join_all_empty_survives(self):
        e1 = at.constant(np.zeros((0, 4), dtype="float32"))
        e2 = at.constant(np.zeros((0, 4), dtype="float32"))
        out = at.join(0, e1, e2)
        res = rewrite_only(out, include=CANON)
        # canonicalization must not crash; result is an empty (0,4)
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        f = function([], res, mode=py_mode)
        assert np.asarray(f()).shape == (0, 4)

    def test_join_three_with_middle_empty(self):
        x, y = at.matrix("x"), at.matrix("y")
        e = at.constant(np.zeros((0, 4), dtype="float32"))
        out = at.join(0, x, e, y)
        res = rewrite_and_check([x, y], out, [mat(), mat()], include=CANON)
        assert op_labels(res).count("Join") == 1
        assert len(res.owner.inputs) == 3  # axis + 2 survivors

    def test_join_make_vectors_merge(self):
        a, b, c, d = (at.scalar(n) for n in "abcd")
        from aesara_tpu.tensor.basic import MakeVector

        mv = MakeVector("float32")
        out = at.join(0, mv(a, b), mv(c, d))
        vals = [np.float32(i) for i in range(4)]
        res = rewrite_and_check([a, b, c, d], out, vals, include=CANON)
        assert "Join" not in op_labels(res)
        assert op_labels(res).count("MakeVector") == 1

    def test_split_single_piece(self):
        x = at.vector("x")
        from aesara_tpu.tensor.basic import Split

        pieces = Split(1)(x, np.int64(0), at.as_tensor_variable([7]))
        out = pieces if isinstance(pieces, list) else [pieces]
        # useless-band rules carry the fast_run/fast_compile tags
        res = rewrite_and_check([x], out[0], [vec()], include=("fast_compile",))
        assert "Split" not in op_labels(res)

    def test_split_two_pieces_stays(self):
        x = at.vector("x")
        from aesara_tpu.tensor.basic import Split

        outs = Split(2)(x, np.int64(0), at.as_tensor_variable([3, 4]))
        res = rewrite_only(list(outs), include=CANON)
        assert "Split" in op_labels(res)


# ---------------------------------------------------------------------------
# switch merging
# ---------------------------------------------------------------------------


class TestMergeSwitch:
    @pytest.mark.parametrize(
        "op", [lambda a, b: a + b, lambda a, b: a * b, lambda a, b: a - b],
        ids=["add", "mul", "sub"],
    )
    def test_same_cond_switches_merge(self, op):
        c = at.bvector("c")
        a, b, x, y = (at.vector(n) for n in "abxy")
        out = op(at.switch(c, a, b), at.switch(c, x, y))
        cv = rng.integers(0, 2, size=(7,)).astype("int8")
        res = rewrite_and_check(
            [c, a, b, x, y],
            out,
            [cv, vec(), vec(), vec(), vec()],
            include=CANON,
            rtol=1e-4,
        )
        assert op_labels(res).count("Switch") == 1

    def test_different_conds_stay(self):
        c1, c2 = at.bvector("c1"), at.bvector("c2")
        a, b = at.vector("a"), at.vector("b")
        out = at.switch(c1, a, b) + at.switch(c2, a, b)
        res = rewrite_only(out, include=CANON)
        assert op_labels(res).count("Switch") == 2

    def test_multi_use_switch_not_merged(self):
        # the switch result is used elsewhere: merging would duplicate it
        c = at.bvector("c")
        a, b, x, y = (at.vector(n) for n in "abxy")
        s1 = at.switch(c, a, b)
        out = s1 + at.switch(c, x, y) + at.exp(s1)
        cv = rng.integers(0, 2, size=(7,)).astype("int8")
        rewrite_and_check(
            [c, a, b, x, y],
            out,
            [cv, vec(), vec(), vec(), vec()],
            include=CANON,
            rtol=1e-4,
        )


# ---------------------------------------------------------------------------
# scalar/tensor roundtrips, reshape, specify_shape
# ---------------------------------------------------------------------------


class TestRoundtrips:
    def test_tensor_scalar_tensor(self):
        x = at.scalar("x")
        out = at.tensor_from_scalar(at.scalar_from_tensor(x))
        res = rewrite_and_check([x], out, [np.float32(3.0)], include=CANON)
        assert "TensorFromScalar" not in op_labels(res)

    def test_useless_reshape_same_shape(self):
        x = at.matrix("x")
        out = x.reshape(x.shape)
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Reshape" not in op_labels(res)

    def test_useless_reshape_static_shape(self):
        x = at.specify_shape(at.matrix("x"), (3, 4))
        out = x.reshape((3, 4))
        res = rewrite_and_check([x.owner.inputs[0]], out, [mat()], include=CANON)
        assert "Reshape" not in op_labels(res)

    def test_reshape_reshape_collapses(self):
        x = at.matrix("x")
        out = x.reshape((12,)).reshape((4, 3))
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert op_labels(res).count("Reshape") == 1

    def test_real_reshape_stays(self):
        x = at.matrix("x")
        out = x.reshape((12,))
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Reshape" in op_labels(res)

    def test_useless_specify_shape(self):
        x = at.specify_shape(at.matrix("x"), (3, 4))
        out = at.specify_shape(x, (3, 4))
        res = rewrite_only(out, include=CANON)
        assert op_labels(res).count("SpecifyShape") <= 1

    def test_view_op_removed(self):
        from aesara_tpu.compile.ops import ViewOp

        x = at.vector("x")
        out = ViewOp()(x) + 1.0
        res = rewrite_and_check([x], out, [vec()], include=CANON)
        assert "ViewOp" not in op_labels(res)


# ---------------------------------------------------------------------------
# constant upcast into elemwise
# ---------------------------------------------------------------------------


class TestUpcastConstants:
    def test_python_float_constant_folds_into_f32(self):
        x = at.vector("x")  # float32
        out = x + 1.0  # python float → f64 constant in the raw graph
        res = rewrite_and_check([x], out, [vec()], include=CANON)
        assert res.type.dtype == "float32"
        assert "Cast" not in op_labels(res)

    def test_int_constant_into_float_graph(self):
        x = at.vector("x")
        out = x * 2
        res = rewrite_and_check([x], out, [vec()], include=CANON)
        assert "Cast" not in op_labels(res)

    def test_upcast_preserves_value(self):
        x = at.vector("x", dtype="float64")
        out = x + np.float32(0.5)
        rewrite_and_check(
            [x], out, [rng.normal(size=(5,)).astype("float64")], include=CANON
        )


# ---------------------------------------------------------------------------
# assert removal
# ---------------------------------------------------------------------------


class TestAssert:
    def test_constant_true_assert_removed(self):
        from aesara_tpu.raise_op import Assert

        x = at.vector("x")
        out = Assert("always true")(x, at.constant(np.bool_(True)))
        res = rewrite_and_check([x], out, [vec()], include=CANON)
        assert "Assert" not in op_labels(res)

    def test_variable_assert_stays(self):
        from aesara_tpu.raise_op import Assert

        x = at.vector("x")
        c = at.scalar("c", dtype="bool")
        out = Assert("cond")(x, c)
        res = rewrite_only(out, include=CANON)
        assert "Assert" in op_labels(res)

    def test_mixed_conditions_partial_removal(self):
        from aesara_tpu.raise_op import Assert

        x = at.vector("x")
        c = at.scalar("c", dtype="bool")
        out = Assert("mixed")(x, at.constant(np.bool_(True)), c)
        res = rewrite_only(out, include=CANON)
        node_asserts = [
            v.owner
            for v in [res]
            if v.owner is not None and type(v.owner.op).__name__ == "Assert"
        ]
        assert node_asserts  # the variable condition must survive
        assert len(node_asserts[0].inputs) == 2  # x + one condition


# ---------------------------------------------------------------------------
# topk output pruning
# ---------------------------------------------------------------------------


class TestTopK:
    def test_unused_indices_pruned(self):
        from aesara_tpu.tensor.sort import TopKOp

        x = at.vector("x")
        vals, idxs = TopKOp(axis=-1)(x, at.constant(np.int64(3)))
        res = rewrite_only(vals, include=("fast_compile",))
        tk = [
            v.owner
            for v in [res]
            if v.owner is not None and type(v.owner.op).__name__ == "TopKOp"
        ]
        assert tk and not tk[0].op.return_indices

    def test_both_used_stays_dual(self):
        from aesara_tpu.tensor.sort import TopKOp

        x = at.vector("x")
        vals, idxs = TopKOp(axis=-1)(x, at.constant(np.int64(3)))
        res = rewrite_only([vals, idxs], include=("fast_compile",))
        tk = [
            v.owner for v in res if v.owner is not None
            and type(v.owner.op).__name__ == "TopKOp"
        ]
        assert tk and tk[0].op.return_indices and tk[0].op.return_values
