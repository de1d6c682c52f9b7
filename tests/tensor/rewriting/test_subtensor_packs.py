"""Expanded subtensor rewrite pack: topology + values-unchanged tests
(reference ``tests/tensor/rewriting/test_subtensor.py`` strategy)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.graph.ir import Constant, applys_between, equal_computations
from aesara_tpu.graph.rewriting.utils import rewrite_graph
from aesara_tpu.tensor.basic import Alloc
from aesara_tpu.tensor.elemwise import Elemwise
from aesara_tpu.tensor.math import Dot
from aesara_tpu.tensor.subtensor import (
    AdvancedIncSubtensor1,
    AdvancedSubtensor1,
    IncSubtensor,
    Subtensor,
)

rng = np.random.default_rng(31)


def ops_in(out, *roots):
    return [n.op for n in applys_between(list(roots), [out])]


def check_values(inputs, raw, new, vals):
    f_raw = function(inputs, raw, mode="PY", on_unused_input="ignore")
    f_new = function(inputs, new, mode="PY", on_unused_input="ignore")
    np.testing.assert_allclose(
        np.asarray(f_raw(*vals)), np.asarray(f_new(*vals))
    )


def test_trim_trailing_full_slices():
    x = at.matrix("x", dtype="float64")
    out = x[1:, :]
    res = rewrite_graph(out)
    subs = [op for op in ops_in(res, x) if isinstance(op, Subtensor)]
    assert len(subs) == 1 and len(subs[0].idx_list) == 1
    check_values([x], out, res, [rng.normal(size=(4, 3))])


def test_useless_subtensor_static_cover():
    x = at.tensor("x", dtype="float64", shape=(4, 3))
    res = rewrite_graph(x[0:4])
    assert equal_computations([res], [x])
    res = rewrite_graph(x[0:10])  # stop beyond the dim still covers
    assert equal_computations([res], [x])
    # NOT useless when it actually slices
    res = rewrite_graph(x[0:3])
    assert not equal_computations([res], [x])


def test_subtensor_lift_through_unary_elemwise():
    x = at.matrix("x", dtype="float64")
    out = at.exp(x)[1:3]
    res = rewrite_graph(out)
    # exp must now run on the SLICED value: subtensor feeds the elemwise
    exp_nodes = [
        n for n in applys_between([x], [res])
        if isinstance(n.op, Elemwise) and "exp" in str(n.op).lower()
    ]
    assert len(exp_nodes) == 1
    inner = exp_nodes[0].inputs[0].owner
    assert inner is not None and isinstance(inner.op, Subtensor)
    check_values([x], out, res, [rng.normal(size=(5, 3))])


def test_subtensor_of_expand_dims():
    x = at.vector("x", dtype="float64")
    out = x.dimshuffle("x", 0)[0]
    res = rewrite_graph(out)
    assert equal_computations([res], [x])


def test_subtensor_of_dot():
    a, b = at.matrix("a", dtype="float64"), at.matrix("b", dtype="float64")
    out = at.dot(a, b)[1]
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    # the dot must consume a sliced operand (vector-matrix product)
    dots = [n for n in applys_between([a, b], [res]) if isinstance(n.op, Dot)]
    assert len(dots) == 1
    assert dots[0].inputs[0].type.ndim == 1
    check_values([a, b], out, res,
                 [rng.normal(size=(4, 3)), rng.normal(size=(3, 5))])


def test_subtensor_make_vector_int_and_slice():
    a, b, c = at.scalar("a", dtype="float64"), at.scalar("b", dtype="float64"), at.scalar("c", dtype="float64")
    v = at.stack([a, b, c])
    res = rewrite_graph(v[1])
    assert equal_computations([res], [b]) or res is b
    out = v[0:2]
    res = rewrite_graph(out)
    check_values([a, b, c], out, res, [1.0, 2.0, 3.0])
    assert len([op for op in ops_in(res, a, b, c)
                if isinstance(op, Subtensor)]) == 0


def test_subtensor_of_set_subtensor_same_idx():
    x, y = at.matrix("x", dtype="float64"), at.vector("y", dtype="float64")
    out = at.set_subtensor(x[2], y)[2]
    res = rewrite_graph(out)
    assert equal_computations([res], [y]) or res is y


def test_inc_subtensor_of_zeros_becomes_set():
    x = at.matrix("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    out = at.inc_subtensor(at.zeros_like(x)[1], y)
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    incs = [n.op for n in applys_between([x, y], [res])
            if isinstance(n.op, IncSubtensor)]
    assert len(incs) == 1 and incs[0].set_instead_of_inc
    check_values([x, y], out, res,
                 [rng.normal(size=(3, 4)), rng.normal(size=4)])


def test_useless_inc_subtensor_zero_increment():
    x = at.matrix("x", dtype="float64")
    out = at.inc_subtensor(x[1], at.zeros_like(x[1]))
    res = rewrite_graph(out)
    assert equal_computations([res], [x])


def test_adv_sub1_of_adv_set_sub1():
    # constant unique in-bounds index over a static dim: fires
    import numpy as np

    x = at.tensor(dtype="float64", shape=(7, None), name="x")
    y = at.matrix("y", dtype="float64")
    idx = at.constant(np.asarray([2, 5, 0], dtype="int64"))
    setv = AdvancedIncSubtensor1(set_instead_of_inc=True)(x, y, idx)
    out = AdvancedSubtensor1()(setv, idx)
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    # the gather/set pair is gone; y may arrive wrapped in a
    # convert_variable SpecifyShape carrying the output's static dims
    base = res
    while base.owner is not None and type(base.owner.op).__name__ == "SpecifyShape":
        base = base.owner.inputs[0]
    assert base is y or equal_computations([base], [y])
    # symbolic index (possibly duplicated at runtime): must NOT fire
    idx2 = at.vector("idx", dtype="int64")
    setv2 = AdvancedIncSubtensor1(set_instead_of_inc=True)(x, y, idx2)
    out2 = AdvancedSubtensor1()(setv2, idx2)
    res2 = rewrite_graph(out2, include=["canonicalize", "specialize"])
    assert not (equal_computations([res2], [y]) or res2 is y)


def test_useless_adv_sub1_arange():
    x = at.tensor("x", dtype="float64", shape=(4, 3))
    out = AdvancedSubtensor1()(x, at.constant(np.arange(4)))
    res = rewrite_graph(out)
    assert equal_computations([res], [x])
    # non-identity gather untouched
    out2 = AdvancedSubtensor1()(x, at.constant(np.array([0, 0, 1, 2])))
    res2 = rewrite_graph(out2)
    assert not equal_computations([res2], [x])


def test_subtensor_of_alloc_slice():
    v = at.scalar("v", dtype="float64")
    out = at.alloc(v, 10, 7)[2:5]
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    allocs = [n for n in applys_between([v], [res])
              if isinstance(n.op, Alloc)]
    subs = [n for n in applys_between([v], [res])
            if isinstance(n.op, Subtensor)]
    assert len(allocs) == 1 and len(subs) == 0
    check_values([v], out, res, [np.float64(3.5)])


def test_subtensor_merge_still_works_with_pack():
    x = at.matrix("x", dtype="float64")
    out = x[1:8][2:4]
    res = rewrite_graph(out)
    subs = [n for n in applys_between([x], [res])
            if isinstance(n.op, Subtensor)]
    assert len(subs) == 1
    check_values([x], out, res, [rng.normal(size=(10, 3))])


def test_grad_graphs_still_correct():
    """IncSubtensor rewrites ride gradient graphs: check values."""
    x = at.matrix("x", dtype="float64")
    out = (at.exp(x)[1:3] ** 2).sum()
    g = atp.grad(out, x)
    f_fast = function([x], g, mode="FAST_RUN")
    f_py_raw = function([x], g, mode="PY")
    v = rng.normal(size=(5, 3))
    np.testing.assert_allclose(
        np.asarray(f_fast(v)), np.asarray(f_py_raw(v)), rtol=1e-5
    )


# ---------------------------------------------------------------------------
# round-2 additions: set→inc, join-of-slices, constant folds, static-1 index
# ---------------------------------------------------------------------------

class TestSetToInc:
    def test_topology_and_value(self):
        x = at.matrix("x", dtype="float64")
        v = at.matrix("v", dtype="float64")
        from aesara_tpu.tensor.subtensor import set_subtensor

        expr = set_subtensor(x[1:3], x[1:3] + v)
        f = function([x, v], expr, mode="FAST_RUN")
        incs = [n.op for n in f.fgraph.apply_nodes
                if isinstance(n.op, IncSubtensor)]
        assert incs and not incs[0].set_instead_of_inc  # became inc
        Xv = rng.normal(size=(5, 3))
        Vv = rng.normal(size=(2, 3))
        want = Xv.copy(); want[1:3] += Vv
        np.testing.assert_allclose(np.asarray(f(Xv, Vv)), want, rtol=1e-12)

    def test_no_fire_on_unrelated_add(self):
        x = at.matrix("x", dtype="float64")
        v = at.matrix("v", dtype="float64")
        from aesara_tpu.tensor.subtensor import set_subtensor

        expr = set_subtensor(x[1:3], x[0:2] + v)  # different slice: keep set
        f = function([x, v], expr, mode="FAST_RUN")
        Xv = rng.normal(size=(5, 3))
        Vv = rng.normal(size=(2, 3))
        want = Xv.copy(); want[1:3] = Xv[0:2] + Vv
        np.testing.assert_allclose(np.asarray(f(Xv, Vv)), want, rtol=1e-12)


class TestJoinSubtensors:
    def test_full_split_rejoins_to_base(self):
        x = at.matrix("x", dtype="float64")
        expr = at.concatenate([x[:2], x[2:5]], axis=0)
        from aesara_tpu.graph.rewriting.utils import rewrite_graph

        res = rewrite_graph(expr, include=["canonicalize"])
        # one subtensor of x (or x itself after useless-slice removal)
        from aesara_tpu.tensor.basic import Join as JoinOp

        assert not any(
            isinstance(n.op, JoinOp)
            for v in [res] if v.owner for n in [v.owner]
        )
        f = function([x], expr, mode="FAST_RUN")
        Xv = rng.normal(size=(5, 3))
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv, rtol=1e-12)

    def test_non_contiguous_stays(self):
        x = at.matrix("x", dtype="float64")
        expr = at.concatenate([x[:2], x[3:5]], axis=0)  # gap: keep join
        f = function([x], expr, mode="FAST_RUN")
        Xv = rng.normal(size=(5, 3))
        np.testing.assert_allclose(
            np.asarray(f(Xv)), np.concatenate([Xv[:2], Xv[3:5]]), rtol=1e-12
        )


class TestSetSubtensorOfConstants:
    def test_folds_to_constant(self):
        from aesara_tpu.graph.ir import Constant
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.tensor.subtensor import set_subtensor

        cx = at.constant(np.zeros((3, 3)))
        cy = at.constant(np.ones((3,)))
        expr = set_subtensor(cx[1], cy)
        res = rewrite_graph(expr, include=["canonicalize"])
        assert isinstance(res, Constant)
        want = np.zeros((3, 3)); want[1] = 1.0
        np.testing.assert_array_equal(np.asarray(res.data), want)


class TestRemoveBroadcastableIndex:
    def test_static_one_dim_index_becomes_dimshuffle(self):
        x = at.tensor("x", dtype="float64", shape=(1, 4))
        f = function([x], x[0] * 2, mode="FAST_RUN")
        assert not any(
            isinstance(n.op, Subtensor) for n in f.fgraph.apply_nodes
        )
        v = rng.normal(size=(1, 4))
        np.testing.assert_allclose(np.asarray(f(v)), v[0] * 2, rtol=1e-12)

    def test_unknown_dim_keeps_subtensor(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], x[0] * 2, mode="FAST_RUN")
        v = rng.normal(size=(3, 4))
        np.testing.assert_allclose(np.asarray(f(v)), v[0] * 2, rtol=1e-12)


# ---------------------------------------------------------------------------
# round-2 additions: advanced decomposition, alloc-increment removal,
# IncSubtensor serialization, SpecifyShape lift
# ---------------------------------------------------------------------------


class TestReplaceAdvancedSubtensor:
    def test_general_gather_becomes_adv1(self):
        from aesara_tpu.tensor.subtensor import ARRAY, AdvancedSubtensor

        x = at.matrix("x", dtype="float64")
        iv = at.lvector("i")
        out = AdvancedSubtensor((ARRAY,))(x, iv)
        res = rewrite_graph(out, include=["canonicalize"])
        assert isinstance(res.owner.op, AdvancedSubtensor1)
        Xv = rng.normal(size=(5, 3))
        Iv = np.array([3, 0, 3])
        check_values([x, iv], out, res, [Xv, Iv])

    def test_trailing_full_slices_accepted(self):
        from aesara_tpu.tensor.subtensor import ARRAY, AdvancedSubtensor

        x = at.tensor3("x", dtype="float64")
        iv = at.lvector("i")
        full = slice(None, None, None)
        out = AdvancedSubtensor((ARRAY, full, full))(x, iv)
        res = rewrite_graph(out, include=["canonicalize"])
        assert isinstance(res.owner.op, AdvancedSubtensor1)

    def test_matrix_index_stays_general(self):
        from aesara_tpu.tensor.subtensor import ARRAY, AdvancedSubtensor

        x = at.matrix("x", dtype="float64")
        im = at.lmatrix("i")
        out = AdvancedSubtensor((ARRAY,))(x, im)
        res = rewrite_graph(out, include=["canonicalize"])
        assert isinstance(res.owner.op, AdvancedSubtensor)


class TestAdvancedIncToAdv1:
    @pytest.mark.parametrize("set_instead_of_inc", [False, True])
    def test_decomposes(self, set_instead_of_inc):
        from aesara_tpu.tensor.subtensor import ARRAY, AdvancedIncSubtensor

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        iv = at.lvector("i")
        out = AdvancedIncSubtensor(
            (ARRAY,), set_instead_of_inc=set_instead_of_inc
        )(x, y, iv)
        res = rewrite_graph(out, include=["canonicalize"])
        assert isinstance(res.owner.op, AdvancedIncSubtensor1)
        assert res.owner.op.set_instead_of_inc == set_instead_of_inc
        Xv = rng.normal(size=(5, 3))
        Yv = rng.normal(size=(2, 3))
        Iv = np.array([1, 4])
        check_values([x, y, iv], out, res, [Xv, Yv, Iv])

    def test_ignore_duplicates_inc_stays(self):
        from aesara_tpu.tensor.subtensor import ARRAY, AdvancedIncSubtensor

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        iv = at.lvector("i")
        out = AdvancedIncSubtensor((ARRAY,), ignore_duplicates=True)(x, y, iv)
        res = rewrite_graph(out, include=["canonicalize"])
        from aesara_tpu.tensor.subtensor import AdvancedIncSubtensor as AIS

        assert isinstance(res.owner.op, AIS)


class TestUselessIncSubtensorAlloc:
    def test_basic_set_drops_alloc(self):
        from aesara_tpu.tensor.subtensor import set_subtensor

        x = at.tensor("x", dtype="float64", shape=(4, 3))
        v = at.tensor("v", dtype="float64", shape=(3,))
        out = set_subtensor(x[0:2], at.alloc(v, 2, 3))
        res = rewrite_graph(out)
        allocs = [op for op in ops_in(res, x, v) if isinstance(op, Alloc)]
        assert not allocs
        Xv = rng.normal(size=(4, 3))
        Vv = rng.normal(size=(3,))
        check_values([x, v], out, res, [Xv, Vv])

    def test_adv1_inc_drops_alloc(self):
        from aesara_tpu.tensor.subtensor import inc_subtensor

        x = at.tensor("x", dtype="float64", shape=(4, 3))
        v = at.tensor("v", dtype="float64", shape=(3,))
        iv = at.tensor("i", dtype="int64", shape=(2,))
        out = inc_subtensor(x[iv], at.alloc(v, 2, 3))
        res = rewrite_graph(out)
        allocs = [op for op in ops_in(res, x, v, iv) if isinstance(op, Alloc)]
        assert not allocs
        Xv = rng.normal(size=(4, 3))
        Vv = rng.normal(size=(3,))
        Iv = np.array([1, 1])  # duplicate: np.add.at semantics must hold
        check_values([x, v, iv], out, res, [Xv, Vv, Iv])

    def test_mismatched_alloc_stays_and_still_errors(self):
        # the guard must NOT swallow the runtime shape error the original
        # graph raises (review finding: silent-broadcast hazard)
        from aesara_tpu.tensor.subtensor import set_subtensor

        x = at.tensor("x", dtype="float64", shape=(4, 3))
        v = at.tensor("v", dtype="float64", shape=(3,))
        out = set_subtensor(x[0:2], at.alloc(v, 3, 3))  # (3,3) into (2,3)
        res = rewrite_graph(out)
        allocs = [op for op in ops_in(res, x, v) if isinstance(op, Alloc)]
        assert allocs, "mismatched alloc must survive"
        f = function([x, v], res, mode="PY")
        with pytest.raises(Exception):
            f(rng.normal(size=(4, 3)), rng.normal(size=(3,)))

    def test_unknown_region_shape_stays(self):
        from aesara_tpu.tensor.subtensor import set_subtensor

        x = at.matrix("x", dtype="float64")  # unknown dims: region unprovable -> keep
        v = at.vector("v", dtype="float64")
        out = set_subtensor(x[0:2], at.alloc(v, 2, 3))
        res = rewrite_graph(out)
        allocs = [op for op in ops_in(res, x, v) if isinstance(op, Alloc)]
        assert allocs


class TestIncSubtensorSerialize:
    def test_broadcasting_inc_not_moved(self):
        # review finding: a (1,3) inc result broadcast into a (4,3) add
        # must NOT chain (it would scatter into one row instead of all)
        from aesara_tpu.tensor.basic import zeros
        from aesara_tpu.tensor.subtensor import inc_subtensor

        a = at.tensor("a", dtype="float64", shape=(4, 3))
        c = at.tensor("c", dtype="float64", shape=(3,))
        out = a + inc_subtensor(zeros((1, 3), dtype="float64")[0], c)
        res = rewrite_graph(out, include=["canonicalize"])
        Av = rng.normal(size=(4, 3))
        Cv = rng.normal(size=(3,))
        check_values([a, c], out, res, [Av, Cv])
        f = function([a, c], res, mode="PY")
        np.testing.assert_allclose(np.asarray(f(Av, Cv)), Av + Cv)

    def test_grad_accumulation_chains(self):
        x = at.matrix("x", dtype="float64")
        cost = (at.exp(x[0]).sum() + at.tanh(x[1]).sum() + (x[2] ** 2).sum())
        g = atp.grad(cost, x)
        res = rewrite_graph(g, include=["canonicalize"])
        # the three zeros-based IncSubtensors must chain, not add
        from aesara_tpu.scalar.ops import Add as ScalarAdd

        adds = [
            n
            for n in applys_between([x], [res])
            if isinstance(n.op, Elemwise)
            and isinstance(n.op.scalar_op, ScalarAdd)
            and any(
                i.owner is not None and isinstance(i.owner.op, IncSubtensor)
                for i in n.inputs
            )
        ]
        assert not adds
        incs = [
            n for n in applys_between([x], [res])
            if isinstance(n.op, IncSubtensor)
        ]
        assert len(incs) >= 3
        f_raw = function([x], g, mode="PY")
        f_opt = function([x], g, mode="FAST_RUN")
        Xv = rng.normal(size=(4, 3))
        np.testing.assert_allclose(
            np.asarray(f_raw(Xv)), np.asarray(f_opt(Xv)), rtol=1e-6
        )

    def test_set_subtensor_not_moved(self):
        from aesara_tpu.tensor.subtensor import set_subtensor

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        a = set_subtensor(x[0], at.ones((3,)))
        out = a + y
        res = rewrite_graph(out, include=["canonicalize"])
        Xv = rng.normal(size=(2, 3))
        Yv = rng.normal(size=(2, 3))
        check_values([x, y], out, res, [Xv, Yv])


class TestSubtensorSpecifyShapeLift:
    def test_int_index_lifts(self):
        from aesara_tpu.tensor.shape import SpecifyShape, specify_shape

        x = at.matrix("x", dtype="float64")
        out = specify_shape(x, (4, 3))[0]
        res = rewrite_graph(out, include=["canonicalize"])
        # the subtensor must now act on x directly (under the spec)
        sub_nodes = [
            n for n in applys_between([x], [res])
            if isinstance(n.op, Subtensor)
        ]
        assert len(sub_nodes) == 1
        assert sub_nodes[0].inputs[0] is x
        check_values([x], out, res, [rng.normal(size=(4, 3))])
        # surviving dim keeps its static info
        assert res.type.shape == (3,)

    def test_symbolic_index_stays(self):
        from aesara_tpu.tensor.shape import SpecifyShape, specify_shape

        x = at.matrix("x", dtype="float64")
        i = at.lscalar("i")
        out = specify_shape(x, (4, 3))[i]
        res = rewrite_graph(out, include=["canonicalize"])
        specs = [
            n for n in applys_between([x, i], [res])
            if isinstance(n.op, SpecifyShape)
        ]
        assert specs  # not lifted
