"""ShapeFeature: whole-graph symbolic shape inference.

Mirrors the reference's InferShapeTester strategy
(``tests/unittest_tools.py:178``): attach the feature, compile the
cached symbolic shapes, and assert they equal the actual output shapes
— swept over a broad op matrix.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.builders import OpFromGraph, infer_shape
from aesara_tpu.compile.function import function
from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Constant
from aesara_tpu.tensor.rewriting.shape import ShapeFeature

rng = np.random.default_rng(7)


def assert_inferred_matches(inputs, outputs, input_vals):
    """Compile the feature's cached shape graphs and compare against the
    actual output shapes (the InferShapeTester contract)."""
    fg = FunctionGraph(list(inputs), list(outputs))
    fg.attach_feature(ShapeFeature())
    sf = fg.shape_feature
    shape_vars = []
    for o in fg.outputs:
        s = sf.shape_of[o]
        assert s is not None
        shape_vars.extend(s)
    f_shapes = function(fg.inputs, shape_vars, mode="PY",
                        on_unused_input="ignore")
    f_vals = function(fg.inputs, fg.outputs, mode="PY",
                      on_unused_input="ignore")
    got = [int(np.asarray(v)) for v in f_shapes(*input_vals)]
    actual = []
    vals = f_vals(*input_vals)
    if not isinstance(vals, (list, tuple)):
        vals = [vals]
    for v in vals:
        actual.extend(np.shape(np.asarray(v)))
    assert got == list(actual), (got, actual)


M = at.matrix("m", dtype="float64")
V = at.vector("v", dtype="float64")
T3 = at.tensor3("t", dtype="float64")
mv = rng.normal(size=(3, 5))
vv = rng.normal(size=5)
t3v = rng.normal(size=(2, 3, 4))

CASES = [
    # (inputs, output-builder, values)
    ([M], lambda m: at.exp(m) + 1.0, [mv]),
    ([M], lambda m: m.T, [mv]),
    ([M], lambda m: m.sum(axis=1), [mv]),
    ([M, V], lambda m, v: at.dot(m, v), [mv, vv]),
    ([M], lambda m: at.reshape(m, (5, 3)), [mv]),
    ([M], lambda m: m[1:, ::2], [mv]),
    ([M], lambda m: at.concatenate([m, m], axis=0), [mv]),
    ([M], lambda m: at.stack([m, m]), [mv]),
    ([V], lambda v: at.outer(v, v), [vv]),
    ([M], lambda m: at.argmax(m, axis=0), [mv]),
    ([M], lambda m: at.sort(m, axis=1), [mv]),
    ([M], lambda m: at.cumsum(m, axis=0), [mv]),
    ([V], lambda v: at.tile(v, 3), [vv]),
    ([M], lambda m: at.repeat(m, 2, axis=0), [mv]),
    ([M], lambda m: at.diag(m), [mv]),
    ([V], lambda v: at.diag(v), [vv]),
    ([T3], lambda t: t.dimshuffle(2, 0, 1), [t3v]),
    ([T3], lambda t: at.flatten(t), [t3v]),
    ([M], lambda m: at.nnet.softmax(m), [mv]),
    ([M], lambda m: at.switch(m > 0, m, 0.0), [mv]),
    ([M], lambda m: at.alloc(0.0, m.shape[0], 7), [mv]),
    ([V], lambda v: at.arange(v.shape[0]), [vv]),
    ([M], lambda m: at.maximum(m, m[0]), [mv]),
    ([M, V], lambda m, v: m + v, [mv, vv]),
    ([M], lambda m: at.inc_subtensor(m[0], 1.0), [mv]),
]


@pytest.mark.parametrize("case_i", range(len(CASES)))
def test_infer_shape_contract(case_i):
    inputs, build, vals = CASES[case_i]
    out = build(*inputs)
    outs = out if isinstance(out, (list, tuple)) else [out]
    assert_inferred_matches(inputs, outs, vals)


def test_static_dims_fold_to_constants():
    x = at.tensor("x", dtype="float32", shape=(7, 9))
    shapes = infer_shape([at.exp(x).T], [x], [None])
    assert all(isinstance(v, Constant) for v in shapes[0])
    assert tuple(int(v.data) for v in shapes[0]) == (9, 7)


def test_builders_infer_shape_symbolic_seed():
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    m = at.scalar("m", dtype="int64")
    k = at.scalar("k", dtype="int64")
    n = at.scalar("n", dtype="int64")
    shapes = infer_shape([at.dot(x, y) + 1.0], [x, y], [(m, k), (k, n)])
    f = function([m, k, n], list(shapes[0]), on_unused_input="ignore",
                 mode="PY")
    assert tuple(int(np.asarray(v)) for v in f(3, 4, 5)) == (3, 5)


def test_opfromgraph_infer_shape_through_feature():
    a = at.matrix("a", dtype="float64")
    ofg = OpFromGraph([a], [at.tanh(a) + a.sum()])
    outer = at.matrix("outer", dtype="float64")
    o = ofg(outer)
    fg = FunctionGraph([outer], [o])
    fg.attach_feature(ShapeFeature())
    s = fg.shape_feature.shape_of[fg.outputs[0]]
    f = function(fg.inputs, list(s), mode="PY")
    assert tuple(
        int(np.asarray(v)) for v in f(np.zeros((2, 5)))
    ) == (2, 5)


def test_same_shape_through_elemwise_chain():
    x = at.matrix("x", dtype="float64")
    y = at.exp(x) * 2 + at.tanh(x)
    fg = FunctionGraph([x], [y])
    fg.attach_feature(ShapeFeature())
    assert fg.shape_feature.same_shape(fg.inputs[0], fg.outputs[0])


def test_same_shape_rejects_different():
    x = at.matrix("x", dtype="float64")
    y = x.T  # (n, m) vs (m, n): not provably same
    fg = FunctionGraph([x], [y])
    fg.attach_feature(ShapeFeature())
    assert not fg.shape_feature.same_shape(fg.inputs[0], fg.outputs[0])


def test_feature_updates_on_replace():
    from aesara_tpu.graph.features import ReplaceValidate

    x = at.matrix("x", dtype="float64")
    mid = at.exp(x)
    y = mid * 1.0
    fg = FunctionGraph([x], [y])
    fg.attach_feature(ReplaceValidate())
    fg.attach_feature(ShapeFeature())
    # replace exp(x) by tanh(x): the new node must get a cache entry
    new_mid = at.tanh(fg.inputs[0])
    old = fg.outputs[0].owner.inputs[0]
    fg.replace_validate(old, new_mid)
    assert new_mid in fg.shape_feature.shape_of
    assert fg.shape_feature.same_shape(fg.inputs[0], new_mid)


def test_shape_opt_attached_during_compilation():
    """ShapeOpt/UnShapeOpt ride the optdb: during rewriting the feature
    exists; the final fgraph has it detached."""
    x = at.matrix("x", dtype="float64")
    f = function([x], at.exp(x) + x.shape[0], mode="FAST_RUN")
    res = f(np.ones((2, 3)))
    np.testing.assert_allclose(np.asarray(res), np.exp(np.ones((2, 3))) + 2)
