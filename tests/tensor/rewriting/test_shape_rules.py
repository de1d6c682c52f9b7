"""Shape-pack rewrites added in round 2 (reference
``tensor/rewriting/shape.py:759-1205``): reshape→dimshuffle folding,
dimshuffle-in-reshape removal, reshape lifting, Shape-of-SpecifyShape,
shape-slice constants, Shape_i grounding, unbroadcast lifting.

Each case asserts BOTH the rewritten topology and value equality with
the unrewritten PY evaluation.
"""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.shape import Reshape, Shape, Shape_i, SpecifyShape, Unbroadcast, specify_shape, unbroadcast
from aesara_tpu.graph.ir import Constant

rng = np.random.default_rng(3)


def _ops(f, kind):
    return [n for n in f.maker.fgraph.toposort() if isinstance(n.op, kind)]


def test_reshape_to_dimshuffle_static():
    x = at.tensor3("x", dtype="float32", shape=(2, 1, 3))
    r = x.reshape((2, 3, 1))
    f = atp.function([x], r, mode="PY")
    assert not _ops(f, Reshape)
    assert _ops(f, DimShuffle)
    xv = rng.standard_normal((2, 1, 3)).astype("float32")
    assert np.allclose(f(xv), xv.reshape(2, 3, 1))


def test_reshape_to_dimshuffle_symbolic_shape_i():
    x = at.matrix("x", dtype="float64")
    # (n, m) -> (n, 1, m): inserts a broadcast dim, dims ride Shape_i(x)
    r = x.reshape((x.shape[0], 1, x.shape[1]))
    f = atp.function([x], r, mode="PY")
    assert not _ops(f, Reshape)
    xv = rng.standard_normal((4, 5)).astype("float32")
    assert f(xv).shape == (4, 1, 5)


def test_reshape_to_dimshuffle_declines_real_reshape():
    x = at.matrix("x", dtype="float32", shape=(2, 3))
    r = x.reshape((3, 2))
    f = atp.function([x], r, mode="PY")
    assert _ops(f, Reshape)  # a genuine transpose-free reshape stays
    xv = rng.standard_normal((2, 3)).astype("float32")
    assert np.allclose(f(xv), xv.reshape(3, 2))


def test_useless_dimshuffle_in_reshape():
    v = at.vector("v", dtype="float64")
    r = v.dimshuffle("x", 0).reshape((v.shape[0],))
    f = atp.function([v], r, mode="PY")
    # dimshuffle dropped; then reshape-to-same-shape dropped -> identity
    assert not _ops(f, Reshape) or not _ops(f, DimShuffle)
    vv = rng.standard_normal(6).astype("float32")
    assert np.allclose(f(vv), vv)


def test_dimshuffle_transpose_in_reshape_kept():
    x = at.matrix("x", dtype="float64")
    r = x.T.reshape((x.shape[0] * x.shape[1],))
    f = atp.function([x], r, mode="PY")
    # transposition changes element order: the DimShuffle must survive
    assert _ops(f, DimShuffle)
    xv = rng.standard_normal((2, 3)).astype("float32")
    assert np.allclose(f(xv), xv.T.reshape(-1))


def test_reshape_lift_through_unary_elemwise():
    x = at.matrix("x", dtype="float64")
    r = at.tanh(x).reshape((x.shape[0] * x.shape[1],))
    # reshape_lift is a specialize-stage rule: needs the fast_run query
    f = atp.function([x], r, mode=atp.compile.mode.Mode("py", "fast_run"))
    order = f.maker.fgraph.toposort()
    reshape_pos = [i for i, n in enumerate(order) if isinstance(n.op, Reshape)]
    tanh_pos = [
        i for i, n in enumerate(order)
        if isinstance(n.op, Elemwise)
        and type(n.op.scalar_op).__name__ == "Tanh"
    ]
    assert reshape_pos and tanh_pos and reshape_pos[0] < tanh_pos[0]
    xv = rng.standard_normal((3, 4)).astype("float32")
    assert np.allclose(f(xv), np.tanh(xv).reshape(-1), rtol=1e-6)


def test_shape_of_specify_shape():
    x = at.matrix("x", dtype="float64")
    y = specify_shape(x, (5, None))
    f = atp.function([x], y.shape, mode="PY")
    assert not _ops(f, SpecifyShape)
    xv = rng.standard_normal((5, 7)).astype("float32")
    assert list(f(xv)) == [5, 7]


def test_subtensor_shape_constant():
    x = at.tensor3("x", dtype="float32", shape=(2, 3, None))
    f = atp.function([x], x.shape[:2], mode="PY")
    assert not _ops(f, Shape)
    xv = np.zeros((2, 3, 4), dtype="float32")
    assert list(f(xv)) == [2, 3]


def test_track_shape_i_grounds_constants():
    x = at.matrix("x", dtype="float32", shape=(None, 8))
    y = at.tanh(x)
    f = atp.function([x], y.shape[1], mode="PY")
    # the dim is static through the elemwise: folds to a constant
    # (remaining node is only the DeepCopyOp protecting the constant)
    assert not _ops(f, Shape) and not _ops(f, Shape_i)
    assert not _ops(f, Elemwise)
    assert int(f(np.zeros((3, 8), dtype="float32"))) == 8


def test_unbroadcast_lift_merge():
    x = at.matrix("x", dtype="float32", shape=(1, 1))
    y = unbroadcast(unbroadcast(x, 0), 1)
    f = atp.function([x], y, mode="PY")
    ubs = _ops(f, Unbroadcast)
    assert len(ubs) <= 1
    xv = np.ones((1, 1), dtype="float32")
    assert np.allclose(f(xv), xv)


def test_unbroadcast_lift_through_elemwise():
    x = at.matrix("x", dtype="float32", shape=(1, 3))
    y = unbroadcast(at.exp(x), 0)
    f = atp.function([x], y, mode="PY")
    order = f.maker.fgraph.toposort()
    kinds = [type(n.op).__name__ for n in order]
    if "Unbroadcast" in kinds and "Elemwise" in kinds:
        assert kinds.index("Unbroadcast") < kinds.index("Elemwise")
    xv = rng.standard_normal((1, 3)).astype("float32")
    assert np.allclose(f(xv), np.exp(xv), rtol=1e-6)


def test_values_unchanged_differential():
    """The whole pack leaves values bit-comparable between rewritten
    FAST_RUN-PY and a no-rewrite PY compile."""
    x = at.matrix("x", dtype="float64")
    exprs = [
        x.dimshuffle("x", 0, 1).reshape((x.shape[0], x.shape[1])),
        specify_shape(x, (4, None)).shape,
        at.tanh(x).reshape((x.shape[0] * x.shape[1],)),
        x.T.reshape((-1,)),
    ]
    xv = rng.standard_normal((4, 5)).astype("float32")
    for e in exprs:
        fast = atp.function([x], e, mode="PY")
        slow = atp.function([x], e, mode=atp.compile.mode.Mode(
            linker="py", optimizer=None))
        assert np.allclose(np.asarray(fast(xv)), np.asarray(slow(xv)),
                           rtol=1e-6), e
