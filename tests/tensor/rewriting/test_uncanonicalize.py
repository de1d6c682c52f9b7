"""Uncanonicalize pack (reference ``tensor/rewriting/uncanonicalize.py``)."""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.tensor import math as tm
from aesara_tpu.tensor.elemwise import DimShuffle
from aesara_tpu.tensor.math import Min


def test_max_to_min():
    x = at.matrix("x", dtype="float64")
    f = atp.function([x], tm.neg(tm.max(tm.neg(x), axis=0)))
    assert any(isinstance(n.op, Min) for n in f.maker.fgraph.toposort())
    xv = np.random.default_rng(0).normal(size=(3, 4)).astype("float32")
    assert np.allclose(f(xv), xv.min(axis=0), rtol=1e-6)


def test_alloc_dimshuffle_lift():
    x = at.matrix("x", dtype="float64")
    a = at.alloc(np.float32(2.5), x.shape[0], x.shape[1])
    f = atp.function([x], a.T)
    assert not any(isinstance(n.op, DimShuffle) for n in f.maker.fgraph.toposort())
    out = f(np.zeros((2, 3), dtype="float32"))
    assert out.shape == (3, 2) and np.all(np.asarray(out) == np.float32(2.5))


def test_reshape_dimshuffle():
    from aesara_tpu.tensor.shape import Reshape

    v = at.vector("v", dtype="float64")
    r = v.dimshuffle("x", 0, "x").reshape((1, v.shape[0]))
    f = atp.function([v], r)
    # the whole chain collapses to one broadcast-insertion DimShuffle
    # (local_useless_dimshuffle_in_reshape + local_reshape_to_dimshuffle)
    nodes = f.maker.fgraph.toposort()
    assert not any(isinstance(n.op, Reshape) for n in nodes)
    assert len(nodes) == 1
    vv = np.arange(4.0, dtype="float32")
    assert np.allclose(f(vv), vv[None])


def test_dynamic_alloc_actionable_error():
    import pytest

    n = at.scalar("n", dtype="int64")
    f = atp.function([n], at.alloc(np.float32(1.0), n))
    with pytest.raises(NotImplementedError, match="derive sizes from"):
        f(3)


def test_unique_lift_rewrites():
    """extra_ops rewrites: Unique over repeat/alloc/scalar simplifies
    (reference tensor/rewriting/extra_ops.py)."""
    from aesara_tpu.tensor.extra_ops import Repeat, Unique, unique

    x = at.vector("x", dtype="float64")
    xv = np.array([3.0, 1.0, 3.0], dtype="float32")

    f = atp.function([x], unique(at.repeat(x, 3)), mode="PY")
    ops = [type(n.op).__name__ for n in f.maker.fgraph.toposort()]
    assert "Repeat" not in ops
    assert np.allclose(f(xv), [1.0, 3.0])

    s = at.scalar("s", dtype="float64")
    fs = atp.function([s], unique(s), mode="PY")
    assert "Unique" not in [type(n.op).__name__
                            for n in fs.maker.fgraph.toposort()]
    assert np.allclose(fs(5.0), [5.0])

    f3 = atp.function(
        [x], unique(at.alloc(at.as_tensor_variable(np.float32(2.0)),
                             x.shape[0], 4)), mode="PY")
    assert np.allclose(f3(xv), [2.0])
