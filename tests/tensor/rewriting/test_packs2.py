"""Round-2 basic/subtensor/uncanonicalize rewrites (reference
``rewriting/basic.py``, ``rewriting/subtensor.py:663``,
``rewriting/uncanonicalize.py:146``): cast merging, alloc
lifting/elision, TopK output pruning, constant upcasting, write-then-
read-back elimination, gather-of-scatter fusion, dimshuffled allocs.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.tensor.basic import Alloc
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.subtensor import (
    AdvancedIncSubtensor1,
    AdvancedSubtensor1,
    IncSubtensor,
    Subtensor,
    inc_subtensor,
    set_subtensor,
)

M = atp.compile.mode.Mode("py", "fast_run")
rng = np.random.default_rng(19)


def _kinds(f):
    return [type(n.op).__name__ for n in f.maker.fgraph.toposort()]


class TestCastCast:
    def test_lossless_chain_merges(self):
        x = at.vector("x", dtype="float32")
        y = at.cast(at.cast(x, "float64"), "float32")
        f = atp.function([x], y, mode=M)
        # float32 -> float64 is lossless: whole chain folds to identity
        assert all(k == "DeepCopyOp" for k in _kinds(f))
        xv = rng.standard_normal(5).astype("float32")
        assert np.allclose(f(xv), xv)

    def test_lossy_chain_kept(self):
        x = at.vector("x", dtype="float64")
        y = at.cast(at.cast(x, "int32"), "float64")
        f = atp.function([x], y, mode=M)
        xv = np.array([1.7, -2.3], dtype="float64")
        assert np.allclose(f(xv), np.array([1.0, -2.0]))


class TestAllocRules:
    def test_alloc_unary_lift(self):
        n = at.iscalar("n")
        a = at.alloc(np.float32(4.0), n, n)
        f = atp.function([n], at.sqrt(a), mode=M)
        # sqrt computed on the scalar, THEN broadcast
        allocs = [nd for nd in f.maker.fgraph.toposort()
                  if isinstance(nd.op, Alloc)]
        assert allocs
        out = f(np.int32(3))
        assert out.shape == (3, 3) and np.all(out == 2.0)

    def test_elemwise_alloc_dropped(self):
        x = at.matrix("x", dtype="float32", shape=(4, 5))
        a = at.alloc(np.float32(3.0), 4, 5)
        f = atp.function([x], x + a, mode=M)
        assert not any(isinstance(n.op, Alloc)
                       for n in f.maker.fgraph.toposort())
        xv = rng.standard_normal((4, 5)).astype("float32")
        assert np.allclose(f(xv), xv + 3.0)

    def test_elemwise_alloc_kept_when_shape_unprovable(self):
        x = at.matrix("x", dtype="float64")
        n = at.iscalar("n")
        a = at.alloc(np.float32(3.0), n, n)
        f = atp.function([x, n], x + a, mode=M, on_unused_input="ignore")
        xv = rng.standard_normal((2, 2)).astype("float32")
        assert np.allclose(f(xv, np.int32(2)), xv + 3.0)

    def test_dimshuffle_alloc(self):
        n = at.iscalar("n")
        m = at.iscalar("m")
        a = at.alloc(np.float32(1.5), n, m)
        f = atp.function([n, m], a.T, mode=M)
        assert "DimShuffle" not in _kinds(f)
        out = f(np.int32(2), np.int32(3))
        assert out.shape == (3, 2) and np.all(out == 1.5)


class TestUselessTopK:
    def test_values_only(self):
        from aesara_tpu.tensor.sort import TopKOp, topk_and_argtopk

        x = at.matrix("x", dtype="float64")
        vals, idxs = topk_and_argtopk(x, 2)
        f = atp.function([x], vals, mode=M)
        ops = [n.op for n in f.maker.fgraph.toposort()
               if isinstance(n.op, TopKOp)]
        assert len(ops) == 1
        assert ops[0].return_values and not ops[0].return_indices
        xv = rng.standard_normal((3, 5)).astype("float32")
        assert np.allclose(np.sort(f(xv), axis=-1),
                           np.sort(np.sort(xv, axis=-1)[:, -2:], axis=-1))

    def test_indices_only(self):
        from aesara_tpu.tensor.sort import TopKOp, topk_and_argtopk

        x = at.vector("x", dtype="float64")
        vals, idxs = topk_and_argtopk(x, 3)
        f = atp.function([x], idxs, mode=M)
        ops = [n.op for n in f.maker.fgraph.toposort()
               if isinstance(n.op, TopKOp)]
        assert len(ops) == 1
        assert ops[0].return_indices and not ops[0].return_values
        xv = rng.standard_normal(7).astype("float32")
        assert set(np.asarray(f(xv))) == set(np.argsort(xv)[-3:])


class TestSubtensorIncSubtensor:
    def test_set_then_read_back(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float32", shape=(3,))
        expr = set_subtensor(x[2:5], y)[2:5]
        f = atp.function([x, y], expr, mode=M)
        assert "IncSubtensor" not in _kinds(f)
        xv = rng.standard_normal(8).astype("float32")
        yv = rng.standard_normal(3).astype("float32")
        assert np.allclose(f(xv, yv), yv)

    def test_different_index_kept(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float32", shape=(3,))
        expr = set_subtensor(x[2:5], y)[1:4]
        f = atp.function([x, y], expr, mode=M)
        xv = rng.standard_normal(8).astype("float32")
        yv = rng.standard_normal(3).astype("float32")
        ref = xv.copy()
        ref[2:5] = yv
        assert np.allclose(f(xv, yv), ref[1:4])

    def test_gather_of_scatter_add_unique(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float32", shape=(3,))
        ilist = at.as_tensor_variable(np.array([4, 0, 2], dtype="int64"))
        expr = inc_subtensor(x[ilist], y)[ilist]
        f = atp.function([x, y], expr, mode=M)
        assert not any(isinstance(n.op, AdvancedIncSubtensor1)
                       for n in f.maker.fgraph.toposort())
        xv = rng.standard_normal(6).astype("float32")
        yv = rng.standard_normal(3).astype("float32")
        assert np.allclose(f(xv, yv), xv[[4, 0, 2]] + yv, rtol=1e-6)

    def test_gather_of_scatter_add_duplicates_kept(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float32", shape=(3,))
        ilist = at.as_tensor_variable(np.array([2, 0, 2], dtype="int64"))
        expr = inc_subtensor(x[ilist], y)[ilist]
        f = atp.function([x, y], expr, mode=M)
        xv = rng.standard_normal(6).astype("float32")
        yv = rng.standard_normal(3).astype("float32")
        ref = xv.copy()
        np.add.at(ref, [2, 0, 2], yv)
        assert np.allclose(f(xv, yv), ref[[2, 0, 2]], rtol=1e-6)


class TestUpcastConstants:
    def test_python_float_constant_upcast(self):
        x = at.vector("x", dtype="float32")
        f = atp.function([x], x * 2.5, mode=M)
        for n in f.maker.fgraph.toposort():
            for i in n.inputs:
                if hasattr(i, "data"):
                    assert np.asarray(i.data).dtype != np.float64
        xv = rng.standard_normal(4).astype("float32")
        assert np.allclose(f(xv), xv * 2.5, rtol=1e-6)


def test_gather_of_scatter_negative_alias_kept():
    """[4, -1] on a length-5 axis aliases one row: the rewrite must NOT
    fire (review finding — raw np.unique called it 'unique')."""
    x = at.TensorType("float32", (5,))("x")
    y = at.vector("y", dtype="float32", shape=(2,))
    ilist = at.as_tensor_variable(np.array([4, -1], dtype="int64"))
    expr = inc_subtensor(x[ilist], y)[ilist]
    f = atp.function([x, y], expr, mode=M)
    xv = np.arange(5, dtype="float32")
    yv = np.array([10.0, 100.0], dtype="float32")
    ref = xv.copy()
    np.add.at(ref, [4, -1], yv)
    assert np.allclose(f(xv, yv), ref[[4, -1]])


def test_gather_of_scatter_negative_nonalias_fires():
    """[-1, 0] with a KNOWN length normalizes to [4, 0]: unique, the
    rewrite may fire, and values must stay right."""
    x = at.TensorType("float32", (5,))("x")
    y = at.vector("y", dtype="float32", shape=(2,))
    ilist = at.as_tensor_variable(np.array([-1, 0], dtype="int64"))
    expr = inc_subtensor(x[ilist], y)[ilist]
    f = atp.function([x, y], expr, mode=M)
    xv = np.arange(5, dtype="float32")
    yv = np.array([10.0, 100.0], dtype="float32")
    assert np.allclose(f(xv, yv), xv[[-1, 0]] + yv)


class TestFillFamily:
    def test_fill_sink_enables_cancellation(self):
        """fill(a, b) * c sinks so b·c can cancel (grad-graph pattern)."""
        from aesara_tpu.tensor.basic import fill

        x = at.vector("x", dtype="float64")
        a = at.vector("a", dtype="float64")
        # (fill(a, x) / x): after sinking, x/x cancels to fill(a, 1)
        expr = fill(a, x) / x
        f = atp.function([x, a], expr, mode=M)
        xv = (rng.random(4) + 0.5).astype("float32")
        av = rng.standard_normal(4).astype("float32")
        assert np.allclose(f(xv, av), np.ones(4), rtol=1e-6)
        from aesara_tpu.scalar.ops import TrueDiv

        assert not any(
            isinstance(n.op, Elemwise)
            and isinstance(n.op.scalar_op, TrueDiv)
            for n in f.maker.fgraph.toposort()
        )

    def test_fill_to_alloc_specializes(self):
        from aesara_tpu.tensor.basic import Alloc, fill

        t = at.matrix("t", dtype="float64")
        v = at.vector("v", dtype="float64")
        f = atp.function([t, v], fill(t, v.sum()), mode=M)
        kinds = [type(n.op).__name__ for n in f.maker.fgraph.toposort()]
        tv = np.zeros((2, 3), dtype="float32")
        vv = np.arange(3, dtype="float32")
        out = f(tv, vv)
        assert out.shape == (2, 3) and np.all(np.asarray(out) == 3.0)

    def test_fill_values_differential(self):
        from aesara_tpu.tensor.basic import fill

        x = at.vector("x", dtype="float64")
        t = at.matrix("t", dtype="float64")
        expr = fill(t, x.sum()) * 2 + 1
        fast = atp.function([t, x], expr, mode=M)
        slow = atp.function([t, x], expr,
                            mode=atp.compile.mode.Mode("py", None))
        tv = np.zeros((3, 2), dtype="float32")
        xv = rng.standard_normal(4).astype("float32")
        assert np.allclose(np.asarray(fast(tv, xv)),
                           np.asarray(slow(tv, xv)), rtol=1e-6)

    def test_fill_broadcasting_template_not_allocd(self):
        """fill(row, col) broadcasts BOTH ways: alloc-from-template
        would be wrong-shaped, the rewrite must decline (regression)."""
        from aesara_tpu.tensor.basic import fill

        t = at.TensorType("float32", (1, None))("t")   # row
        v = at.TensorType("float32", (None, 1))("v")   # col
        f = atp.function([t, v], fill(t, v), mode=M)
        tv = np.zeros((1, 4), dtype="float32")
        vv = np.arange(3, dtype="float32").reshape(3, 1)
        out = np.asarray(f(tv, vv))
        assert out.shape == (3, 4)
        assert np.allclose(out, np.broadcast_to(vv, (3, 4)))
