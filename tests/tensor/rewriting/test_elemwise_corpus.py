"""Elemwise fusion behavior corpus: what the FusionOptimizer (optdb 49,
``tensor/rewriting/elemwise.py``) absorbs into ``Elemwise{Composite}``,
what it must leave alone, and value fidelity through fusion — the
analogue of the reference's ``tests/tensor/rewriting/test_elemwise.py``
fusion matrix, re-targeted at the Composite-as-fusion-unit design
(SURVEY §7 stage 6: fusion marks regions; XLA/Pallas does codegen).
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.config import config
from aesara_tpu.scalar.composite import Composite
from aesara_tpu.tensor.elemwise import Elemwise
from tests.rewrite_corpus import py_mode

rng = np.random.default_rng(20260824)


def compiled_composites(f):
    """(n_composite_nodes, n_plain_elemwise_nodes) in the optimized graph."""
    comp = plain = 0
    for node in f.fgraph.apply_nodes:
        if isinstance(node.op, Elemwise):
            if isinstance(node.op.scalar_op, Composite):
                comp += 1
            else:
                plain += 1
    return comp, plain


def check_values(inputs, out, vals, rtol=1e-6):
    f = function(inputs, out, mode="FAST_RUN", on_unused_input="ignore")
    fp = function(inputs, out, mode=py_mode, on_unused_input="ignore")
    np.testing.assert_allclose(
        np.asarray(f(*vals)), np.asarray(fp(*vals)), rtol=rtol, atol=1e-7
    )
    return f


def mat(shape=(4, 5)):
    return rng.normal(size=shape).astype("float32")


class TestFusionShapes:
    @pytest.mark.parametrize("depth", [2, 3, 6, 10])
    def test_unary_chain_fuses_to_one_composite(self, depth):
        x = at.matrix("x", dtype="float32")
        out = x
        for i in range(depth):
            out = at.tanh(out) if i % 2 else at.exp(out * 0.1)
        f = check_values([x], out, [mat()])
        comp, plain = compiled_composites(f)
        assert comp == 1 and plain == 0, (comp, plain)

    def test_multi_input_tree_fuses(self):
        a, b, c = (at.matrix(n, dtype="float32") for n in "abc")
        out = at.tanh(a * b) + at.exp(c) * at.math.sigmoid(a + c)
        f = check_values([a, b, c], out, [mat(), mat(), mat()])
        comp, plain = compiled_composites(f)
        assert comp == 1 and plain == 0

    def test_multi_client_intermediate_not_absorbed(self):
        # t feeds both the chain AND a reduction: t must stay a real node
        x = at.matrix("x", dtype="float32")
        t = at.tanh(x)
        out = at.exp(t) + at.sum(t)
        f = check_values([x], out, [mat()])
        # the tanh is shared by the chain AND the reduction: it must be
        # computed exactly ONCE — count it everywhere, including inside
        # any Composite's inner graph (a duplicate would mean fusion
        # recomputed a multi-client intermediate)
        from tests.rewrite_corpus import op_labels

        assert op_labels(f.fgraph.outputs).count("Tanh") == 1

    def test_reduction_breaks_the_chain(self):
        x = at.matrix("x", dtype="float32")
        out = at.exp(at.sum(at.tanh(x), axis=1) * 0.5)
        f = check_values([x], out, [mat()])
        # pre-reduce and post-reduce elemwise cannot share one composite
        comp, plain = compiled_composites(f)
        assert comp + plain >= 2

    def test_broadcast_operands_fuse(self):
        x = at.matrix("x", dtype="float32")
        r = at.tensor(dtype="float32", shape=(1, None), name="r")
        s = at.scalar("s", dtype="float32")
        out = at.tanh(x * r + s) * at.exp(x * 0.1)
        f = check_values([x, r, s],
                         out, [mat(), mat((1, 5)), np.float32(0.3)])
        comp, plain = compiled_composites(f)
        assert comp == 1 and plain == 0

    def test_fusion_disabled_flag(self):
        x = at.matrix("x", dtype="float32")
        out = at.exp(at.tanh(x * 2.0))
        with config.change_flags(tensor__local_elemwise_fusion=False):
            f = function([x], out, mode="FAST_RUN")
        comp, plain = compiled_composites(f)
        assert comp == 0 and plain >= 2


class TestFusionValues:
    @pytest.mark.parametrize("seed", range(5))
    def test_random_chain_values(self, seed):
        r = np.random.default_rng(seed)
        x = at.matrix("x", dtype="float32")
        y = at.matrix("y", dtype="float32")
        fns = [at.tanh, at.exp, at.math.sigmoid,
               lambda v: at.log1p(at.sqr(v)), lambda v: v * 0.7 + 0.1]
        out = x
        for _ in range(6):
            k = int(r.integers(0, len(fns) + 1))
            out = fns[k](out) if k < len(fns) else out + y * 0.2
        check_values([x, y], out, [mat(), mat()], rtol=2e-5)

    def test_fused_gradients_match(self):
        from aesara_tpu.gradient import grad

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        out = at.sum(at.tanh(x * y) + at.exp(x * 0.3) * at.math.sigmoid(y))
        gx, gy = grad(out, [x, y])
        f = function([x, y], [gx, gy], mode="FAST_RUN")
        fp = function([x, y], [gx, gy], mode=py_mode)
        a = rng.normal(size=(3, 4))
        b = rng.normal(size=(3, 4))
        for u, v in zip(f(a, b), fp(a, b)):
            np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                       rtol=1e-9)

    @pytest.mark.parametrize("dt", ["float32", "float64", "int32"])
    def test_dtype_preserved_through_fusion(self, dt):
        x = at.matrix("x", dtype=dt)
        if dt == "int32":
            out = (x * 2 + 1) * x
            v = rng.integers(-5, 5, size=(3, 4)).astype(dt)
        else:
            out = at.tanh(x) * at.exp(x * 0.1)
            v = rng.normal(size=(3, 4)).astype(dt)
        f = function([x], out, mode="FAST_RUN")
        got = np.asarray(f(v))
        assert got.dtype == np.dtype(dt)

    def test_second_order_grad_through_composite(self):
        from aesara_tpu.gradient import grad

        x = at.vector("x", dtype="float64")
        c = at.sum(at.tanh(at.exp(x * 0.5)))
        g = grad(c, x)
        h = grad(at.sum(g), x)
        f = function([x], h, mode="FAST_RUN")
        fp = function([x], h, mode=py_mode)
        v = rng.normal(size=7)
        np.testing.assert_allclose(np.asarray(f(v)), np.asarray(fp(v)),
                                   rtol=1e-9)


class TestCompositeHygiene:
    def test_dead_composite_output_pruned_in_pipeline(self):
        # a multi-output composite whose second output is never used
        from aesara_tpu.scalar.ops import float64 as s_f64
        import aesara_tpu.scalar.ops as aes

        sx = s_f64("sx")
        o1 = aes.tanh(sx)
        o2 = aes.exp(sx)
        comp = Composite([sx], [o1, o2])
        x = at.vector("x", dtype="float64")
        a, b = Elemwise(comp)(x)
        f = function([x], a * 2.0, mode="FAST_RUN")
        for node in f.fgraph.apply_nodes:
            sop = getattr(node.op, "scalar_op", None)
            if isinstance(sop, Composite):
                assert len(node.outputs) == 1

    def test_composite_repr_stable(self):
        x = at.vector("x", dtype="float32")
        f = function([x], at.exp(at.tanh(x)), mode="FAST_RUN")
        for node in f.fgraph.apply_nodes:
            sop = getattr(node.op, "scalar_op", None)
            if isinstance(sop, Composite):
                assert "Composite" in str(node.op)
