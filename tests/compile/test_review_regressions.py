"""Regression tests for the round-2 compile/link/gradient review
findings."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad, numeric_grad, subgraph_grad


class TestSharedOwnsBuffer:
    def test_constructor_copies_by_default(self):
        a = np.zeros(3)
        s = atp.shared(a)
        a[0] = 5.0
        assert float(np.asarray(s.get_value())[0]) == 0.0

    def test_borrow_true_aliases(self):
        a = np.zeros(3)
        s = atp.shared(a, borrow=True)
        a[0] = 5.0
        assert float(np.asarray(s.get_value(borrow=True))[0]) == 5.0


class TestJitCacheConstantOutputs:
    def test_different_constant_updates_do_not_collide(self):
        s1 = atp.shared(np.full(3, -1.0), name="s1")
        s2 = atp.shared(np.full(3, -1.0), name="s2")
        f1 = function([], [], updates={s1: at.constant(np.zeros(3))},
                      mode="FAST_RUN")
        f2 = function([], [], updates={s2: at.constant(np.ones(3))},
                      mode="FAST_RUN")
        f1()
        f2()
        np.testing.assert_array_equal(np.asarray(s1.get_value()), 0.0)
        np.testing.assert_array_equal(np.asarray(s2.get_value()), 1.0)


class TestSubgraphGrad:
    def test_segment_boundary_cuts(self):
        # reference MLP idiom: gradients chained layer by layer must
        # equal the end-to-end gradient
        x = at.vector("x", dtype="float64")
        w1 = atp.shared(np.array([[0.3, -0.2], [0.5, 0.1]]), name="w1")
        w2 = atp.shared(np.array([0.7, -0.4]), name="w2")
        a1 = at.tanh(at.dot(x, w1))
        cost = (a1 * w2).sum()

        # direct gradient
        g_direct = grad(cost, [w1, w2])

        # segment-wise: top segment w2, cut at a1; then bottom w1
        (g_w2,), (g_a1,) = subgraph_grad(wrt=[w2], end=[a1], cost=cost)
        (g_w1,), _ = subgraph_grad(wrt=[w1], end=[x], start={a1: g_a1})

        f = function([x], list(g_direct) + [g_w1, g_w2], mode="PY")
        xv = np.array([0.4, -1.2])
        d1, d2, s1, s2 = (np.asarray(v) for v in f(xv))
        np.testing.assert_allclose(s1, d1, rtol=1e-12)
        np.testing.assert_allclose(s2, d2, rtol=1e-12)


class TestNumericGradContiguity:
    def test_transposed_input_perturbs(self):
        def f(m):
            return (np.asarray(m) ** 2).sum()

        base = np.arange(6.0).reshape(2, 3)
        ng_c = numeric_grad(f, [base.copy()])
        ng_f = numeric_grad(f, [base.T.copy().T])  # F-ordered data
        assert np.abs(ng_c.gf[0]).sum() > 0
        np.testing.assert_allclose(ng_f.gf[0], ng_c.gf[0], rtol=1e-5)


class TestCompileNamespaceBindings:
    def test_unused_input_error_is_the_raised_class(self):
        import aesara_tpu.compile as compile_mod

        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        with pytest.raises(compile_mod.UnusedInputError):
            function([x, y], x * 2, mode="PY")

    def test_local_useless_is_the_useless_db(self):
        import aesara_tpu.compile as compile_mod
        from aesara_tpu.compile.mode import local_useless

        assert compile_mod.local_useless is local_useless


class TestProfileCallCount:
    def test_counted_once_per_call(self):
        x = at.vector("x", dtype="float64")
        f = function([x], at.exp(x).sum(), mode="PY", profile=True)
        for _ in range(5):
            f(np.ones(3))
        assert f.profile.fct_callcount == 5


class TestWrapLinkerMany:
    def test_single_linker_works(self):
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.link.basic import PerformLinker, WrapLinkerMany

        x = at.vector("x", dtype="float64")
        out = at.exp(x)
        fg = FunctionGraph([x], [out], clone=True)
        seen = []

        def wrapper(fgraph, i, node, *thunks):
            # the wrapper owns execution (MonitorMode contract)
            seen.append(i)
            for th in thunks:
                th()

        wl = WrapLinkerMany([PerformLinker()], [wrapper])
        wl.accept(fg)
        thunk, ins, outs = wl.make_thunk()
        ins[0].storage[0] = np.ones(3)
        thunk()
        assert seen  # the wrapper ran
        np.testing.assert_allclose(outs[0].storage[0], np.e)


class TestAsOpSingleEvaluation:
    def test_host_callback_called_once(self):
        calls = []

        from aesara_tpu.compile.ops import as_op
        from aesara_tpu.tensor.type import TensorType

        dvec4 = TensorType("float64", (4,))

        @as_op(itypes=[dvec4], otypes=[dvec4])
        def twice(v):
            calls.append(1)
            return np.asarray(v) * 2

        x = at.tensor("x", dtype="float64", shape=(4,))
        f = function([x], twice(x), mode="FAST_RUN")
        calls.clear()
        res = f(np.ones(4))
        np.testing.assert_allclose(np.asarray(res), 2.0)
        assert len(calls) == 1, f"host fn ran {len(calls)} times"
