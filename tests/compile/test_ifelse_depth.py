"""IfElse depth wave (VERDICT r4 item 4): the lazy-conditional surface
the reference pins in ``tests/test_ifelse.py`` — laziness (untaken
branch never executes on the lazy linker), nested conditions, gradient
routing, multi-output consistency checks, the identical-branch and
constant-condition rewrites, and validation errors.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.graph.ir import Apply, ancestors
from aesara_tpu.graph.op import Op
from aesara_tpu.ifelse import IfElse, ifelse
from tests.rewrite_corpus import op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(24680)


class _CountingOp(Op):
    """Identity that counts perform() executions — the laziness probe."""

    def __init__(self):
        self.n_calls = 0

    def make_node(self, x):
        x = at.as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, outputs):
        self.n_calls += 1
        outputs[0][0] = inputs[0].copy()

    def infer_shape(self, fgraph, node, shapes):
        return shapes


class TestLaziness:
    def test_untaken_branch_not_executed_cvm(self):
        """Laziness is the CVM's contract (the py PerformLinker runs the
        whole toposort; XLA's lax.cond is device-lazy)."""
        from aesara_tpu.compile.mode import Mode, OPT_NONE
        from aesara_tpu.link.c.vm_linker import CVMLinker

        probe_then = _CountingOp()
        probe_else = _CountingOp()
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        out = ifelse(c, probe_then(x * 2.0), probe_else(x - 1.0))
        f = function([c, x], out, mode=Mode(CVMLinker(), OPT_NONE))
        vv = rng.normal(size=3)
        f(1, vv)
        assert probe_then.n_calls == 1
        assert probe_else.n_calls == 0
        f(0, vv)
        assert probe_then.n_calls == 1
        assert probe_else.n_calls == 1

    def test_both_branches_evaluate_correctly(self):
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        out = ifelse(c, tm.exp(x), tm.tanh(x))
        for mode in ("PY", "FAST_RUN"):
            f = function([c, x], out, mode=mode)
            vv = rng.normal(size=4)
            np.testing.assert_allclose(np.asarray(f(1, vv)), np.exp(vv),
                                       rtol=1e-7)
            np.testing.assert_allclose(np.asarray(f(0, vv)), np.tanh(vv),
                                       rtol=1e-7)


class TestNested:
    def test_two_level_nesting(self):
        c1 = at.scalar("c1", dtype="int8")
        c2 = at.scalar("c2", dtype="int8")
        x = at.scalar("x", dtype="float64")
        out = ifelse(c1, ifelse(c2, x * 2.0, x * 3.0), x * 5.0)
        f = function([c1, c2, x], out, mode="FAST_RUN")
        assert float(np.asarray(f(1, 1, 1.0))) == 2.0
        assert float(np.asarray(f(1, 0, 1.0))) == 3.0
        assert float(np.asarray(f(0, 1, 1.0))) == 5.0

    def test_nested_grad(self):
        c1 = at.scalar("c1", dtype="int8")
        x = at.scalar("x", dtype="float64")
        out = ifelse(c1, x * x, ifelse(c1, x, x * x * x))
        g = grad(out, x)
        f = function([c1, x], g, mode="FAST_RUN")
        assert float(np.asarray(f(1, 3.0))) == 6.0    # d(x²)
        assert float(np.asarray(f(0, 3.0))) == 27.0   # d(x³)


class TestGradRouting:
    def test_grad_only_through_taken_branch(self):
        c = at.scalar("c", dtype="int8")
        a = at.scalar("a", dtype="float64")
        b = at.scalar("b", dtype="float64")
        out = ifelse(c, a * 2.0, b * 3.0)
        ga = grad(out, a, disconnected_inputs="ignore")
        gb = grad(out, b, disconnected_inputs="ignore")
        f = function([c, a, b], [ga, gb], mode="FAST_RUN",
                     on_unused_input="ignore")
        va, vb = f(1, 1.0, 1.0)
        assert float(np.asarray(va)) == 2.0
        assert float(np.asarray(vb)) == 0.0
        va, vb = f(0, 1.0, 1.0)
        assert float(np.asarray(va)) == 0.0
        assert float(np.asarray(vb)) == 3.0

    def test_grad_shared_operand_in_both_branches(self):
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        out = ifelse(c, (x * 2.0).sum(), (x * x).sum())
        g = grad(out, x)
        f = function([c, x], g, mode="FAST_RUN")
        vv = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(1, vv)), np.full(3, 2.0))
        np.testing.assert_allclose(np.asarray(f(0, vv)), 2.0 * vv)

    def test_second_order_through_ifelse(self):
        c = at.scalar("c", dtype="int8")
        x = at.scalar("x", dtype="float64")
        out = ifelse(c, x ** 3, x ** 2)
        g2 = grad(grad(out, x), x)
        f = function([c, x], g2, mode="FAST_RUN")
        assert float(np.asarray(f(1, 2.0))) == 12.0
        assert float(np.asarray(f(0, 2.0))) == 2.0


class TestMultiOutput:
    def test_n_outs_multiple(self):
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        outs = ifelse(c, (x * 2.0, y * 2.0), (x - 1.0, y - 1.0))
        f = function([c, x, y], list(outs), mode="FAST_RUN")
        xv, yv = rng.normal(size=3), rng.normal(size=(2, 2))
        r1, r2 = f(1, xv, yv)
        np.testing.assert_allclose(np.asarray(r1), xv * 2.0)
        np.testing.assert_allclose(np.asarray(r2), yv * 2.0)

    def test_mixed_dtypes_upcast_or_reject(self):
        c = at.scalar("c", dtype="int8")
        xf = at.vector("xf", dtype="float32")
        xd = at.vector("xd", dtype="float64")
        out = ifelse(c, xf, xd)
        assert out.type.dtype == "float64"

    def test_mismatched_ndim_rejected(self):
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        with pytest.raises((TypeError, ValueError)):
            ifelse(c, x, y)

    def test_branch_count_mismatch_rejected(self):
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        with pytest.raises((TypeError, ValueError)):
            ifelse(c, (x, x), (x,))


class TestConditionForms:
    def test_comparison_condition(self):
        x = at.scalar("x", dtype="float64")
        out = ifelse(x > 0.0, x * 10.0, -x)
        f = function([x], out, mode="FAST_RUN")
        assert float(np.asarray(f(2.0))) == 20.0
        assert float(np.asarray(f(-2.0))) == 2.0

    def test_nonscalar_condition_rejected(self):
        c = at.vector("c", dtype="int8")
        x = at.scalar("x", dtype="float64")
        with pytest.raises((TypeError, ValueError)):
            ifelse(c, x, x * 2.0)

    def test_bool_python_condition_constant_folds(self):
        x = at.scalar("x", dtype="float64")
        out = ifelse(at.constant(np.int8(1)), x * 2.0, x * 3.0)
        f = function([x], out, mode="FAST_RUN")
        assert float(np.asarray(f(1.0))) == 2.0


class TestIfElseRewrites:
    def test_identical_branches_collapse(self):
        """ifelse(c, expr, expr) → expr (cond_remove_identical)."""
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        branch = x * 2.0
        out = ifelse(c, branch, branch)
        r = rewrite_only(out, include=("specialize",))
        assert "IfElse" not in op_labels(r)

    def test_different_branches_survive(self):
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        out = ifelse(c, x * 2.0, x * 3.0)
        r = rewrite_only(out, include=("specialize",))
        assert "IfElse" in op_labels(r)

    def test_value_through_full_pipeline(self):
        c = at.scalar("c", dtype="int8")
        x = at.vector("x", dtype="float64")
        out = ifelse(c, tm.log(tm.exp(x)), x * 1.0) + 0.0
        rewrite_and_check(
            [c, x], out, [np.int8(1), rng.normal(size=4)],
            include=("canonicalize", "stabilize", "specialize"))


class TestWithStateAndScan:
    def test_ifelse_with_updates(self):
        s = atp.shared(np.float64(0.0), name="s")
        c = at.scalar("c", dtype="int8")
        new = ifelse(c, s + 1.0, s - 1.0)
        f = function([c], [], updates={s: new}, mode="FAST_RUN")
        f(1); f(1); f(0)
        assert float(s.get_value()) == 1.0
        s.set_value(np.float64(0.0))

    def test_ifelse_inside_scan_body(self):
        from aesara_tpu.scan.basic import scan

        v = at.vector("v", dtype="float64")
        outs, _ = scan(
            lambda x_t, acc: ifelse(x_t > 0.0, acc + x_t, acc - x_t),
            sequences=[v],
            outputs_info=[at.constant(np.float64(0.0))])
        f = function([v], outs[-1], mode="FAST_RUN")
        vv = rng.normal(size=6)
        assert np.isclose(float(np.asarray(f(vv))), np.abs(vv).sum())

    def test_grad_of_ifelse_inside_scan(self):
        from aesara_tpu.scan.basic import scan

        v = at.vector("v", dtype="float64")
        outs, _ = scan(
            lambda x_t, acc: ifelse(x_t > 0.0, acc + x_t * x_t, acc),
            sequences=[v],
            outputs_info=[at.constant(np.float64(0.0))])
        g = grad(outs[-1], v)
        f = function([v], g, mode="FAST_RUN")
        vv = np.array([1.0, -2.0, 3.0])
        np.testing.assert_allclose(np.asarray(f(vv)), [2.0, 0.0, 6.0])
