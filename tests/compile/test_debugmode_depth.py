"""DebugMode depth wave (VERDICT r4 item 4): the sanitizer surface the
reference pins in ``tests/compile/test_debugmode.py`` — BadThunkOutput
for a divergent lowering, InvalidValueError for non-finites, rewrite
stochastic-order detection, and DebugMode over the structured-op zoo
(scan, ifelse, OpFromGraph, subtensor writes, updates).

Repo design note: DebugMode here cross-checks the PY oracle against the
XLA lowering per node (``compile/debugmode.py``), so "bad thunk" means
"the two backends disagree" — planted via an op whose perform and
lowering intentionally differ.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.debugmode import (
    BadThunkOutput,
    DebugMode,
    DebugModeError,
    InvalidValueError,
    StochasticOrder,
    check_rewrite_stability,
)
from aesara_tpu.compile.function import function
from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.type import TensorType

rng = np.random.default_rng(13579)


class _DivergentOp(Op):
    """perform() doubles; the registered lowering triples."""

    def make_node(self, x):
        x = at.as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, outputs):
        outputs[0][0] = inputs[0] * 2.0

    def infer_shape(self, fgraph, node, shapes):
        return shapes


_divergent = _DivergentOp()


@pytest.fixture(autouse=True)
def _register_divergent_lowering():
    from aesara_tpu.link.jax.dispatch import jax_funcify

    @jax_funcify.register(_DivergentOp)
    def _lower(op, node=None, **kwargs):
        def run(x):
            return x * 3.0  # deliberately wrong vs perform()

        return run

    yield
    # leave the registration in place: the op type is test-local


class TestBadThunkDetection:
    def test_divergent_op_caught(self):
        x = at.vector("x", dtype="float64")
        out = _divergent(x) + 1.0
        f = function([x], out, mode=DebugMode(optimizer=None))
        with pytest.raises((BadThunkOutput, DebugModeError)):
            f(rng.normal(size=4))

    def test_error_names_the_culprit(self):
        x = at.vector("x", dtype="float64")
        out = _divergent(x)
        f = function([x], out, mode=DebugMode(optimizer=None))
        with pytest.raises((BadThunkOutput, DebugModeError)) as e:
            f(rng.normal(size=4))
        assert "DivergentOp" in str(e.value) or "Divergent" in str(e.value)

    def test_honest_graph_unaffected(self):
        x = at.vector("x", dtype="float64")
        out = tm.tanh(x) * 2.0 + x.sum()
        f = function([x], out, mode=DebugMode())
        vv = rng.normal(size=4)
        np.testing.assert_allclose(np.asarray(f(vv)),
                                   np.tanh(vv) * 2.0 + vv.sum())


class TestInvalidValues:
    def test_nan_caught_with_check_finite(self):
        x = at.vector("x", dtype="float64")
        out = tm.log(x)
        f = function([x], out, mode=DebugMode(check_finite=True))
        with pytest.raises((InvalidValueError, DebugModeError, Exception)):
            f(np.array([-1.0, 2.0]))

    def test_inf_caught_with_check_finite(self):
        x = at.vector("x", dtype="float64")
        out = tm.exp(x)
        f = function([x], out, mode=DebugMode(check_finite=True))
        with pytest.raises((InvalidValueError, DebugModeError, Exception)):
            f(np.array([1e308, 1.0]) * 10)

    def test_finite_values_pass(self):
        x = at.vector("x", dtype="float64")
        f = function([x], tm.exp(x), mode=DebugMode(check_finite=True))
        np.testing.assert_allclose(np.asarray(f(np.array([0.0, 1.0]))),
                                   [1.0, np.e])


class TestStructuredOpsUnderDebugMode:
    def test_scan_under_debugmode(self):
        from aesara_tpu.scan.basic import scan

        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t, acc: acc + x_t * x_t, sequences=[v],
                       outputs_info=[at.constant(np.float64(0.0))])
        f = function([v], outs[-1], mode=DebugMode())
        vv = rng.normal(size=5)
        assert np.isclose(float(np.asarray(f(vv))), np.sum(vv ** 2))

    def test_ifelse_under_debugmode(self):
        from aesara_tpu.ifelse import ifelse

        c = at.scalar("c", dtype="int8")
        a = at.vector("a", dtype="float64")
        out = ifelse(c, a * 2.0, a - 1.0)
        f = function([c, a], out, mode=DebugMode())
        vv = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(1, vv)), vv * 2.0)
        np.testing.assert_allclose(np.asarray(f(0, vv)), vv - 1.0)

    def test_opfromgraph_under_debugmode(self):
        from aesara_tpu.compile.builders import OpFromGraph

        xi = at.vector("xi", dtype="float64")
        inner = tm.tanh(xi) * 3.0
        op = OpFromGraph([xi], [inner])
        x = at.vector("x", dtype="float64")
        f = function([x], op(x), mode=DebugMode())
        vv = rng.normal(size=4)
        np.testing.assert_allclose(np.asarray(f(vv)), np.tanh(vv) * 3.0)

    def test_subtensor_writes_under_debugmode(self):
        x = at.matrix("x", dtype="float64")
        out = at.set_subtensor(x[1:, :2], np.float64(7.0))
        f = function([x], out, mode=DebugMode())
        vv = rng.normal(size=(3, 4))
        got = np.asarray(f(vv))
        expect = vv.copy(); expect[1:, :2] = 7.0
        np.testing.assert_allclose(got, expect)
        np.testing.assert_allclose(vv, vv)  # input untouched

    def test_updates_under_debugmode(self):
        s = atp.shared(np.float64(1.0), name="s")
        f = function([], s, updates={s: s * 2.0}, mode=DebugMode())
        f(); f()
        assert float(s.get_value()) == 4.0
        s.set_value(np.float64(1.0))


class TestRewriteStability:
    @staticmethod
    def _build(recorder, extra_event=None):
        from aesara_tpu.compile.mode import get_mode
        from aesara_tpu.graph.fg import FunctionGraph

        x = at.vector("x", dtype="float64")
        out = tm.log(tm.exp(x)) + 0.0
        fg = FunctionGraph([x], [out], clone=True)
        fg.attach_feature(recorder)
        get_mode("FAST_RUN").optimizer.rewrite(fg)
        if extra_event is not None:
            recorder.events.append(extra_event)
        return fg

    def test_stable_pipeline_passes(self):
        fg = check_rewrite_stability(self._build, patience=4)
        assert fg is not None

    def test_stochastic_trace_caught(self):
        calls = {"n": 0}

        def build(recorder):
            calls["n"] += 1
            return self._build(recorder,
                               extra_event=f"variant-{calls['n'] % 2}")

        with pytest.raises(StochasticOrder):
            check_rewrite_stability(build, patience=4)
