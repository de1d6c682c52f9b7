"""DebugMode / NanGuardMode / MonitorMode / ProfileStats tests."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.debugmode import BadThunkOutput, DebugMode
from aesara_tpu.compile.function import function
from aesara_tpu.compile.monitormode import MonitorMode
from aesara_tpu.compile.nanguardmode import NanGuardError, NanGuardMode
from aesara_tpu.compile.profiling import ProfileMode, xla_cost_analysis

rng = np.random.default_rng(55)


def test_debugmode_passes_on_agreeing_graph():
    x = at.matrix("x", dtype="float64")
    out = at.tanh(at.dot(x, x.T)).sum()
    f = function([x], out, mode=DebugMode())
    v = rng.normal(size=(4, 4))
    ref = function([x], out, mode="PY")
    np.testing.assert_allclose(f(v), ref(v), rtol=1e-10)


def test_debugmode_catches_mismatch():
    from aesara_tpu.graph.op import Op
    from aesara_tpu.graph.ir import Apply
    from aesara_tpu.link.jax.dispatch import jax_funcify

    class LyingOp(Op):
        __props__ = ()

        def make_node(self, x):
            x = at.as_tensor_variable(x)
            return Apply(self, [x], [x.type()])

        def perform(self, node, inputs, out):
            out[0][0] = inputs[0] * 2.0

        def grad(self, inputs, gz):
            return [gz[0] * 2.0]

    @jax_funcify.register(LyingOp)
    def _jx_lying(op, node=None, **kw):
        return lambda x: x * 3.0  # deliberately wrong

    x = at.vector("x", dtype="float64")
    f = function([x], LyingOp()(x), mode=DebugMode(optimizer=None))
    with pytest.raises(BadThunkOutput):
        f(rng.normal(size=3))


def test_nanguard_raises_on_nan():
    x = at.vector("x", dtype="float64")
    out = at.log(x)  # nan for negative input
    f = function([x], out, mode=NanGuardMode(True, True, True))
    f(np.abs(rng.normal(size=3)) + 0.1)  # fine
    with pytest.raises(NanGuardError):
        f(np.array([-1.0, 1.0, 2.0]))


def test_nanguard_inf():
    x = at.vector("x", dtype="float64")
    out = 1.0 / x
    f = function([x], out, mode=NanGuardMode(True, True, True))
    with pytest.raises(NanGuardError):
        f(np.array([0.0, 1.0]))


def test_monitor_mode_hooks():
    seen = []

    def post(i, node, thunk):
        seen.append(str(node.op))

    x = at.vector("x", dtype="float64")
    f = function([x], at.exp(x).sum(), mode=MonitorMode(post_func=post))
    f(rng.normal(size=3))
    assert any("exp" in s.lower() or "Composite" in s for s in seen)
    assert any("Sum" in s for s in seen)


def test_profile_mode_collects():
    mode = ProfileMode()
    x = at.matrix("x", dtype="float64")
    f = function([x], at.dot(x, x.T).sum(), mode=mode)
    for _ in range(3):
        f(rng.normal(size=(8, 8)))
    stats = mode.profile_stats
    assert stats.fct_callcount == 3
    assert sum(stats.apply_callcount.values()) >= 6
    import io

    buf = io.StringIO()
    stats.summary(file=buf)
    assert "per-op time" in buf.getvalue()


def test_xla_cost_analysis():
    x = at.matrix("x", dtype="float32")
    f = function([x], at.dot(x, x.T), mode="JAX")
    v = rng.normal(size=(16, 16)).astype("float32")
    f(v)
    cost = xla_cost_analysis(f)
    assert isinstance(cost, dict)
    if "flops" in cost:
        assert cost["flops"] >= 2 * 16 * 16 * 16 * 0.5


def test_debugmode_catches_wrong_lowering():
    """The py-vs-XLA differential runner (SURVEY section-5 role of
    DebugMode): an op whose lowering disagrees with its oracle raises
    BadThunkOutput at the exact node."""
    import jax.numpy as jnp
    import numpy as np

    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.compile.debugmode import BadThunkOutput, DebugMode
    from aesara_tpu.graph.ir import Apply
    from aesara_tpu.graph.op import Op
    from aesara_tpu.link.jax.dispatch import jax_funcify

    class EvilOp(Op):
        __props__ = ()

        def make_node(self, v):
            v = at.as_tensor_variable(v)
            return Apply(self, [v], [v.type()])

        def perform(self, node, inputs, out):
            out[0][0] = inputs[0] * 2.0

    @jax_funcify.register(EvilOp)
    def _evil(op, node=None, **kw):
        return lambda v: jnp.asarray(v) * 3.0  # deliberately wrong

    x = at.vector("x", dtype="float64")
    xv = np.arange(3.0, dtype="float32")
    # healthy graph is clean
    f = atp.function([x], at.math.exp(x) * 2, mode=DebugMode())
    assert np.allclose(f(xv), np.exp(xv) * 2, rtol=1e-5)
    # wrong lowering is pinpointed
    g = atp.function([x], EvilOp()(x), mode=DebugMode())
    with pytest.raises(BadThunkOutput, match="EvilOp"):
        g(xv)


def test_stability_patience_clean_pipeline():
    # the real pipeline is deterministic: patience > 1 compiles cleanly
    x = at.vector("x", dtype="float64")
    f = function([x], at.math.exp(x) + 1.0,
                 mode=DebugMode(stability_patience=3))
    xv = np.arange(3.0, dtype="float32")
    assert np.allclose(f(xv), np.exp(xv) + 1.0, rtol=1e-5)


def test_stability_patience_catches_stochastic_rewriter():
    from aesara_tpu.compile.debugmode import StochasticOrder
    from aesara_tpu.compile.mode import Mode
    from aesara_tpu.link.basic import PerformLinker

    calls = {"n": 0}

    class FlakyRewriter:
        """Mutates the graph only on every second run."""

        def rewrite(self, fg):
            calls["n"] += 1
            if calls["n"] % 2 == 0:
                node = fg.outputs[0].owner
                rep = at.math.mul(*node.inputs)
                fg.replace(fg.outputs[0], rep, reason="flaky")

    class _M(Mode):
        @property
        def optimizer(self):
            return FlakyRewriter()

    m = _M(PerformLinker(), None)
    m.stability_patience = 3
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    with pytest.raises(StochasticOrder):
        function([x, y], at.math.add(x, y), mode=m)
