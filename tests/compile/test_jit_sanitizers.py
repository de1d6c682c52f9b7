"""Jit-path sanitizers (VERDICT r2 item 4).

(a) NanGuardMode's default linker traces NaN/Inf/big checks INTO the
    single rewritten+fused+donated XLA program (SURVEY §7 stage 8);
(b) CompareMode/DualLinker runs that whole jitted program against the
    per-node py oracle every call and compares outputs + updates —
    the analogue of the reference's DualLinker (link/c/basic.py:1934).
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.debugmode import (
    BadJitProgramOutput,
    CompareMode,
    DualLinker,
)
from aesara_tpu.compile.function import function
from aesara_tpu.compile.nanguardmode import NanGuardError, NanGuardMode

rng = np.random.default_rng(11)


class TestJitPathNanGuard:
    def test_nan_inside_fused_program_caught(self):
        x = at.vector("x")
        # log fuses into the surrounding elemwise chain under FAST_RUN;
        # the NaN exists only inside the jitted program
        f = function([x], at.log(x) * 2.0 + 1.0, mode=NanGuardMode(True, True, True))
        assert getattr(f.fn, "jit_fn", None) is not None, "must be the jit path"
        np.testing.assert_allclose(
            np.asarray(f(np.array([1.0, np.e], "float32"))),
            [1.0, 3.0], rtol=1e-5)
        with pytest.raises(NanGuardError, match="NaN"):
            f(np.array([-1.0, 1.0], "float32"))

    def test_message_names_post_rewrite_node(self):
        x = at.vector("x")
        f = function([x], at.log(x) * 2.0, mode=NanGuardMode(True, True, True))
        with pytest.raises(NanGuardError, match="jit path"):
            f(np.array([-1.0], "float32"))

    def test_inf_and_big(self):
        x = at.vector("x")
        f = function([x], at.log(x), mode=NanGuardMode(True, True, True))
        with pytest.raises(NanGuardError, match="Inf"):
            f(np.array([0.0], "float32"))
        g = function([x], x * np.float32(1e9),
                     mode=NanGuardMode(True, True, True))
        with pytest.raises(NanGuardError, match="big value"):
            g(np.array([100.0], "float32"))

    def test_bad_function_input_caught(self):
        x = at.vector("x")
        f = function([x], x + 1.0, mode=NanGuardMode(True, True, True))
        with pytest.raises(NanGuardError, match="function input"):
            f(np.array([np.nan], "float32"))

    def test_flags_respected(self):
        x = at.vector("x")
        f = function([x], at.log(x), mode=NanGuardMode(False, False, False))
        res = np.asarray(f(np.array([-1.0], "float32")))
        assert np.isnan(res).all()  # all checks off: value passes through

    def test_guard_through_scan(self):
        # the scan node is ONE boundary in the outer program; a NaN
        # escaping the inner loop is caught at it
        from aesara_tpu.scan import scan

        x0 = at.vector("x0")
        outs, _ = scan(fn=lambda acc: at.log(acc) - 1.0,
                       outputs_info=[x0], n_steps=3)
        f = function([x0], outs[-1], mode=NanGuardMode(True, True, True))
        with pytest.raises(NanGuardError):
            f(np.array([0.5], "float32"))  # log(0.5)-1 < 0 → log(neg) = NaN

    def test_py_linker_option_still_eager(self):
        x = at.vector("x")
        f = function([x], at.log(x), mode=NanGuardMode(True, True, True,
                                                       linker="py"))
        assert getattr(f.fn, "jit_fn", None) is None
        with pytest.raises(NanGuardError):
            f(np.array([-1.0], "float32"))

    def test_updates_guarded(self):
        # a NaN appearing only in an update expression is caught too
        x = at.vector("x")
        w = atp.shared(np.ones(2, dtype="float32"), name="w")
        f = function([x], x.sum(), updates={w: at.log(x)},
                     mode=NanGuardMode(True, True, True))
        with pytest.raises(NanGuardError):
            f(np.array([-1.0, 1.0], "float32"))


class _LyingMul:
    """An op whose py oracle and XLA lowering deliberately disagree —
    the probe that proves the dual checker actually compares."""


def _make_lying_op():
    from aesara_tpu.graph.ir import Apply
    from aesara_tpu.graph.op import Op
    from aesara_tpu.link.jax.dispatch import jax_funcify

    class LyingMul(Op):
        __props__ = ()

        def make_node(self, x):
            from aesara_tpu.tensor.basic import as_tensor_variable

            x = as_tensor_variable(x)
            return Apply(self, [x], [x.type()])

        def perform(self, node, inputs, output_storage):
            output_storage[0][0] = np.asarray(inputs[0]) * 2.0

    @jax_funcify.register(LyingMul)
    def _(op, node=None, **kwargs):
        return lambda x: x * 3.0  # lies: jit says 3x, oracle says 2x

    return LyingMul()


class TestCompareMode:
    def test_honest_graph_passes(self):
        x = at.vector("x")
        w = atp.shared(np.ones(3, dtype="float32"), name="w")
        f = function([x], (x * w).sum(), updates={w: w + x},
                     mode=CompareMode())
        assert isinstance(f.mode.linker, DualLinker)
        r = f(np.array([1.0, 2.0, 3.0], "float32"))
        assert np.isclose(float(r), 6.0)
        np.testing.assert_allclose(w.get_value(), [2.0, 3.0, 4.0])

    def test_divergent_lowering_caught(self):
        op = _make_lying_op()
        x = at.vector("x")
        f = function([x], op(x), mode=CompareMode(optimizer=None))
        with pytest.raises(BadJitProgramOutput, match="disagree"):
            f(np.array([1.0, 2.0], "float32"))

    def test_divergent_update_caught(self):
        op = _make_lying_op()
        x = at.vector("x")
        w = atp.shared(np.ones(2, dtype="float32"), name="w")
        f = function([x], x.sum(), updates={w: op(x)},
                     mode=CompareMode(optimizer=None))
        with pytest.raises(BadJitProgramOutput, match="update"):
            f(np.array([1.0, 2.0], "float32"))

    def test_donation_does_not_corrupt_oracle(self):
        # the py oracle snapshots inputs BEFORE the jitted program runs
        # (donation may consume the primary buffers); repeated stateful
        # calls must keep passing
        x = at.vector("x")
        w = atp.shared(np.zeros(3, dtype="float32"), name="w")
        f = function([x], (w * 2.0).sum(), updates={w: w + x},
                     mode=CompareMode())
        for step in range(4):
            f(np.ones(3, "float32"))
        np.testing.assert_allclose(w.get_value(), 4.0)

    def test_compare_mode_by_name(self):
        x = at.vector("x")
        f = function([x], x * 2.0, mode="CompareMode")
        np.testing.assert_allclose(
            np.asarray(f(np.array([1.5], "float32"))), [3.0])
