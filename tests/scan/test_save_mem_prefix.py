"""Prefix/step truncation for scan_save_mem (VERDICT r4 item 3).

The reference's ``save_mem_new_scan`` (``scan/rewriting.py:1176`` with
stop extraction at ``:1318-1323``) shortens BOTH the stacked buffer and
the trip count when outer consumers read only a static prefix window:
a 10,000-step scan whose output feeds ``x[:10]`` runs 10 steps.  Here
``scan_save_mem_prefix`` (``aesara_tpu/scan/rewriting.py``) rebuilds the
Scan with a smaller constant ``n_steps`` — the stacked output's static
leading dim literally shrinks, so the XLA program's HBM buffer does too.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.scan import scan
from aesara_tpu.scan.op import Scan

rng = np.random.default_rng(5)


def _scan_nodes(f):
    return [n for n in f.fgraph.apply_nodes if isinstance(n.op, Scan)]


def _n_steps_of(f):
    from aesara_tpu.tensor.basic import get_scalar_constant_value

    (node,) = _scan_nodes(f)
    return int(get_scalar_constant_value(node.inputs[0]))


def _cumsum_ref(x0, n):
    # sit-sot body y_{t} = y_{t-1} + t used throughout
    out = []
    y = x0
    for t in range(n):
        y = y + 1.0
        out.append(y)
    return np.array(out)


class TestPrefixTopology:
    def test_prefix_slice_truncates_n_steps(self):
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda y: y + 1.0, outputs_info=[x0], n_steps=1000)
        f = function([x0], ys[:10].sum(), mode="FAST_RUN")
        assert _n_steps_of(f) == 10
        assert np.isclose(f(0.0), _cumsum_ref(0.0, 10)[:10].sum())

    def test_single_element_truncates(self):
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda y: y * 2.0, outputs_info=[x0], n_steps=64)
        f = function([x0], ys[5], mode="FAST_RUN")
        assert _n_steps_of(f) == 6
        assert np.isclose(f(3.0), 3.0 * 2.0 ** 6)

    def test_middle_window_truncates_to_stop(self):
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda y: y + 2.0, outputs_info=[x0], n_steps=100)
        f = function([x0], ys[3:7].sum(), mode="FAST_RUN")
        assert _n_steps_of(f) == 7
        expect = np.array([2.0 * (t + 1) for t in range(100)])[3:7].sum()
        assert np.isclose(f(0.0), expect)

    def test_nit_sot_prefix_truncates(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: at.tanh(a), sequences=[s],
                       outputs_info=[None], n_steps=32)
        f = function([s], outs[:4].sum(), mode="FAST_RUN")
        assert _n_steps_of(f) == 4
        sv = rng.normal(size=32)
        assert np.isclose(f(sv), np.tanh(sv[:4]).sum())

    def test_two_outputs_take_max_need(self):
        x0 = at.scalar("x0", dtype="float64")
        z0 = at.scalar("z0", dtype="float64")

        def step(y, z):
            return y + 1.0, z * 2.0

        (ys, zs), _ = scan(fn=step, outputs_info=[x0, z0], n_steps=50)
        f = function([x0, z0], ys[:5].sum() + zs[8], mode="FAST_RUN")
        assert _n_steps_of(f) == 9
        got = f(0.0, 1.0)
        assert np.isclose(got, _cumsum_ref(0.0, 5).sum() + 2.0 ** 9)

    def test_final_consumer_blocks_truncation(self):
        # x[-1] needs the full trip count: it becomes final_only, and the
        # prefix rule must NOT shorten the run
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda y: y + 1.0, outputs_info=[x0], n_steps=40)
        f = function([x0], ys[:3].sum() + ys[-1], mode="FAST_RUN")
        assert _n_steps_of(f) == 40
        assert np.isclose(f(0.0), (1.0 + 2.0 + 3.0) + 40.0)

    def test_full_read_blocks_truncation(self):
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda y: y + 1.0, outputs_info=[x0], n_steps=12)
        f = function([x0], ys.sum(), mode="FAST_RUN")
        assert _n_steps_of(f) == 12

    def test_shared_update_blocks_truncation(self):
        # the scan threads a shared update: its final value depends on
        # every step, so the trip count must stay
        w = atp.shared(np.float64(0.0), name="w")
        x0 = at.scalar("x0", dtype="float64")

        def step(y):
            return y + 1.0, {w: w + y}

        ys, updates = scan(fn=step, outputs_info=[x0], n_steps=20)
        f = function([x0], ys[:2].sum(), updates=updates, mode="FAST_RUN")
        assert _n_steps_of(f) == 20
        f(0.0)
        # w accumulated across ALL 20 steps
        assert np.isclose(w.get_value(), np.sum(np.arange(20.0)))

    def test_while_scan_not_truncated(self):
        from aesara_tpu.scan import until

        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda y: (y + 1.0, until(y > 100.0)),
                     outputs_info=[x0], n_steps=200)
        # topology only (reading a while-scan's stack is itself an XLA
        # lowering limit): run the rule directly on the graph
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.graph.rewriting.basic import in2out
        from aesara_tpu.scan.rewriting import scan_save_mem_prefix

        fg = FunctionGraph(outputs=[ys[0]], clone=True)
        in2out(scan_save_mem_prefix).rewrite(fg)
        (node,) = [n for n in fg.apply_nodes if isinstance(n.op, Scan)]
        from aesara_tpu.tensor.basic import get_scalar_constant_value

        # while-scans have data-dependent trip counts; n_steps unchanged
        assert int(get_scalar_constant_value(node.inputs[0])) == 200

    def test_symbolic_n_steps_not_truncated(self):
        n = at.iscalar("n")
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda y: y + 1.0, outputs_info=[x0], n_steps=n)
        # n_steps not static: the rule must not fire (and PY mode runs it
        # correctly; symbolic trip counts don't lower to XLA at all)
        f = function([n, x0], ys[:3].sum(), mode="FAST_RUN")
        with pytest.raises(Exception):
            _n_steps_of(f)  # still symbolic — not a constant
        f_py = function([n, x0], ys[:3].sum(), mode="PY")
        assert np.isclose(f_py(10, 0.0), 1.0 + 2.0 + 3.0)


class TestPrefixValues:
    def test_sequence_driven_prefix(self):
        s = at.matrix("s", dtype="float64")
        x0 = at.vector("x0", dtype="float64")
        ys, _ = scan(fn=lambda sv, y: y * 0.5 + sv, sequences=[s],
                     outputs_info=[x0], n_steps=64)
        f = function([s, x0], ys[:6], mode="FAST_RUN")
        assert _n_steps_of(f) == 6
        sv = rng.normal(size=(64, 3))
        x0v = rng.normal(size=3)
        y = x0v
        expect = []
        for t in range(6):
            y = y * 0.5 + sv[t]
            expect.append(y)
        np.testing.assert_allclose(f(sv, x0v), np.array(expect))

    def test_value_matches_py_mode(self):
        s = at.vector("s", dtype="float64")
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda sv, y: at.tanh(y + sv), sequences=[s],
                     outputs_info=[x0], n_steps=128)
        out = ys[:7] * 2.0
        f_fast = function([s, x0], out, mode="FAST_RUN")
        f_py = function([s, x0], out, mode="PY")
        assert _n_steps_of(f_fast) == 7
        sv = rng.normal(size=128)
        np.testing.assert_allclose(f_fast(sv, 0.1), f_py(sv, 0.1),
                                   rtol=1e-12)

    def test_grad_of_prefix_loss_correct(self):
        # with a gradient in the graph the forward stack feeds the
        # reverse scan — the rule must not mis-truncate, and values must
        # match PY mode exactly
        from aesara_tpu.gradient import grad

        s = at.vector("s", dtype="float64")
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda sv, y: at.tanh(y + sv), sequences=[s],
                     outputs_info=[x0], n_steps=32)
        loss = (ys[:5] ** 2).sum()
        g = grad(loss, x0)
        f_fast = function([s, x0], g, mode="FAST_RUN")
        f_py = function([s, x0], g, mode="PY")
        sv = rng.normal(size=32)
        np.testing.assert_allclose(f_fast(sv, 0.3), f_py(sv, 0.3),
                                   rtol=1e-10)

    def test_mit_sot_prefix(self):
        # two-tap recurrence consumed at a prefix
        x0 = at.vector("x0", dtype="float64")
        ys, _ = scan(
            fn=lambda ym2, ym1: ym1 + ym2,
            outputs_info=[{"initial": x0, "taps": [-2, -1]}],
            n_steps=500,
        )
        f = function([x0], ys[:8], mode="FAST_RUN")
        assert _n_steps_of(f) == 8
        fib = [1.0, 1.0]
        for _ in range(8):
            fib.append(fib[-1] + fib[-2])
        np.testing.assert_allclose(f(np.array([1.0, 1.0])), fib[2:10])

    def test_static_output_shape_shrinks(self):
        x0 = at.scalar("x0", dtype="float64")
        ys, _ = scan(fn=lambda y: y + 1.0, outputs_info=[x0], n_steps=4096)
        f = function([x0], ys[:16], mode="FAST_RUN")
        (node,) = _scan_nodes(f)
        # the HBM buffer is literally (16,), not (4096,)
        assert node.outputs[0].type.shape == (16,)
