"""Tail rings for nit-sot scan outputs (VERDICT r3 item 4).

The reference's ``save_mem_new_scan`` (``scan/rewriting.py:1176``)
truncates ALL output kinds, including nit-sots (map outputs).  Here a
nit-sot stacked output consumed only through ``x[-k:]``/``x[-j]`` turns
into a k-deep ring in the ``lax.scan`` carry (``ScanInfo.nit_tail_depths``)
— the map-output windowed-loss case (e.g. a loss computed over the last
k steps of a long horizon) stops allocating the (n_steps, ...) HBM stack.

TPU design note: nit-sots have no carried init, so the ring's row
shape/dtype comes from ``jax.eval_shape`` on the inner body (static-shape
abstract eval, no FLOPs), and pure ``x[-1]`` consumption becomes a
depth-1 ring (there is no final-only form without a carry).
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.scan import scan
from aesara_tpu.scan.op import Scan

rng = np.random.default_rng(11)


def _scan_nodes(f):
    return [n for n in f.fgraph.apply_nodes if isinstance(n.op, Scan)]


def _map_ref(sv):
    # the nit-sot body used throughout: per-step expression of the seq
    return np.tanh(sv) * 2.0


class TestNitTailTopology:
    def test_tail_slice_becomes_ring(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: at.tanh(a) * 2.0, sequences=[s],
                       outputs_info=[None], n_steps=16)
        f = function([s], outs[-4:].sum(), mode="FAST_RUN")
        nodes = _scan_nodes(f)
        assert nodes, "scan must survive"
        op = nodes[0].op
        assert op.info.nit_tail_depths == (4,)
        # the stacked (16,) buffer became a (4,) ring
        assert nodes[0].outputs[0].type.shape == (4,)

    def test_last_element_becomes_depth1_ring(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: a * 3.0, sequences=[s],
                       outputs_info=[None], n_steps=8)
        f = function([s], outs[-1], mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.nit_tail_depths == (1,)

    def test_mixed_consumers_max_depth(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: a + 1.0, sequences=[s],
                       outputs_info=[None], n_steps=8)
        f = function([s], outs[-1] * 2.0 + outs[-3:].sum(), mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.nit_tail_depths == (3,)

    def test_non_tail_consumer_blocks(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: a + 1.0, sequences=[s],
                       outputs_info=[None], n_steps=8)
        f = function([s], outs.sum(), mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert not any(op.info.nit_tail_depths)

    def test_full_depth_window_keeps_stack(self):
        # k == n_steps: the ring IS the stack — no rewrite
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: a + 1.0, sequences=[s],
                       outputs_info=[None], n_steps=8)
        f = function([s], outs[-8:].sum(), mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert not any(op.info.nit_tail_depths)

    def test_mixed_rec_and_nit_rings(self):
        # one sit-sot tail ring AND one nit-sot tail ring in the same scan
        s = at.vector("s", dtype="float64")
        (acc, mapped), _ = scan(
            fn=lambda a, acc: (acc * 0.9 + a, at.exp(a)),
            sequences=[s],
            outputs_info=[at.as_tensor_variable(np.float64(0.0)), None],
            n_steps=12,
        )
        f = function([s], acc[-2:].sum() + mapped[-5:].prod(),
                     mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.tail_depths == (2,)
        assert op.info.nit_tail_depths == (5,)


class TestNitTailValues:
    @pytest.mark.parametrize("mode", ["FAST_RUN", "PY"])
    @pytest.mark.parametrize("k", [1, 3, 7])
    def test_tail_window_matches_full_stack(self, mode, k):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: at.tanh(a) * 2.0, sequences=[s],
                       outputs_info=[None], n_steps=16)
        f = function([s], outs[-k:], mode=mode)
        sv = rng.normal(size=16)
        np.testing.assert_allclose(f(sv), _map_ref(sv)[-k:], rtol=1e-6)

    @pytest.mark.parametrize("mode", ["FAST_RUN", "PY"])
    @pytest.mark.parametrize("j", [1, 2, 5])
    def test_negative_element_matches(self, mode, j):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: at.tanh(a) * 2.0, sequences=[s],
                       outputs_info=[None], n_steps=16)
        f = function([s], outs[-j], mode=mode)
        sv = rng.normal(size=16)
        np.testing.assert_allclose(f(sv), _map_ref(sv)[-j], rtol=1e-6)

    def test_matrix_rows_ring(self):
        # nit rows with extra dims: ring rows are (3,)-vectors
        s = at.matrix("s", dtype="float64")
        outs, _ = scan(fn=lambda a: a * a, sequences=[s],
                       outputs_info=[None], n_steps=10)
        f = function([s], outs[-4:], mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.nit_tail_depths == (4,)
        sv = rng.normal(size=(10, 3))
        np.testing.assert_allclose(f(sv), (sv * sv)[-4:], rtol=1e-6)

    def test_grad_through_tail_window(self):
        # grad is built BEFORE scan_save_mem fires (compile pipeline), so
        # d(sum(mapped[-k:]))/ds must match the dense formulation even
        # though the compiled forward uses a ring
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: at.tanh(a) * 2.0, sequences=[s],
                       outputs_info=[None], n_steps=16)
        loss = outs[-4:].sum()
        g = atp.grad(loss, s)
        f = function([s], g, mode="FAST_RUN")
        sv = rng.normal(size=16)
        expected = np.zeros(16)
        expected[-4:] = 2.0 * (1.0 - np.tanh(sv[-4:]) ** 2)
        np.testing.assert_allclose(f(sv), expected, rtol=1e-6)

    def test_grad_windowed_loss_with_recurrence(self):
        # windowed loss over a map output of a recurrent quantity: the
        # common long-horizon BPTT shape this transform exists for
        s = at.vector("s", dtype="float64")
        (acc, sq), _ = scan(
            fn=lambda a, acc: (acc * 0.5 + a, (acc * 0.5 + a) ** 2),
            sequences=[s],
            outputs_info=[at.as_tensor_variable(np.float64(0.0)), None],
            n_steps=12,
        )
        loss = sq[-3:].sum()
        g = atp.grad(loss, s)
        f_ring = function([s], [loss, g], mode="FAST_RUN")
        # dense oracle in py mode without the rewrite
        f_py = function([s], [loss, g], mode="PY")
        sv = rng.normal(size=12)
        lr, gr = f_ring(sv)
        lp, gp = f_py(sv)
        np.testing.assert_allclose(lr, lp, rtol=1e-6)
        np.testing.assert_allclose(gr, gp, rtol=1e-6)

    def test_updates_and_shared_unaffected(self):
        # nit ring coexists with shared-state updates
        w = atp.shared(np.float64(1.0), name="w")
        s = at.vector("s", dtype="float64")
        outs, updates = scan(
            fn=lambda a: a * w, sequences=[s], outputs_info=[None],
            n_steps=6,
        )
        f = function([s], outs[-2:], updates=[(w, w + 1.0)],
                     mode="FAST_RUN")
        sv = rng.normal(size=6)
        np.testing.assert_allclose(f(sv), sv[-2:] * 1.0, rtol=1e-6)
        np.testing.assert_allclose(f(sv), sv[-2:] * 2.0, rtol=1e-6)


class TestNitTailHBM:
    def test_compiled_buffer_is_ring_sized(self):
        # the (n_steps, d) stack must not exist in the compiled program:
        # peak temp for the scanned output is (k, d)
        s = at.matrix("s", dtype="float64")
        outs, _ = scan(fn=lambda a: at.tanh(a), sequences=[s],
                       outputs_info=[None], n_steps=256)
        f = function([s], outs[-2:].sum(), mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.nit_tail_depths == (2,)
        out_t = _scan_nodes(f)[0].outputs[0].type
        assert out_t.shape[0] == 2
        sv = rng.normal(size=(256, 8))
        np.testing.assert_allclose(
            float(f(sv)), float(np.tanh(sv)[-2:].sum()), rtol=1e-5
        )
