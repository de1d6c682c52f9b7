"""Tail-window scan_save_mem (VERDICT r2 item 5).

The reference's ``save_mem_new_scan`` (``scan/rewriting.py:1176``)
truncates stacked scan buffers for arbitrary tail windows.  Here a
``stacked[-k:]`` (or ``stacked[-j]``) consumer set turns the stacked
(n_steps, ...) output into a k-deep ring carried inside ``lax.scan``
(``ScanInfo.tail_depths``).
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


def _np_ewma(sv, decay=0.9, init=0.0):
    acc, hist = init, []
    for a in sv:
        acc = acc * decay + a
        hist.append(acc)
    return hist


class TestTailTopology:
    def test_tail_slice_shrinks_buffer(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc * 0.9 + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=16)
        f = function([s], outs[-4:].sum(), mode="FAST_RUN")
        nodes = _scan_nodes(f)
        assert nodes, "scan must survive"
        op = nodes[0].op
        assert op.info.tail_depths == (4,)
        # the stacked (16,) buffer became a (4,) ring
        assert nodes[0].outputs[0].type.shape == (4,)

    def test_pure_final_still_uses_final_only(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=8)
        f = function([s], outs[-1], mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.final_only == (True,)
        assert not any(op.info.tail_depths)

    def test_negative_element_index(self):
        # x[-3] needs only a 3-deep ring, not the full stack
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=10)
        f = function([s], outs[-3] * 2.0, mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.tail_depths == (3,)

    def test_mixed_consumers_max_depth(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=8)
        f = function([s], outs[-1] * 2.0 + outs[-2:].sum(), mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.tail_depths == (2,)

    def test_non_tail_consumer_blocks(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=8)
        f = function([s], outs[-2:].sum() + outs[0], mode="FAST_RUN",
                     on_unused_input="ignore")
        op = _scan_nodes(f)[0].op
        assert not any(op.info.tail_depths)  # full stack kept

    def test_symbolic_n_steps_blocks_ring(self):
        # ring exactness needs a static trip count ≥ k
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))])
        f = function([s], outs[-2:].sum(), mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert not any(op.info.tail_depths)


class TestTailValues:
    def test_ewma_window_matches_py(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc * 0.9 + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=16)
        win = outs[-4:]
        fj = function([s], win, mode="FAST_RUN")
        fp = function([s], win, mode="PY")
        sv = rng.normal(size=16)
        np.testing.assert_allclose(
            np.asarray(fj(sv)), np.asarray(fp(sv)), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(fj(sv)), _np_ewma(sv)[-4:], rtol=1e-6)

    def test_mixed_consumer_values(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=8)
        expr = outs[-1] * 2.0 + outs[-2:].sum() + outs[-2]
        f = function([s], expr, mode="FAST_RUN")
        sv = rng.normal(size=8)
        h = np.cumsum(sv)
        ref = h[-1] * 2.0 + h[-2:].sum() + h[-2]
        np.testing.assert_allclose(float(f(sv)), ref, rtol=1e-6)

    def test_window_equals_full_depth(self):
        # k == n_steps: the ring is the whole (small) history
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a, acc: acc + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=4)
        f = function([s], outs[-4:], mode="FAST_RUN")
        sv = rng.normal(size=4)
        np.testing.assert_allclose(np.asarray(f(sv)), np.cumsum(sv),
                                   rtol=1e-6)

    def test_window_with_inner_index(self):
        # stacked[-2:, 0]: the extra index re-applies inside the ring
        s = at.matrix("s", dtype="float64")
        init = at.as_tensor_variable(np.zeros(3))
        outs, _ = scan(fn=lambda a, acc: acc + a, sequences=[s],
                       outputs_info=[init], n_steps=5)
        f = function([s], outs[-2:, 0], mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.tail_depths == (2,)
        sv = rng.normal(size=(5, 3))
        h = np.cumsum(sv, axis=0)
        np.testing.assert_allclose(np.asarray(f(sv)), h[-2:, 0], rtol=1e-6)

    def test_mit_sot_tail_window(self):
        # Fibonacci-ish mit-sot with taps [-2, -1], consumed via [-3:]
        s = at.vector("s", dtype="float64")
        init = at.as_tensor_variable(np.array([1.0, 1.0]))
        outs, _ = scan(
            fn=lambda a, m2, m1: m2 + m1 + a,
            sequences=[s],
            outputs_info=[{"initial": init, "taps": [-2, -1]}],
            n_steps=7,
        )
        f = function([s], outs[-3:], mode="FAST_RUN")
        op = _scan_nodes(f)[0].op
        assert op.info.tail_depths == (3,)
        sv = rng.normal(size=7)
        m2, m1, hist = 1.0, 1.0, []
        for a in sv:
            v = m2 + m1 + a
            hist.append(v)
            m2, m1 = m1, v
        np.testing.assert_allclose(np.asarray(f(sv)), hist[-3:], rtol=1e-6)

    def test_bptt_windowed_loss_grad(self):
        # grads are built BEFORE save-mem fires; the rewrite then applies
        # to the grad graph's scans where legal — end-to-end value check
        s = at.vector("s", dtype="float64")
        w = atp.shared(np.float64(0.8), name="w")
        outs, _ = scan(fn=lambda a, acc: acc * w + a, sequences=[s],
                       outputs_info=[at.as_tensor_variable(np.float64(0.0))],
                       n_steps=12)
        loss = (outs[-3:] ** 2).sum()
        g = atp.grad(loss, w)
        fj = function([s], [loss, g], mode="FAST_RUN")
        fp = function([s], [loss, g], mode="PY")
        sv = rng.normal(size=12)
        lj, gj = fj(sv)
        lp, gp = fp(sv)
        np.testing.assert_allclose(float(lj), float(lp), rtol=1e-6)
        np.testing.assert_allclose(float(gj), float(gp), rtol=1e-6)


class TestFullTailWindow:
    def test_full_depth_window_grad_compiles_and_matches(self):
        """hs[-T:] (the covering tail) + grad: regression for fuzz seed
        7026 — the surviving covering-slice IncSubtensor lowered to a
        degenerate whole-array XLA scatter that CHECK-crashed XLA:CPU's
        algebraic simplifier (hard process abort).  Fixes: covering
        negative slices normalize to slice(None); the useless-set rule
        reruns at specialize (after inc->set conversion) and accepts a
        prefix of full slices; the depth-1 grad-ring shift avoids the
        empty-slice join."""
        from tests.rewrite_corpus import py_mode

        h0 = at.vector("h0", dtype="float64")
        w = at.matrix("w", dtype="float64")
        hs, _ = scan(
            lambda h: at.math.sigmoid(at.dot(h, w)) + h * 0.1,
            outputs_info=[h0], n_steps=3,
        )
        out = at.sum(hs[-3:] ** 2)
        from aesara_tpu.gradient import grad as _grad

        g = _grad(out, [h0, w])
        f = function([h0, w], [out] + g, mode="FAST_RUN")
        fp = function([h0, w], [out] + g, mode=py_mode)
        hv, wv = np.ones(4) * 0.1, np.eye(4) * 0.3
        for a, b in zip(f(hv, wv), fp(hv, wv)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9)

    @pytest.mark.parametrize("seed", range(8))
    def test_fuzz_scan_windows_with_grads(self, seed):
        """Random scan window consumers (x[-k:], x[-j], mixes incl.
        k == T) with gradients: FAST_RUN == PY (a 120-seed offline
        sweep of this generator runs clean)."""
        from aesara_tpu.gradient import grad as _grad
        from tests.rewrite_corpus import py_mode

        fns = [
            lambda h, w: at.tanh(at.dot(h, w)),
            lambda h, w: h * 0.9 + at.sum(w) * 0.01,
            lambda h, w: at.math.sigmoid(at.dot(h, w)) + h * 0.1,
            lambda h, w: at.math.maximum(h - 0.05, at.dot(h, w) * 0.1),
        ]
        rng = np.random.default_rng(7000 + seed)
        D = int(rng.integers(2, 5))
        T = int(rng.integers(3, 9))
        fn = fns[seed % len(fns)]
        h0 = at.vector("h0", dtype="float64")
        w = at.matrix("w", dtype="float64")
        hs, _ = scan(lambda h: fn(h, w), outputs_info=[h0], n_steps=T)
        mode_k = rng.integers(0, 4)
        if mode_k == 0:
            out = at.sum(hs[-1] ** 2)
        elif mode_k == 1:
            k = int(rng.integers(1, T + 1))
            out = at.sum(hs[-k:] ** 2)
        elif mode_k == 2:
            j = int(rng.integers(1, T + 1))
            out = at.sum(hs[-j] ** 2)
        else:
            k = int(rng.integers(1, T))
            out = at.sum(hs[-k:] ** 2) + at.sum(hs[-1])
        g = _grad(out, [h0, w])
        f = function([h0, w], [out] + g, mode="FAST_RUN")
        fp = function([h0, w], [out] + g, mode=py_mode)
        hv = rng.normal(size=D) * 0.5
        wv = rng.normal(size=(D, D)) * 0.4
        for a, b in zip(f(hv, wv), fp(hv, wv)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10
            )
