"""Scan rewrite corpus, part 2: sequence pushout, save-mem tap mixes,
RNG interaction, and rewrite composition — extending
``test_rewriting_corpus.py`` toward the reference suite's breadth
(``/root/reference/tests/scan/test_rewriting.py``, 1,684 LoC).  Design
notes asserted here (TPU-first deviations from the reference):
- ``scan_pushout_seqs`` hoists only MXU-batchable dot chains; pure
  elemwise stays in the body (XLA fuses it for free; hoisting would
  materialize a (T, ...) HBM buffer) — ``scan/rewriting.py:515``.
- ``scan_save_mem`` shrinks stacked buffers to k-deep carry rings for
  ``stacked[-k:]`` consumers — ``scan/rewriting.py:54``.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.scan.basic import scan
from aesara_tpu.scan.op import Scan

rng = np.random.default_rng(20260821)


def _scan_nodes(f):
    return [n for n in f.fgraph.apply_nodes if isinstance(n.op, Scan)]


def _inner_labels(scan_node):
    labels = []
    for n in scan_node.op.fgraph.apply_nodes:
        labels.append(type(n.op).__name__)
        sop = getattr(n.op, "scalar_op", None)
        if sop is not None:
            labels.append(type(sop).__name__)
    return labels


def _f64(*shape):
    return rng.normal(size=shape) * 0.5


class TestSeqPushout:
    def test_dot_of_sequence_hoisted_as_batched_matmul(self):
        # y_t = tanh(dot(x_t, W) + h*0.1): the dot is seq-applied and
        # state-free, so it leaves the loop as ONE (T,B,H) batched matmul
        X = at.tensor3("X", dtype="float64")
        W = at.matrix("W", dtype="float64")
        h0 = at.matrix("h0", dtype="float64")

        def step(x_t, h):
            return at.tanh(at.dot(x_t, W)) + h * 0.1

        hs, _ = scan(step, sequences=[X], outputs_info=[h0])
        f = function([X, W, h0], hs, mode="FAST_RUN")
        (sn,) = _scan_nodes(f)
        assert "Dot" not in _inner_labels(sn) and "Gemm" not in _inner_labels(sn)
        fp = function([X, W, h0], hs, mode="PY")
        args = (_f64(5, 2, 3), _f64(3, 4), _f64(2, 4))
        np.testing.assert_allclose(
            np.asarray(f(*args)), np.asarray(fp(*args)), rtol=1e-9
        )

    def test_pure_elemwise_of_sequence_stays_in_body(self):
        # TPU design: hoisting elemwise would materialize a (T,...) HBM
        # buffer for work XLA fuses into the body for free
        X = at.matrix("X", dtype="float64")
        h0 = at.vector("h0", dtype="float64")

        def step(x_t, h):
            return h * 0.9 + at.tanh(x_t) * 0.1

        hs, _ = scan(step, sequences=[X], outputs_info=[h0])
        f = function([X, h0], hs, mode="FAST_RUN")
        (sn,) = _scan_nodes(f)
        labels = _inner_labels(sn)
        assert "Tanh" in labels or "Composite" in labels

    def test_state_entangled_dot_stays(self):
        X = at.tensor3("X", dtype="float64")
        W = at.matrix("W", dtype="float64")
        h0 = at.matrix("h0", dtype="float64")

        def step(x_t, h):
            return at.tanh(at.dot(x_t + h, W))  # h enters the dot operand

        hs, _ = scan(step, sequences=[X], outputs_info=[h0])
        f = function([X, W, h0], hs, mode="FAST_RUN")
        (sn,) = _scan_nodes(f)
        labels = _inner_labels(sn)
        assert "Dot" in labels or "Gemm" in labels or "Dot22" in labels

    def test_hoisted_dot_with_longer_sequence_window(self):
        # sequences longer than n_steps: the hoisted batched dot must
        # align on exactly the consumed window
        X = at.tensor3("X", dtype="float64")
        W = at.matrix("W", dtype="float64")
        h0 = at.matrix("h0", dtype="float64")

        def step(x_t, h):
            return at.dot(x_t, W) + h * 0.5

        hs, _ = scan(step, sequences=[X], outputs_info=[h0], n_steps=3)
        f = function([X, W, h0], hs, mode="FAST_RUN")
        fp = function([X, W, h0], hs, mode="PY")
        args = (_f64(7, 2, 3), _f64(3, 4), _f64(2, 4))  # T=7 > n_steps=3
        a, b = np.asarray(f(*args)), np.asarray(fp(*args))
        assert a.shape[0] == 3
        np.testing.assert_allclose(a, b, rtol=1e-9)

    def test_two_sequences_one_hoistable(self):
        X = at.tensor3("X", dtype="float64")
        M = at.matrix("M", dtype="float64")  # (T, H) gate sequence
        W = at.matrix("W", dtype="float64")
        h0 = at.matrix("h0", dtype="float64")

        def step(x_t, m_t, h):
            return at.dot(x_t, W) * m_t + h * 0.1

        hs, _ = scan(step, sequences=[X, M], outputs_info=[h0])
        f = function([X, M, W, h0], hs, mode="FAST_RUN")
        fp = function([X, M, W, h0], hs, mode="PY")
        args = (_f64(4, 2, 3), _f64(4, 4), _f64(3, 4), _f64(2, 4))
        np.testing.assert_allclose(
            np.asarray(f(*args)), np.asarray(fp(*args)), rtol=1e-9
        )
        (sn,) = _scan_nodes(f)
        assert "Dot" not in _inner_labels(sn)

    def test_pushout_grad_through_hoisted_dot(self):
        X = at.tensor3("X", dtype="float64")
        W = at.matrix("W", dtype="float64")
        h0 = at.matrix("h0", dtype="float64")

        def step(x_t, h):
            return at.tanh(at.dot(x_t, W) + h * 0.2)

        hs, _ = scan(step, sequences=[X], outputs_info=[h0])
        cost = at.sum(hs ** 2)
        gW, gX = grad(cost, [W, X])
        f = function([X, W, h0], [gW, gX], mode="FAST_RUN")
        fp = function([X, W, h0], [gW, gX], mode="PY")
        args = (_f64(5, 2, 3), _f64(3, 4), _f64(2, 4))
        for a, b in zip(f(*args), fp(*args)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


class TestSaveMemTapMixes:
    def _count_scan_buffer_dim0(self, f):
        """Static first-dim of each Scan output type (None = full T)."""
        (sn,) = _scan_nodes(f)
        return [o.type.shape[0] if o.type.ndim else None for o in sn.outputs]

    @pytest.mark.parametrize("k", [1, 2, 4])
    def test_one_windowed_one_full_output(self, k):
        # two nit-sot outputs: one consumed as [-k:], one fully — only
        # the windowed buffer shrinks
        x0 = at.vector("x0", dtype="float64")

        def step(h):
            return h * 0.9, at.sum(h) + at.zeros((1,), dtype="float64")

        (hs, ss), _ = scan(step, outputs_info=[x0, None], n_steps=8)
        out_win = hs[-k:]
        out_full = at.sum(ss)
        f = function([x0], [out_win, out_full], mode="FAST_RUN")
        fp = function([x0], [out_win, out_full], mode="PY")
        v = _f64(5)
        for a, b in zip(f(v), fp(v)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)

    def test_window_deeper_than_steps_stays_full(self):
        x0 = at.vector("x0", dtype="float64")
        hs, _ = scan(lambda h: h * 0.9, outputs_info=[x0], n_steps=3)
        out = hs[-5:]  # deeper than T=3
        f = function([x0], out, mode="FAST_RUN")
        fp = function([x0], out, mode="PY")
        v = _f64(4)
        np.testing.assert_allclose(np.asarray(f(v)), np.asarray(fp(v)), rtol=1e-10)

    @pytest.mark.parametrize("idx", [-1, -2])
    def test_single_negative_index(self, idx):
        x0 = at.vector("x0", dtype="float64")
        hs, _ = scan(lambda h: at.tanh(h) * 1.1, outputs_info=[x0], n_steps=6)
        out = hs[idx]
        f = function([x0], out, mode="FAST_RUN")
        fp = function([x0], out, mode="PY")
        v = _f64(4)
        np.testing.assert_allclose(np.asarray(f(v)), np.asarray(fp(v)), rtol=1e-10)

    def test_window_then_grad(self):
        x0 = at.vector("x0", dtype="float64")
        W = at.matrix("W", dtype="float64")
        hs, _ = scan(lambda h: at.tanh(at.dot(h, W)), outputs_info=[x0],
                     n_steps=7)
        cost = at.sum(hs[-2:] ** 2)
        gW = grad(cost, W)
        f = function([x0, W], gW, mode="FAST_RUN")
        fp = function([x0, W], gW, mode="PY")
        args = (_f64(3), _f64(3, 3))
        np.testing.assert_allclose(
            np.asarray(f(*args)), np.asarray(fp(*args)), rtol=1e-8
        )


class TestRngThreading:
    def test_pushout_keeps_per_step_noise_fresh(self):
        # rewrites must not collapse per-step RNG draws into one draw
        from aesara_tpu.tensor.random.utils import RandomStream

        srng = RandomStream(seed=7)
        h0 = at.vector("h0", dtype="float64")

        def step(h):
            eps = srng.normal(size=(4,), dtype="float64")
            return h * 0.5 + eps

        hs, updates = scan(step, outputs_info=[h0], n_steps=6)
        f = function([h0], hs, updates=updates, mode="FAST_RUN")
        out = np.asarray(f(np.zeros(4)))
        # consecutive steps see different noise
        diffs = np.abs(np.diff(out, axis=0)).sum(axis=1)
        assert np.all(diffs > 1e-8), out

    def test_closure_captured_draw_is_loop_invariant(self):
        from aesara_tpu.tensor.random.utils import RandomStream

        srng = RandomStream(seed=7)
        noise = srng.normal(size=(4,), dtype="float64")  # OUTSIDE fn
        h0 = at.vector("h0", dtype="float64")

        def step(h):
            return h * 0.0 + noise  # same draw every step

        hs, updates = scan(step, outputs_info=[h0], n_steps=5)
        f = function([h0], hs, updates=updates, mode="FAST_RUN")
        out = np.asarray(f(np.zeros(4)))
        np.testing.assert_allclose(out[0], out[-1], rtol=1e-12)


class TestComposition:
    def test_merge_then_pushout(self):
        # two mergeable scans, each with a hoistable dot: after merge +
        # pushout there is ONE scan with no inner dot
        X = at.tensor3("X", dtype="float64")
        W = at.matrix("W", dtype="float64")
        a0 = at.matrix("a0", dtype="float64")
        b0 = at.matrix("b0", dtype="float64")

        s1, _ = scan(lambda x_t, h: at.dot(x_t, W) + h * 0.1,
                     sequences=[X], outputs_info=[a0])
        s2, _ = scan(lambda x_t, h: at.dot(x_t, W) * 0.5 + h * 0.2,
                     sequences=[X], outputs_info=[b0])
        out = at.sum(s1) + at.sum(s2)
        f = function([X, W, a0, b0], out, mode="FAST_RUN")
        sns = _scan_nodes(f)
        assert len(sns) == 1
        assert "Dot" not in _inner_labels(sns[0])
        fp = function([X, W, a0, b0], out, mode="PY")
        args = (_f64(4, 2, 3), _f64(3, 4), _f64(2, 4), _f64(2, 4))
        np.testing.assert_allclose(float(f(*args)), float(fp(*args)), rtol=1e-9)

    def test_save_mem_after_merge(self):
        x0 = at.vector("x0", dtype="float64")
        s1, _ = scan(lambda h: h * 0.9, outputs_info=[x0], n_steps=6)
        s2, _ = scan(lambda h: h + 1.0, outputs_info=[x0], n_steps=6)
        out = at.sum(s1[-1]) + at.sum(s2[-2:])
        f = function([x0], out, mode="FAST_RUN")
        fp = function([x0], out, mode="PY")
        v = _f64(3)
        np.testing.assert_allclose(float(f(v)), float(fp(v)), rtol=1e-10)

    def test_unused_output_then_window(self):
        x0 = at.vector("x0", dtype="float64")

        def step(h):
            return h * 0.9, h * 123.0  # second output never consumed

        (hs, dead), _ = scan(step, outputs_info=[x0, None], n_steps=6)
        out = hs[-1]
        f = function([x0], out, mode="FAST_RUN")
        fp = function([x0], out, mode="PY")
        v = _f64(3)
        np.testing.assert_allclose(np.asarray(f(v)), np.asarray(fp(v)), rtol=1e-10)

    def test_taps_with_window_consumer(self):
        # mit-sot (taps -2,-1) stacked output consumed as a tail window
        x0 = at.matrix("x0", dtype="float64")  # (2, D) initial taps

        def step(hm2, hm1):
            return hm1 * 0.6 + hm2 * 0.4

        hs, _ = scan(step, outputs_info=[dict(initial=x0, taps=[-2, -1])],
                     n_steps=7)
        out = hs[-3:]
        f = function([x0], out, mode="FAST_RUN")
        fp = function([x0], out, mode="PY")
        v = _f64(2, 4)
        np.testing.assert_allclose(np.asarray(f(v)), np.asarray(fp(v)), rtol=1e-10)

    def test_while_scan_composes_with_outer_rewrites(self):
        x0 = at.scalar("x0", dtype="float64")

        def step(x):
            from aesara_tpu.scan.basic import until

            return x * 1.5, until(x > 10.0)

        xs, _ = scan(step, outputs_info=[x0], n_steps=50)
        out = (xs[-1] * 1.0) + 0.0  # outer algebra around a while-scan
        f = function([x0], out, mode="FAST_RUN")
        fp = function([x0], out, mode="PY")
        np.testing.assert_allclose(float(f(1.0)), float(fp(1.0)), rtol=1e-12)
