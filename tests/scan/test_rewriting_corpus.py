"""Scan rewrite behavior-spec corpus: broader operand-pattern coverage.

Re-expresses the reference's ``tests/scan/test_rewriting.py`` (1,684 LoC)
methodology against this pack: each scan rewrite (pushout non-seqs /
seqs / sum, merge, remove-constants-and-unused, merge-inouts, save-mem,
identity-nitsot) exercised over taps/dtype/shape/grad variants with
topology (ScanInfo field) + value assertions.  Rules:
``aesara_tpu/scan/rewriting.py`` (reference
``/root/reference/aesara/scan/rewriting.py``).
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.scan.basic import scan
from aesara_tpu.scan.op import Scan

rng = np.random.default_rng(20260820)


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


# ---------------------------------------------------------------------------
# pushout of loop-invariant work
# ---------------------------------------------------------------------------


class TestPushout:
    @pytest.mark.parametrize("T,D,H", [(5, 3, 4), (8, 2, 2), (3, 6, 5)])
    def test_invariant_dot_leaves_loop(self, T, D, H):
        X = at.tensor3("X", dtype="float64")  # (T, B, D)
        W = at.matrix("W", dtype="float64")  # (D, H)
        h, _ = scan(lambda xt, Wv: at.tanh(at.dot(xt, Wv)),
                    sequences=[X], non_sequences=[W])
        f = function([X, W], h, mode="FAST_RUN")
        # the dot hoists out; pushing the remaining elemwise out too may
        # eliminate the scan completely — both are wins, but no surviving
        # scan may contain the Dot
        for s in _scan_nodes(f):
            assert "Dot" not in _inner_labels(s)
        Xv = rng.normal(size=(T, 2, D))
        Wv = rng.normal(size=(D, H))
        np.testing.assert_allclose(
            np.asarray(f(Xv, Wv)), np.tanh(Xv @ Wv), rtol=1e-10
        )

    def test_state_dependent_dot_stays(self):
        W = at.matrix("W", dtype="float64")
        h0 = at.vector("h0", dtype="float64")
        h, _ = scan(lambda h_prev, Wv: at.tanh(at.dot(h_prev, Wv)),
                    outputs_info=[h0], non_sequences=[W], n_steps=4)
        f = function([h0, W], h, mode="FAST_RUN")
        (s,) = _scan_nodes(f)
        assert "Dot" in _inner_labels(s)
        h0v, Wv = rng.normal(size=3), rng.normal(size=(3, 3))
        want, hh = [], h0v
        for _ in range(4):
            hh = np.tanh(hh @ Wv)
            want.append(hh)
        np.testing.assert_allclose(np.asarray(f(h0v, Wv)), want, rtol=1e-10)

    def test_invariant_elemwise_expression_hoisted(self):
        # a nonseq-only elemwise expr inside the body is loop-invariant
        X = at.matrix("X", dtype="float64")
        a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
        h, _ = scan(
            lambda xt, av, bv: xt + at.tanh(av * bv + 1.0),
            sequences=[X], non_sequences=[a, b],
        )
        f = function([X, a, b], h, mode="FAST_RUN")
        (s,) = _scan_nodes(f)
        # the tanh(av*bv+1) is computed once outside
        assert "Tanh" not in _inner_labels(s)
        Xv = rng.normal(size=(4, 3))
        av, bv = rng.normal(size=3), rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(f(Xv, av, bv)), Xv + np.tanh(av * bv + 1.0), rtol=1e-10
        )

    @pytest.mark.parametrize("dtype", ["float32", "float64"])
    def test_pushout_preserves_dtype(self, dtype):
        X = at.tensor3("X", dtype=dtype)
        W = at.matrix("W", dtype=dtype)
        h, _ = scan(lambda xt, Wv: at.dot(xt, Wv), sequences=[X],
                    non_sequences=[W])
        f = function([X, W], h, mode="FAST_RUN")
        Xv = rng.normal(size=(3, 2, 4)).astype(dtype)
        Wv = rng.normal(size=(4, 5)).astype(dtype)
        out = np.asarray(f(Xv, Wv))
        assert out.dtype == np.dtype(dtype)
        np.testing.assert_allclose(
            out, Xv @ Wv, rtol=1e-4 if dtype == "float32" else 1e-10
        )

    def test_pushout_grad_matches(self):
        X = at.tensor3("X", dtype="float64")
        W = at.matrix("W", dtype="float64")
        h, _ = scan(lambda xt, Wv: at.sqr(at.dot(xt, Wv)), sequences=[X],
                    non_sequences=[W])
        loss = at.sum(h)
        gW = grad(loss, W)
        f = function([X, W], gW, mode="FAST_RUN")
        fp = function([X, W], gW, mode="PY")
        Xv = rng.normal(size=(3, 2, 4))
        Wv = rng.normal(size=(4, 5))
        np.testing.assert_allclose(
            np.asarray(f(Xv, Wv)), np.asarray(fp(Xv, Wv)), rtol=1e-9
        )


# ---------------------------------------------------------------------------
# accumulator sum pushout (push_out_add_scan analogue)
# ---------------------------------------------------------------------------


class TestSumPushout:
    def test_running_sum_final_only(self):
        X = at.matrix("X", dtype="float64")
        s0 = at.vector("s0", dtype="float64")
        acc, _ = scan(lambda xt, prev: prev + at.sqr(xt), sequences=[X],
                      outputs_info=[s0])
        out = acc[-1]
        f = function([X, s0], out, mode="FAST_RUN")
        Xv = rng.normal(size=(6, 3))
        s0v = np.zeros(3)
        np.testing.assert_allclose(
            np.asarray(f(Xv, s0v)), (Xv**2).sum(axis=0), rtol=1e-10
        )

    def test_running_dot_accumulator(self):
        X = at.tensor3("X", dtype="float64")  # (T, D, H) per-step outer
        Y = at.tensor3("Y", dtype="float64")
        A0 = at.matrix("A0", dtype="float64")
        acc, _ = scan(
            lambda xt, yt, prev: prev + at.dot(xt, yt),
            sequences=[X, Y], outputs_info=[A0],
        )
        out = acc[-1]
        f = function([X, Y, A0], out, mode="FAST_RUN")
        Xv = rng.normal(size=(4, 3, 2))
        Yv = rng.normal(size=(4, 2, 5))
        A0v = np.zeros((3, 5))
        want = A0v + sum(Xv[t] @ Yv[t] for t in range(4))
        np.testing.assert_allclose(np.asarray(f(Xv, Yv, A0v)), want, rtol=1e-10)

    def test_intermediate_consumption_keeps_loop(self):
        X = at.matrix("X", dtype="float64")
        s0 = at.vector("s0", dtype="float64")
        acc, _ = scan(lambda xt, prev: prev + xt, sequences=[X],
                      outputs_info=[s0])
        out = at.sum(acc)  # uses ALL intermediate states
        f = function([X, s0], out, mode="FAST_RUN")
        assert _scan_nodes(f)
        Xv, s0v = rng.normal(size=(4, 2)), rng.normal(size=2)
        want = sum((s0v + Xv[: t + 1].sum(axis=0)).sum() for t in range(4))
        np.testing.assert_allclose(float(np.asarray(f(Xv, s0v))), want, rtol=1e-10)


# ---------------------------------------------------------------------------
# merge of independent scans
# ---------------------------------------------------------------------------


class TestMerge:
    def test_two_elemwise_scans_merge(self):
        X = at.matrix("X", dtype="float64")
        a, _ = scan(lambda xt: xt * 2.0, sequences=[X])
        b, _ = scan(lambda xt: xt + 1.0, sequences=[X])
        f = function([X], [a, b], mode="FAST_RUN")
        assert len(_scan_nodes(f)) == 1
        Xv = rng.normal(size=(5, 3))
        ra, rb = f(Xv)
        np.testing.assert_allclose(np.asarray(ra), Xv * 2, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(rb), Xv + 1, rtol=1e-12)

    def test_three_scans_merge(self):
        X = at.matrix("X", dtype="float64")
        outs = []
        for k in (2.0, 3.0, 4.0):
            o, _ = scan(lambda xt, kk=k: xt * kk, sequences=[X])
            outs.append(o)
        f = function([X], outs, mode="FAST_RUN")
        assert len(_scan_nodes(f)) == 1
        Xv = rng.normal(size=(4, 2))
        for o, k in zip(f(Xv), (2.0, 3.0, 4.0)):
            np.testing.assert_allclose(np.asarray(o), Xv * k, rtol=1e-12)

    def test_dependent_scans_not_merged(self):
        X = at.matrix("X", dtype="float64")
        a, _ = scan(lambda xt: xt * 2.0, sequences=[X])
        b, _ = scan(lambda st: st + 1.0, sequences=[a])
        f = function([X], b, mode="FAST_RUN")
        Xv = rng.normal(size=(4, 2))
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv * 2 + 1, rtol=1e-12)

    def test_different_lengths_not_merged(self):
        X = at.matrix("X", dtype="float64")
        Y = at.matrix("Y", dtype="float64")
        a, _ = scan(lambda xt: xt * 2.0, sequences=[X])
        b, _ = scan(lambda yt: yt + 1.0, sequences=[Y])
        f = function([X, Y], [a, b], mode="FAST_RUN")
        Xv, Yv = rng.normal(size=(4, 2)), rng.normal(size=(6, 2))
        ra, rb = f(Xv, Yv)
        np.testing.assert_allclose(np.asarray(ra), Xv * 2, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(rb), Yv + 1, rtol=1e-12)

    def test_merge_with_states(self):
        X = at.matrix("X", dtype="float64")
        s0 = at.vector("s0", dtype="float64")
        a, _ = scan(lambda xt, p: p + xt, sequences=[X], outputs_info=[s0])
        b, _ = scan(lambda xt, p: p * 0.5 + xt, sequences=[X], outputs_info=[s0])
        f = function([X, s0], [a[-1], b[-1]], mode="FAST_RUN")
        assert len(_scan_nodes(f)) == 1
        Xv, s0v = rng.normal(size=(5, 2)), rng.normal(size=2)
        pa = s0v.copy()
        pb = s0v.copy()
        for t in range(5):
            pa = pa + Xv[t]
            pb = pb * 0.5 + Xv[t]
        ra, rb = f(Xv, s0v)
        np.testing.assert_allclose(np.asarray(ra), pa, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(rb), pb, rtol=1e-12)


# ---------------------------------------------------------------------------
# signature slimming (constants / unused / duplicate io)
# ---------------------------------------------------------------------------


class TestSlimming:
    def test_multiple_constants_folded(self):
        X = at.matrix("X", dtype="float64")
        c1 = at.constant(np.float64(2.0))
        c2 = at.constant(np.float64(0.5))
        h, _ = scan(lambda xt, a, b: xt * a + b, sequences=[X],
                    non_sequences=[c1, c2])
        f = function([X], h, mode="FAST_RUN")
        (s,) = _scan_nodes(f)
        assert s.op.info.n_non_seqs == 0
        Xv = rng.normal(size=(3, 2))
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv * 2 + 0.5, rtol=1e-12)

    def test_unused_sequence_dropped(self):
        X = at.matrix("X", dtype="float64")
        Y = at.matrix("Y", dtype="float64")
        h, _ = scan(lambda xt, yt: xt * 3.0, sequences=[X, Y])
        f = function([X, Y], h, mode="FAST_RUN")
        (s,) = _scan_nodes(f)
        assert s.op.info.n_seqs == 1
        Xv, Yv = rng.normal(size=(4, 2)), rng.normal(size=(4, 2))
        np.testing.assert_allclose(np.asarray(f(Xv, Yv)), Xv * 3, rtol=1e-12)

    def test_duplicate_mixed_nonseqs(self):
        X = at.matrix("X", dtype="float64")
        w = at.vector("w", dtype="float64")
        h, _ = scan(lambda xt, w1, w2: xt * w1 + w2, sequences=[X],
                    non_sequences=[w, w])
        f = function([X, w], h, mode="FAST_RUN")
        (s,) = _scan_nodes(f)
        assert s.op.info.n_non_seqs == 1
        Xv, wv = rng.normal(size=(4, 3)), rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(f(Xv, wv)), Xv * wv + wv, rtol=1e-12
        )

    def test_identical_outputs_share_compute(self):
        X = at.matrix("X", dtype="float64")
        h, _ = scan(lambda xt: (xt * 2.0, xt * 2.0), sequences=[X])
        f = function([X], list(h), mode="FAST_RUN")
        Xv = rng.normal(size=(3, 2))
        ra, rb = f(Xv)
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb))

    def test_slimming_then_grad(self):
        X = at.matrix("X", dtype="float64")
        c = at.constant(np.float64(1.5))
        u = at.vector("u", dtype="float64")  # unused
        h, _ = scan(lambda xt, cc, uu: at.sqr(xt * cc), sequences=[X],
                    non_sequences=[c, u])
        g = grad(at.sum(h), X)
        f = function([X, u], g, mode="FAST_RUN")
        fp = function([X, u], g, mode="PY")
        Xv, uv = rng.normal(size=(4, 2)), rng.normal(size=3)
        np.testing.assert_allclose(
            np.asarray(f(Xv, uv)), np.asarray(fp(Xv, uv)), rtol=1e-9
        )


# ---------------------------------------------------------------------------
# save_mem: last-element and tail windows across tap layouts
# ---------------------------------------------------------------------------


class TestSaveMem:
    @pytest.mark.parametrize("k", [1, 2, 3])
    def test_tail_window_depths(self, k):
        X = at.matrix("X", dtype="float64")
        s0 = at.vector("s0", dtype="float64")
        acc, _ = scan(lambda xt, p: np.float64(0.9) * p + xt, sequences=[X],
                      outputs_info=[s0])
        out = acc[-k:] if k > 1 else acc[-1]
        f = function([X, s0], out, mode="FAST_RUN")
        Xv, s0v = rng.normal(size=(6, 2)), rng.normal(size=2)
        hist, p = [], s0v
        for t in range(6):
            p = 0.9 * p + Xv[t]
            hist.append(p.copy())
        want = np.stack(hist[-k:]) if k > 1 else hist[-1]
        np.testing.assert_allclose(np.asarray(f(Xv, s0v)), want, rtol=1e-10)

    def test_window_grad_matches(self):
        X = at.matrix("X", dtype="float64")
        s0 = at.vector("s0", dtype="float64")
        acc, _ = scan(lambda xt, p: at.tanh(p + xt), sequences=[X],
                      outputs_info=[s0])
        loss = at.sum(at.sqr(acc[-2:]))
        g = grad(loss, X)
        f = function([X, s0], g, mode="FAST_RUN")
        fp = function([X, s0], g, mode="PY")
        Xv, s0v = rng.normal(size=(5, 2)), rng.normal(size=2)
        np.testing.assert_allclose(
            np.asarray(f(Xv, s0v)), np.asarray(fp(Xv, s0v)), rtol=1e-9
        )

    def test_mit_sot_last_element(self):
        # taps [-2, -1]: final element of a mit-sot stacked output
        s0 = at.vector("s0", dtype="float64")  # length-2 window
        fib, _ = scan(
            lambda tm2, tm1: tm2 + tm1,
            outputs_info=[dict(initial=s0, taps=[-2, -1])],
            n_steps=8,
        )
        out = fib[-1]
        f = function([s0], out, mode="FAST_RUN")
        a, b = 1.0, 1.0
        seq = [a, b]
        for _ in range(8):
            seq.append(seq[-2] + seq[-1])
        np.testing.assert_allclose(
            float(np.asarray(f(np.array([1.0, 1.0])))), seq[-1]
        )

    def test_nit_sot_full_consumption_unchanged(self):
        X = at.matrix("X", dtype="float64")
        h, _ = scan(lambda xt: at.sqr(xt), sequences=[X])
        f = function([X], h, mode="FAST_RUN")
        Xv = rng.normal(size=(4, 3))
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv**2, rtol=1e-12)


# ---------------------------------------------------------------------------
# identity nit-sot (scan output that just forwards a sequence)
# ---------------------------------------------------------------------------


class TestIdentityNitsot:
    def test_forwarded_sequence_skips_loop_output(self):
        X = at.matrix("X", dtype="float64")
        outs, _ = scan(lambda xt: (xt, at.sqr(xt)), sequences=[X])
        ident, sq = outs
        f = function([X], [ident, sq], mode="FAST_RUN")
        Xv = rng.normal(size=(4, 2))
        ra, rb = f(Xv)
        np.testing.assert_allclose(np.asarray(ra), Xv, rtol=1e-12)
        np.testing.assert_allclose(np.asarray(rb), Xv**2, rtol=1e-12)


# ---------------------------------------------------------------------------
# scan + surrounding rewrites interact soundly
# ---------------------------------------------------------------------------


class TestScanInteractions:
    def test_scan_output_feeds_algebra(self):
        X = at.matrix("X", dtype="float64")
        h, _ = scan(lambda xt: at.exp(xt), sequences=[X])
        out = at.log(h)  # log(exp(x)) across the scan boundary stays sound
        f = function([X], out, mode="FAST_RUN")
        Xv = rng.normal(size=(4, 2))
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv, rtol=1e-10)

    def test_two_grads_through_same_scan(self):
        X = at.matrix("X", dtype="float64")
        W = at.matrix("W", dtype="float64")
        s0 = at.vector("s0", dtype="float64")
        hseq, _ = scan(
            lambda xt, p, Wv: at.tanh(at.dot(p, Wv) + xt),
            sequences=[X], outputs_info=[s0], non_sequences=[W],
        )
        loss = at.sum(at.sqr(hseq))
        gX, gW = grad(loss, [X, W])
        f = function([X, W, s0], [gX, gW], mode="FAST_RUN")
        fp = function([X, W, s0], [gX, gW], mode="PY")
        Xv = rng.normal(size=(4, 3))
        Wv = rng.normal(size=(3, 3)) * 0.3
        s0v = rng.normal(size=3)
        for a, b in zip(f(Xv, Wv, s0v), fp(Xv, Wv, s0v)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)

    def test_nested_scan_rewrites_sound(self):
        X = at.tensor3("X", dtype="float64")

        def outer_step(xmat):
            inner, _ = scan(lambda r: at.sum(at.sqr(r)), sequences=[xmat])
            return at.sum(inner)

        totals, _ = scan(outer_step, sequences=[X])
        f = function([X], totals, mode="FAST_RUN")
        Xv = rng.normal(size=(3, 4, 2))
        np.testing.assert_allclose(
            np.asarray(f(Xv)), (Xv**2).sum(axis=(1, 2)), rtol=1e-10
        )

    def test_scan_then_subtensor_rewrites(self):
        X = at.matrix("X", dtype="float64")
        h, _ = scan(lambda xt: xt * 2.0, sequences=[X])
        out = h[1:3][0]  # merged subtensors over a scan output
        f = function([X], out, mode="FAST_RUN")
        Xv = rng.normal(size=(5, 2))
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv[1] * 2, rtol=1e-12)
