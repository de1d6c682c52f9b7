"""Scan signature-slimming + accumulator push-out rewrites
(reference scan/rewriting.py: remove_constants_and_unused_inputs_scan:75,
scan_merge_inouts:1964, push_out_add_scan:813 / push_out_dot1_scan:2167)."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.scan.basic import scan
from aesara_tpu.scan.op import Scan

rng = np.random.default_rng(31)


def _scan_nodes(f):
    return [n for n in f.fgraph.apply_nodes if isinstance(n.op, Scan)]


def test_constant_nonseq_folded_into_body():
    X = at.matrix("X", dtype="float64")
    c = at.constant(np.float64(2.5))
    h, _ = scan(
        lambda xt, cc: xt * cc, sequences=[X], non_sequences=[c],
    )
    f = function([X], h, mode="FAST_RUN")
    (s,) = _scan_nodes(f)
    assert s.op.info.n_non_seqs == 0  # the constant moved inside
    Xv = rng.normal(size=(4, 3))
    np.testing.assert_allclose(np.asarray(f(Xv)), Xv * 2.5, rtol=1e-12)


def test_unused_nonseq_dropped():
    X = at.matrix("X", dtype="float64")
    w = at.vector("w", dtype="float64")
    u = at.vector("u", dtype="float64")  # never referenced by the body
    h, _ = scan(
        lambda xt, wv, uv: xt * wv[0], sequences=[X], non_sequences=[w, u],
    )
    f = function([X, w, u], h, mode="FAST_RUN")
    (s,) = _scan_nodes(f)
    assert s.op.info.n_non_seqs == 1
    Xv, wv, uv = rng.normal(size=(4, 3)), rng.normal(size=2), rng.normal(size=5)
    np.testing.assert_allclose(np.asarray(f(Xv, wv, uv)), Xv * wv[0],
                               rtol=1e-12)


def test_duplicate_sequence_merged():
    X = at.matrix("X", dtype="float64")
    h, _ = scan(lambda a, b: a + b, sequences=[X, X])
    f = function([X], h, mode="FAST_RUN")
    (s,) = _scan_nodes(f)
    assert s.op.info.n_seqs == 1
    Xv = rng.normal(size=(5, 2))
    np.testing.assert_allclose(np.asarray(f(Xv)), 2 * Xv, rtol=1e-12)


def test_duplicate_nonseq_merged():
    X = at.matrix("X", dtype="float64")
    w = at.vector("w", dtype="float64")
    h, _ = scan(
        lambda xt, w1, w2: xt * w1 + w2,
        sequences=[X], non_sequences=[w, w],
    )
    f = function([X, w], h, mode="FAST_RUN")
    (s,) = _scan_nodes(f)
    assert s.op.info.n_non_seqs == 1
    Xv, wv = rng.normal(size=(4, 3)), rng.normal(size=3)
    np.testing.assert_allclose(
        np.asarray(f(Xv, wv)), Xv * wv + wv, rtol=1e-12
    )


def test_duplicate_outputs_deduped():
    """Two scan outputs computing the same inner value collapse to one
    stacked buffer (scan_merge_inouts)."""
    X = at.matrix("X", dtype="float64")
    (o1, o2), _ = scan(
        lambda xt: (xt * 2, xt * 2), sequences=[X],
    )
    f = function([X], [o1, o2 + 1.0], mode="FAST_RUN")
    Xv = rng.normal(size=(4, 3))
    r1, r2 = f(Xv)
    np.testing.assert_allclose(np.asarray(r1), 2 * Xv, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(r2), 2 * Xv + 1, rtol=1e-12)


def test_accumulated_dot_leaves_no_loop():
    """acc_t = acc_{t-1} + x_t @ W consumed at [-1]: the scan dissolves
    into one batched gemm + sum (push-out-sum → push-out-seqs →
    identity-nit-sot)."""
    X = at.matrix("X", dtype="float64")
    W = at.matrix("W", dtype="float64")
    acc0 = at.matrix("acc0", dtype="float64")
    acc, _ = scan(
        lambda xt, a, w: a + at.dot(xt, w),
        sequences=[X.reshape((X.shape[0] // 2, 2, X.shape[1]))],
        outputs_info=[acc0], non_sequences=[W],
    )
    out = acc[-1].sum()
    f = function([X, W, acc0], out, mode="FAST_RUN")
    assert not _scan_nodes(f), "accumulation loop should be fully pushed out"

    T2, D, K = 6, 3, 4
    Xv = rng.normal(size=(T2, D))
    Wv = rng.normal(size=(D, K))
    a0 = rng.normal(size=(2, K))
    expected = a0 + Xv.reshape(3, 2, D) @ Wv
    expected = (a0 + np.sum(Xv.reshape(3, 2, D) @ Wv, axis=0)).sum()
    np.testing.assert_allclose(float(np.asarray(f(Xv, Wv, a0))), expected,
                               rtol=1e-10)


def test_accumulated_dot_gradients_match_py():
    X = at.matrix("X", dtype="float64")
    W = at.matrix("W", dtype="float64")
    acc, _ = scan(
        lambda xt, a, w: a + at.dot(xt, w) ** 2,
        sequences=[X], outputs_info=[at.zeros_like(W[0])],
        non_sequences=[W],
    )
    cost = acc[-1].sum()
    gX, gW = grad(cost, [X, W])
    f = function([X, W], [cost, gX, gW], mode="FAST_RUN")
    f_py = function([X, W], [cost, gX, gW], mode="PY")
    Xv = rng.normal(size=(5, 3))
    Wv = rng.normal(size=(3, 4))
    for a, b in zip(f(Xv, Wv), f_py(Xv, Wv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_pushout_sum_keeps_loop_when_expr_uses_state():
    """expr depends on another recurrent state — accumulation must stay
    in the carry (stacking pays nothing)."""
    X = at.matrix("X", dtype="float64")
    W = at.matrix("W", dtype="float64")
    h0 = at.vector("h0", dtype="float64")

    def step(xt, h, a, w):
        h2 = at.tanh(at.dot(h, w) + xt)
        return h2, a + at.dot(h2, w)

    (h, acc), _ = scan(
        step, sequences=[X], outputs_info=[h0, at.zeros_like(h0)],
        non_sequences=[W],
    )
    out = acc[-1].sum() + h[-1].sum()
    f = function([X, W, h0], out, mode="FAST_RUN")
    assert len(_scan_nodes(f)) == 1
    f_py = function([X, W, h0], out, mode="PY")
    Xv = rng.normal(size=(4, 3))
    Wv = rng.normal(size=(3, 3)) * 0.3
    hv = rng.normal(size=3)
    np.testing.assert_allclose(
        float(np.asarray(f(Xv, Wv, hv))),
        float(np.asarray(f_py(Xv, Wv, hv))), rtol=1e-9,
    )


def test_pushout_sum_requires_last_only_consumption():
    """If the whole accumulated trajectory is consumed, the rewrite must
    not fire (the per-step partial sums are genuinely needed)."""
    X = at.matrix("X", dtype="float64")
    W = at.matrix("W", dtype="float64")
    acc, _ = scan(
        lambda xt, a, w: a + at.dot(xt, w),
        sequences=[X], outputs_info=[at.zeros_like(W[0])],
        non_sequences=[W],
    )
    out = acc.sum()  # every step's value used
    f = function([X, W], out, mode="FAST_RUN")
    f_py = function([X, W], out, mode="PY")
    Xv = rng.normal(size=(5, 3))
    Wv = rng.normal(size=(3, 4))
    np.testing.assert_allclose(
        float(np.asarray(f(Xv, Wv))), float(np.asarray(f_py(Xv, Wv))),
        rtol=1e-9,
    )


def test_while_scan_unaffected_by_slimming():
    """as_while scans pass through remove-constants without corruption."""
    from aesara_tpu.scan.basic import until

    c = at.constant(np.float64(1.0))
    k = at.scalar("k", dtype="float64")
    v, _ = scan(
        lambda prev, cc: (prev + cc, until(prev > 5.0)),
        outputs_info=[k], non_sequences=[c], n_steps=20,
    )
    f = function([k], v[-1], mode="FAST_RUN")
    assert float(np.asarray(f(0.0))) == pytest.approx(7.0)
