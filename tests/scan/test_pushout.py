"""Scan push-out rewrites: loop-invariant hoisting and per-step
batching (reference push_out_non_seq_scan / push_out_seq_scan)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.scan.basic import scan
from aesara_tpu.scan.op import Scan
from aesara_tpu.tensor.math import Dot

rng = np.random.default_rng(9)


def _scan_nodes(f):
    return [n for n in f.fgraph.apply_nodes if isinstance(n.op, Scan)]


def test_seq_dot_hoisted_out_of_loop():
    """x_t @ Wx becomes ONE batched gemm outside the loop; only the
    recurrent h @ Wh dot stays inside."""
    X = at.matrix("X", dtype="float64")
    h0 = at.vector("h0", dtype="float64")
    Wx = at.matrix("Wx", dtype="float64")
    Wh = at.matrix("Wh", dtype="float64")
    h, _ = scan(
        lambda xt, htm1: at.tanh(at.dot(xt, Wx) + at.dot(htm1, Wh)),
        sequences=[X], outputs_info=[h0],
    )
    f = function([X, h0, Wx, Wh], h, mode="FAST_RUN")
    scans = _scan_nodes(f)
    assert len(scans) == 1
    inner_dots = [
        m for m in scans[0].op.fgraph.apply_nodes if isinstance(m.op, Dot)
    ]
    assert len(inner_dots) == 1  # only h @ Wh remains
    # the projected sequence replaced X entirely: remove-unused then
    # dropped the original (now-dead) sequence input
    assert scans[0].op.info.n_seqs == 1

    T, D, H = 7, 3, 4
    Xv = rng.normal(size=(T, D))
    h0v = rng.normal(size=H)
    Wxv = rng.normal(size=(D, H))
    Whv = rng.normal(size=(H, H)) * 0.3
    f_py = function([X, h0, Wx, Wh], h, mode="PY")
    np.testing.assert_allclose(
        np.asarray(f(Xv, h0v, Wxv, Whv)),
        np.asarray(f_py(Xv, h0v, Wxv, Whv)),
        rtol=1e-10,
    )


def test_pure_elemwise_stays_in_loop():
    """Pure per-step elemwise must NOT hoist: XLA fuses it into the
    lax.scan body for free, while hoisting would materialize a (T, ...)
    HBM buffer.  Only dot-containing chains pay for the round trip."""
    X = at.matrix("X", dtype="float64")
    h, _ = scan(
        lambda xt, acc: acc + at.exp(xt).sum(),
        sequences=[X], outputs_info=[at.constant(np.float64(0.0))],
    )
    f = function([X], h, mode="FAST_RUN")
    scans = _scan_nodes(f)
    assert len(scans) == 1
    assert scans[0].op.info.n_seqs == 1  # nothing hoisted
    from aesara_tpu.tensor.elemwise import Elemwise
    from aesara_tpu import scalar as aes

    Xv = rng.normal(size=(5, 3))
    f_py = function([X], h, mode="PY")
    np.testing.assert_allclose(
        np.asarray(f(Xv)), np.asarray(f_py(Xv)), rtol=1e-10
    )


def test_elemwise_feeding_dot_hoists_with_it():
    """exp(x_t) @ W: the elemwise rides along with the batched gemm."""
    X = at.matrix("X", dtype="float64")
    W = at.matrix("W", dtype="float64")
    h0 = at.vector("h0", dtype="float64")
    h, _ = scan(
        lambda xt, htm1: at.tanh(at.dot(at.exp(xt), W)) + 0.1 * htm1,
        sequences=[X], outputs_info=[h0],
    )
    f = function([X, h0, W], h, mode="FAST_RUN")
    scans = _scan_nodes(f)
    assert len(scans) == 1
    inner_dots = [
        m for m in scans[0].op.fgraph.apply_nodes if isinstance(m.op, Dot)
    ]
    assert not inner_dots  # the whole projection chain hoisted
    T, D, H = 5, 3, 4
    args = (rng.normal(size=(T, D)), rng.normal(size=H),
            rng.normal(size=(D, H)))
    f_py = function([X, h0, W], h, mode="PY")
    np.testing.assert_allclose(
        np.asarray(f(*args)), np.asarray(f_py(*args)), rtol=1e-10
    )


def test_pushout_grads_match():
    X = at.matrix("X", dtype="float64")
    h0 = at.vector("h0", dtype="float64")
    Wx = at.matrix("Wx", dtype="float64")
    Wh = at.matrix("Wh", dtype="float64")
    h, _ = scan(
        lambda xt, htm1: at.tanh(at.dot(xt, Wx) + at.dot(htm1, Wh)),
        sequences=[X], outputs_info=[h0],
    )
    g = atp.grad(h.sum(), [X, Wx, Wh])
    f_fast = function([X, h0, Wx, Wh], g, mode="FAST_RUN")
    f_py = function([X, h0, Wx, Wh], g, mode="PY")
    T, D, H = 6, 3, 4
    args = (rng.normal(size=(T, D)), rng.normal(size=H),
            rng.normal(size=(D, H)), rng.normal(size=(H, H)) * 0.3)
    for a, b in zip(f_fast(*args), f_py(*args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_pushout_respects_sequence_truncation():
    """Sequences longer than n_steps: the batched projection must align
    on the consumed window."""
    X = at.matrix("X", dtype="float64")
    Y = at.matrix("Y", dtype="float64")
    W = at.matrix("W", dtype="float64")
    h, _ = scan(
        lambda xt, yt, acc, Wv: acc + at.dot(xt * yt, Wv).sum(),
        sequences=[X, Y], outputs_info=[at.constant(np.float64(0.0))],
        non_sequences=[W],
    )
    f = function([X, Y, W], h[-1], mode="FAST_RUN")
    f_py = function([X, Y, W], h[-1], mode="PY")
    Xv = rng.normal(size=(5, 3))
    Yv = rng.normal(size=(8, 3))  # longer: scan consumes min length
    Wv = rng.normal(size=(3, 2))
    np.testing.assert_allclose(
        float(np.asarray(f(Xv, Yv, Wv))),
        float(np.asarray(f_py(Xv, Yv, Wv))),
        rtol=1e-10,
    )


def test_matrix_seq_dot_hoisted_as_one_gemm():
    """(B, D) matrix slices: the projection becomes ONE (T·B, D) gemm."""
    X = at.tensor3("X", dtype="float64")   # (T, B, D)
    H0 = at.matrix("H0", dtype="float64")  # (B, H)
    Wx = at.matrix("Wx", dtype="float64")
    Wh = at.matrix("Wh", dtype="float64")
    h, _ = scan(
        lambda xt, htm1: at.tanh(at.dot(xt, Wx) + at.dot(htm1, Wh)),
        sequences=[X], outputs_info=[H0],
    )
    f = function([X, H0, Wx, Wh], h, mode="FAST_RUN")
    scans = _scan_nodes(f)
    assert len(scans) == 1
    inner_dots = [
        m for m in scans[0].op.fgraph.apply_nodes if isinstance(m.op, Dot)
    ]
    assert len(inner_dots) == 1  # only the recurrent dot remains
    T, B, D, H = 5, 3, 4, 6
    args = (rng.normal(size=(T, B, D)), rng.normal(size=(B, H)),
            rng.normal(size=(D, H)), rng.normal(size=(H, H)) * 0.3)
    f_py = function([X, H0, Wx, Wh], h, mode="PY")
    np.testing.assert_allclose(
        np.asarray(f(*args)), np.asarray(f_py(*args)), rtol=1e-10
    )


def test_rng_in_scan_draws_fresh_per_step():
    """srng.uniform() inside the scanned fn: the rng shared's
    default_update (key rotation) is threaded through the loop as
    carried state — REFERENCE semantics: a fresh draw every STEP (the
    dropout-in-scan pattern), continuing the stream across calls when
    the scan updates are applied.  Pushout must not hoist the rv out of
    the loop (its rng state is per-step), and must not duplicate it."""
    from aesara_tpu.tensor.random.basic import UniformRV
    from aesara_tpu.tensor.random.utils import RandomStream

    srng = RandomStream(seed=3)
    X = at.matrix("X", dtype="float64")
    h, upd = scan(lambda xt: (xt * srng.uniform()).sum(), sequences=[X])
    f = function([X], h, updates=upd, mode="FAST_RUN")
    a = np.asarray(f(np.ones((4, 2)))).copy()
    b = np.asarray(f(np.ones((4, 2))))
    assert len(np.unique(a)) == 4  # fresh draw each step
    assert not np.array_equal(a, b)  # stream continues across calls
    # exactly one rv op inside the loop (not duplicated by pushout)
    scans = [n for n in f.maker.fgraph.toposort()
             if type(n.op).__name__ == "Scan"]
    if scans:
        inner_rvs = [n for n in scans[0].op.fgraph.apply_nodes
                     if isinstance(n.op, UniformRV)]
        assert len(inner_rvs) == 1


def test_rng_outside_scan_is_loop_invariant():
    """A draw made OUTSIDE fn and captured as a closed-over variable is
    one rv node evaluated before the loop: same value every step."""
    from aesara_tpu.tensor.random.utils import RandomStream

    srng = RandomStream(seed=3)
    u = srng.uniform()                    # drawn once, outside the loop
    X = at.matrix("X", dtype="float64")
    h, upd = scan(lambda xt: (xt * u).sum(), sequences=[X])
    f = function([X], h, updates=upd, mode="FAST_RUN")
    a = np.asarray(f(np.ones((4, 2)))).copy()
    b = np.asarray(f(np.ones((4, 2))))
    assert len(np.unique(a)) == 1         # invariant within a call
    assert not np.array_equal(a, b)       # rotates across calls
