"""Fused attention op (``tensor/nnet/attention.py``): differential vs an
explicit NumPy composition, causal masking, gradients, py==jit.  The
Pallas kernel path is TPU-only (gated by ``use_pallas_for``); these run
the reference lowering on CPU — the kernel itself is validated on-chip
by ``benchmarks/bench_attention.py``."""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.gradient import grad
from aesara_tpu.tensor.nnet.attention import fused_attention


rng = np.random.default_rng(0)
QV = rng.normal(size=(2, 16, 8)).astype("float32")
KV = rng.normal(size=(2, 16, 8)).astype("float32")
VV = rng.normal(size=(2, 16, 8)).astype("float32")


def ref(q_, k_, v_, causal=False):
    s = np.einsum("btd,bsd->bts", q_, k_) / np.sqrt(q_.shape[-1])
    if causal:
        T = q_.shape[1]
        s = np.where(np.tril(np.ones((T, T), bool))[None], s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bts,bsd->btd", p, v_)


def _qkv():
    return at.tensor3("q", dtype="float64"), at.tensor3("k", dtype="float64"), at.tensor3("v", dtype="float64")


def test_forward_matches_numpy():
    q, k, v = _qkv()
    f = atp.function([q, k, v], fused_attention(q, k, v))
    assert np.allclose(f(QV, KV, VV), ref(QV, KV, VV), atol=2e-5)


def test_causal_mask():
    q, k, v = _qkv()
    f = atp.function([q, k, v], fused_attention(q, k, v, causal=True))
    out = f(QV, KV, VV)
    assert np.allclose(out, ref(QV, KV, VV, True), atol=2e-5)
    # first position attends only to itself: equals v[:, 0] exactly
    assert np.allclose(np.asarray(out)[:, 0], VV[:, 0], atol=2e-5)


def test_gradients_numeric():
    q, k, v = _qkv()
    loss = at.math.sum(at.math.sqr(fused_attention(q, k, v)))
    gq = grad(loss, q)
    fl = atp.function([q, k, v], loss)
    fg = atp.function([q, k, v], gq)
    eps = 1e-3
    qp = QV.copy()
    qp[0, 0, 0] += eps
    num = (float(fl(qp, KV, VV)) - float(fl(QV, KV, VV))) / eps
    assert abs(num - float(np.asarray(fg(QV, KV, VV))[0, 0, 0])) < 2e-2


def test_py_equals_jit():
    q, k, v = _qkv()
    out = fused_attention(q, k, v)
    fj = atp.function([q, k, v], out)
    fp = atp.function([q, k, v], out, mode="PY")
    assert np.allclose(fj(QV, KV, VV), fp(QV, KV, VV), atol=1e-5)


def test_rank_check():
    import pytest

    with pytest.raises(TypeError, match="3-d"):
        fused_attention(at.matrix(), at.matrix(), at.matrix())
