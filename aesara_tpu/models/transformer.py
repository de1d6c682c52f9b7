"""Transformer encoder layer built from the symbolic primitives —
multi-head attention as batched MXU matmuls + the framework's Softmax op
(which the rewriter recognizes and Pallas can fuse), layer norm from
elemwise/reduce primitives.

This is the flagship "does the graph language scale to modern models"
demonstration; sharded variants ride ``aesara_tpu.parallel`` (tp over
heads/ffn like Megatron, dp over batch)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.models.base import Model, glorot, zeros
from aesara_tpu.tensor import math as tm


def layer_norm(x, gain, bias, eps: float = 1e-5):
    mu = tm.mean(x, axis=-1, keepdims=True)
    var = tm.mean(tm.sqr(x - mu), axis=-1, keepdims=True)
    return gain * (x - mu) / tm.sqrt(var + eps) + bias


class TransformerEncoderLayer(Model):
    """Pre-LN encoder layer: x + MHA(LN(x)), then x + FFN(LN(x)).

    Input (B, T, D); heads split D."""

    def __init__(self, d_model: int, n_heads: int, d_ff: int, seed: int = 0):
        super().__init__()
        assert d_model % n_heads == 0
        rng = np.random.default_rng(seed)
        self.d_model, self.n_heads = d_model, n_heads
        self.d_head = d_model // n_heads
        self.tp_axis = None
        self.wq = self._register(glorot(rng, d_model, d_model, "wq"))
        self.wk = self._register(glorot(rng, d_model, d_model, "wk"))
        self.wv = self._register(glorot(rng, d_model, d_model, "wv"))
        self.wo = self._register(glorot(rng, d_model, d_model, "wo"))
        self.w1 = self._register(glorot(rng, d_model, d_ff, "w1"))
        self.b1 = self._register(zeros((d_ff,), "b1"))
        self.w2 = self._register(glorot(rng, d_ff, d_model, "w2"))
        self.b2 = self._register(zeros((d_model,), "b2"))
        self.ln1_g = self._register(zeros((d_model,), "ln1_g") )
        self.ln1_b = self._register(zeros((d_model,), "ln1_b"))
        self.ln2_g = self._register(zeros((d_model,), "ln2_g"))
        self.ln2_b = self._register(zeros((d_model,), "ln2_b"))
        # gains start at 1
        self.ln1_g.set_value(np.ones(d_model, dtype=self.ln1_g.get_value().dtype))
        self.ln2_g.set_value(np.ones(d_model, dtype=self.ln2_g.get_value().dtype))

    def shard_tp(self, axis: str = "model"):
        """Megatron-style tensor parallelism over ``axis``: qkv/ffn-in
        column-sharded, out/ffn-out row-sharded, and whole heads kept
        LOCAL through attention via sharding constraints (the head-major
        split below makes the constraint collective-free).  The contract
        is exactly 2 all-reduces per layer forward and 0 gathers —
        asserted on compiled HLO in tests/parallel/test_hlo_collectives.py.
        """
        self.tp_axis = axis
        self.wq.type.sharding = (None, axis)
        self.wk.type.sharding = (None, axis)
        self.wv.type.sharding = (None, axis)
        self.wo.type.sharding = (axis, None)
        self.w1.type.sharding = (None, axis)
        self.b1.type.sharding = (axis,)
        self.w2.type.sharding = (axis, None)
        return self

    def _tp(self, t, spec):
        if self.tp_axis is None:
            return t
        from aesara_tpu.parallel.ops import shard_constraint

        return shard_constraint(t, spec)

    def _split_heads(self, x, B, T):
        # (B, T, D) -> (H*B, T, d_head), HEAD-major: after a
        # column-sharded qkv projection (TP), flattened rows group by
        # head, so an (axis, None, None) constraint keeps each head's
        # attention entirely on the device that computed its projection
        h = x.reshape((B, T, self.n_heads, self.d_head))
        h = h.dimshuffle(2, 0, 1, 3)
        out = h.reshape((self.n_heads * B, T, self.d_head))
        return self._tp(out, (self.tp_axis, None, None))

    def attention(self, x, causal: bool = False):
        from aesara_tpu.tensor.nnet.attention import fused_attention

        B, T = x.shape[0], x.shape[1]
        q = self._split_heads(tm.dot(x, self.wq), B, T)
        k = self._split_heads(tm.dot(x, self.wk), B, T)
        v = self._split_heads(tm.dot(x, self.wv), B, T)
        # ONE fused op: XLA composition for short T, FlashAttention Pallas
        # kernel (no (T,T) score matrix in HBM) from T>=2048 on TPU
        ctx = fused_attention(q, k, v, causal=causal)       # (H*B, T, d_head)
        ctx = self._tp(ctx, (self.tp_axis, None, None))
        ctx = ctx.reshape((self.n_heads, B, T, self.d_head))
        ctx = ctx.dimshuffle(1, 2, 0, 3).reshape((B, T, self.d_model))
        # merged ctx stays feature-sharded into the row-parallel out-proj
        ctx = self._tp(ctx, (None, None, self.tp_axis))
        return tm.dot(ctx, self.wo)

    def __call__(self, x):
        h = x + self.attention(layer_norm(x, self.ln1_g, self.ln1_b))
        z = layer_norm(h, self.ln2_g, self.ln2_b)
        ffn = tm.dot(tm.maximum(tm.dot(z, self.w1) + self.b1, 0.0), self.w2) + self.b2
        return h + ffn

    def loss(self, x):
        """Mean-square activation magnitude — a smoke-train objective."""
        out = self(x)
        return tm.mean(tm.sqr(out))
