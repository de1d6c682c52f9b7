"""Fused scaled-dot-product attention.

The reference has no attention op (pre-transformer era); this is the
framework's flagship *new* hot op, designed TPU-first: the XLA lowering
is either the plain composition (softmax(qkᵀ/√d)·v — XLA fuses the
elementwise work into the two MXU matmuls) or, under
``config.pallas_fusion``, the FlashAttention Pallas kernel
(``link/jax/pallas_kernels.py:flash_attention``) that never writes the
(T, T) score matrix to HBM.

One jax formulation (``_attention_ref``) serves as the NumPy oracle,
the default lowering, and — through ``jax.vjp`` — the gradient, so all
three are bit-consistent (the conv/CTC pattern, ``nnet/ctc.py``).
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.type import TensorType
from aesara_tpu.tensor.basic import as_tensor_variable


__all__ = ["FusedAttention", "FusedAttentionGrad", "fused_attention"]


def _attention_ref(q, k, v, causal: bool, scale: float):
    """softmax(q kᵀ · scale [+ causal mask]) v — (BH, T, D) panels."""
    import jax.numpy as jnp

    s = jnp.einsum("btd,bsd->bts", q, k) * scale
    if causal:
        T = q.shape[1]
        mask = jnp.tril(jnp.ones((T, T), dtype=bool))
        s = jnp.where(mask[None], s, -jnp.inf)
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jnp.einsum("bts,bsd->btd", p, v)


class FusedAttention(Op):
    """(q, k, v) each (BH, T, D) → (BH, T, D)."""

    __props__ = ("causal",)

    def __init__(self, causal: bool = False):
        self.causal = bool(causal)

    def make_node(self, q, k, v):
        q = as_tensor_variable(q)
        k = as_tensor_variable(k)
        v = as_tensor_variable(v)
        if not (q.type.ndim == k.type.ndim == v.type.ndim == 3):
            raise TypeError("fused_attention expects (batch*heads, T, D) "
                            "3-d q, k, v")
        # the output feature dim comes from V (softmax(QKᵀ)V): Dv may
        # legally differ from Dk (review finding: out was typed q.type())
        out_shape = (q.type.shape[0], q.type.shape[1], v.type.shape[2])
        out_type = TensorType(q.type.dtype, out_shape)
        return Apply(self, [q, k, v], [out_type()])

    def _scale(self, q_shape):
        d = q_shape[-1]
        return 1.0 / float(np.sqrt(d))

    def perform(self, node, inputs, output_storage):
        import jax.numpy as jnp

        q, k, v = inputs
        res = _attention_ref(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            self.causal, self._scale(q.shape),
        )
        output_storage[0][0] = np.asarray(res, dtype=node.outputs[0].type.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def L_op(self, inputs, outputs, output_grads):
        g = FusedAttentionGrad(self.causal)(*inputs, output_grads[0])
        return [g[0], g[1], g[2]]


class FusedAttentionGrad(Op):
    """vjp of the reference formulation; three outputs (dq, dk, dv)."""

    __props__ = ("causal",)

    def __init__(self, causal: bool = False):
        self.causal = bool(causal)

    def make_node(self, q, k, v, gz):
        q = as_tensor_variable(q)
        k = as_tensor_variable(k)
        v = as_tensor_variable(v)
        gz = as_tensor_variable(gz)
        return Apply(self, [q, k, v, gz], [q.type(), k.type(), v.type()])

    def perform(self, node, inputs, output_storage):
        import jax
        import jax.numpy as jnp

        q, k, v, gz = inputs
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _attention_ref(q_, k_, v_, self.causal, scale),
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        )
        dq, dk, dv = vjp(jnp.asarray(gz, dtype=q.dtype))
        for i, g in enumerate((dq, dk, dv)):
            output_storage[i][0] = np.asarray(g, dtype=inputs[i].dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0], input_shapes[1], input_shapes[2]]


def fused_attention(q, k, v, causal: bool = False):
    """Scaled-dot-product attention over (batch*heads, T, d_head) panels."""
    return FusedAttention(causal)(q, k, v)
