"""XLA lowerings for conv/pool: the ops' own jax formulations run under
the trace (single source of truth with the oracle)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aesara_tpu.link.jax.dispatch import jax_funcify
from aesara_tpu.tensor.nnet.abstract_conv import (
    AbstractConv2d,
    AbstractConv2dGradInputs,
    AbstractConv2dGradWeights,
)
from aesara_tpu.tensor.nnet.pool import Pool, PoolGrad


@jax_funcify.register(AbstractConv2d)
def _jx_conv2d(op, node=None, **kw):
    return op._jax_forward


@jax_funcify.register(AbstractConv2dGradInputs)
def _jx_conv2d_grad_inputs(op, node=None, **kw):
    def grad_inputs(kern, gz, img):
        g_img, _ = op._vjp(jnp.asarray(img), jnp.asarray(kern), jnp.asarray(gz))
        return g_img

    return grad_inputs


@jax_funcify.register(AbstractConv2dGradWeights)
def _jx_conv2d_grad_weights(op, node=None, **kw):
    def grad_weights(img, gz, kern):
        _, g_kern = op._vjp(jnp.asarray(img), jnp.asarray(kern), jnp.asarray(gz))
        return g_kern

    return grad_weights


@jax_funcify.register(Pool)
def _jx_pool(op, node=None, **kw):
    return op._jax_forward


@jax_funcify.register(PoolGrad)
def _jx_pool_grad(op, node=None, **kw):
    def pool_grad(x, gz):
        _, vjp_fn = jax.vjp(op.fwd._jax_forward, jnp.asarray(x))
        (g,) = vjp_fn(jnp.asarray(gz))
        return g

    return pool_grad


# --- fused attention ---------------------------------------------------------

from aesara_tpu.tensor.nnet.attention import (  # noqa: E402
    FusedAttention,
    FusedAttentionGrad,
    _attention_ref,
)


@jax_funcify.register(FusedAttention)
def _jx_fused_attention(op, node=None, **kw):
    import numpy as _np

    def attn(q, k, v):
        from aesara_tpu.link.jax.pallas_kernels import (
            flash_attention,
            use_flash_for,
        )

        q = jnp.asarray(q)
        scale = 1.0 / float(_np.sqrt(q.shape[-1]))
        # measured crossovers on v5-lite (round 5, single-pass kernel +
        # exp2 + mask elision): flash fwd wins from T=1024 in BOTH
        # dtypes — f32 1.56x/2.20x/2.79x and bf16 1.95x/1.50x/1.66x at
        # T=1024/2048/4096, causal bf16 1.65x/1.13x/1.25x
        # (benchmarks/README.md round-5 table)
        if use_flash_for(q.shape, q.dtype, min_seqlen=1024):
            return flash_attention(q, jnp.asarray(k), jnp.asarray(v),
                                   causal=op.causal, scale=scale)
        return _attention_ref(q, jnp.asarray(k), jnp.asarray(v),
                              op.causal, scale)

    return attn


@jax_funcify.register(FusedAttentionGrad)
def _jx_fused_attention_grad(op, node=None, **kw):
    import numpy as _np

    def attn_grad(q, k, v, gz):
        from aesara_tpu.link.jax.pallas_kernels import (
            flash_attention_grads,
            use_flash_for,
        )

        q = jnp.asarray(q)
        scale = 1.0 / float(_np.sqrt(q.shape[-1]))
        # the backward recomputes the forward in tiles (FlashAttention-2)
        # instead of saving the (T,T) score matrix; measured 1.57x at
        # T=1024 already (5 matmuls but ~zero score-matrix HBM traffic)
        if use_flash_for(q.shape, q.dtype, min_seqlen=1024):
            return flash_attention_grads(
                q, jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(gz, dtype=q.dtype),
                causal=op.causal, scale=scale,
            )
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _attention_ref(q_, k_, v_, op.causal, scale),
            q, jnp.asarray(k), jnp.asarray(v),
        )
        return vjp(jnp.asarray(gz, dtype=q.dtype))

    return attn_grad
