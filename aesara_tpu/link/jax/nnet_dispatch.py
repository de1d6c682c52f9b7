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
