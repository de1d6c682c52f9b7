"""XLA lowering for RandomVariable ops: the op's own jax.random-based
``rng_fn`` runs under the trace (it IS the device rule; ``perform`` runs
the same function on host keys, so draws match bit-for-bit)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from aesara_tpu.link.jax.dispatch import _jax_dtype, jax_funcify
from aesara_tpu.tensor.random.op import RandomVariable


@jax_funcify.register(RandomVariable)
def _jax_random_variable(op, node=None, **kwargs):
    import jax.random as jr

    out_dtype = _jax_dtype(node.outputs[1].type.dtype) if node else None

    def sample(rng_data, size, *params):
        key = jr.wrap_key_data(jnp.asarray(rng_data, dtype=jnp.uint32))
        next_key, draw_key = jr.split(key)
        try:
            size_tuple = tuple(int(s) for s in np.asarray(size)) if np.size(size) else None
        except Exception as e:
            raise NotImplementedError(
                f"{op.name}: random draw sizes must be static under XLA"
            ) from e
        res = op.rng_fn(draw_key, size_tuple, *params)
        if out_dtype is not None:
            res = jnp.asarray(res).astype(
                jax.dtypes.canonicalize_dtype(out_dtype)
            )
        return jr.key_data(next_key).astype(jnp.uint32), res

    return sample
