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


# ---------------------------------------------------------------------------
# MRG31k3p (sandbox.rng_mrg): exact uint32 formulation — the modular
# recurrence decomposes into shift/mask rotations whose partial sums stay
# below 2^32, so the lowering is bit-exact WITHOUT 64-bit integers and
# runs natively on TPU (the published L'Ecuyer & Touzin int32 scheme).
# ---------------------------------------------------------------------------

def _mrg_advance_u32(x11, x12, x13, x21, x22, x23):
    import jax.numpy as jnp

    u = jnp.uint32
    M1 = u(2147483647)
    M2 = u(2147462579)
    # component 1: 2^22·x12 mod M1 and 2^7·x13 mod M1 are 31-bit rotations
    t1 = ((x12 & u(511)) << 22) + (x12 >> 9)
    t2 = ((x13 & u(16777215)) << 7) + (x13 >> 24)
    y = t1 + t2                      # < 2^32
    y = jnp.where(y >= M1, y - M1, y)
    y = y + x13                      # + 1·x13 → (2^7+1)·x13 total
    y = jnp.where(y >= M1, y - M1, y)
    n11, n12, n13 = y, x11, x12
    # component 2: 2^15·x mod M2 via the 2^31 ≡ 21069 decomposition
    s1 = ((x21 & u(65535)) << 15) + u(21069) * (x21 >> 16)
    s1 = jnp.where(s1 >= M2, s1 - M2, s1)
    s2 = ((x23 & u(65535)) << 15) + u(21069) * (x23 >> 16)
    s2 = jnp.where(s2 >= M2, s2 - M2, s2)
    s2 = s2 + x23
    s2 = jnp.where(s2 >= M2, s2 - M2, s2)
    s2 = s2 + s1
    s2 = jnp.where(s2 >= M2, s2 - M2, s2)
    n21, n22, n23 = s2, x21, x22
    return n11, n12, n13, n21, n22, n23


def _register_mrg_uniform():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from aesara_tpu.sandbox.rng_mrg import mrg_uniform

    @jax_funcify.register(mrg_uniform)
    def _jx_mrg_uniform(op, node=None, **kwargs):
        dtype = op.output_type.dtype
        ndim = op.output_type.ndim

        def run(rstate, size):
            u = jnp.uint32
            M1 = u(2147483647)
            try:
                shape = tuple(int(s) for s in np.asarray(size))
            except Exception as e:
                raise NotImplementedError(
                    "mrg_uniform under XLA needs a static size"
                ) from e
            n = int(np.prod(shape)) if shape else 1
            state = jnp.asarray(rstate).astype(jnp.uint32)
            n_streams = state.shape[0]
            steps = -(-n // n_streams) if n else 0
            rem = n % n_streams

            def step(carry, _):
                comps = _mrg_advance_u32(*carry)
                d = comps[0] + (M1 - comps[3])
                d = jnp.where(d >= M1, d - M1, d)
                d = jnp.where(d == u(0), M1, d)
                return comps, d

            comps0 = tuple(state[:, k] for k in range(6))
            if steps:
                final_c, draws = lax.scan(step, comps0, None, length=steps)
                # freeze streams that produced one fewer sample
                if rem:
                    prev_c, _ = lax.scan(step, comps0, None, length=steps - 1)
                    full = jnp.arange(n_streams) < rem
                    final_c = tuple(
                        jnp.where(full, cn, cp)
                        for cn, cp in zip(final_c, prev_c)
                    )
                flat = draws.reshape(-1)[:n]
            else:
                final_c = comps0
                flat = jnp.zeros((0,), jnp.uint32)
            new_state = jnp.stack(final_c, axis=1).astype(jnp.int32)
            norm = np.float32(4.6566126e-10) if dtype == "float32" else (
                4.656612873077392578125e-10
            )
            samples = (flat.astype(jnp.float64 if dtype == "float64"
                                   else jnp.float32) * norm).astype(dtype)
            return new_state, samples.reshape(shape)

        return run

    return _jx_mrg_uniform


_register_mrg_uniform()
