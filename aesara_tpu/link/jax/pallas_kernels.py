"""Pallas TPU kernels: the native device-code layer.

SURVEY §7 stage 9: the reference's hand-written C kernels (elemwise
OpenMP loops, softmax C code) map here to Pallas VPU kernels.  XLA's own
fusion already covers most elemwise chains, so these kernels are the
*explicit* path — enabled with ``config.pallas_fusion`` — and the place
where hand-tuned kernels (softmax rows, logsumexp) live.

Kernels:
- ``composite_pallas_fn``: one VPU kernel evaluating a whole
  ``Elemwise(Composite)`` fused chain over row tiles.
- ``softmax_rows`` / ``log_softmax_rows``: row-softmax with on-chip
  max/sum (single VMEM pass per tile).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def composite_pallas_fn(composite, out_dtype) -> Callable:
    """Build fn(*same-shape arrays) → array applying the fused scalar
    chain in one pallas_call (VPU row tiles)."""
    from aesara_tpu.link.jax.dispatch import composite_jax_impl

    chain = composite_jax_impl(composite)

    def fused(*args):
        pl, pltpu = _pl()
        shape = args[0].shape
        n = int(np.prod(shape)) if shape else 1
        LANES = 128
        SUBLANES = 8
        tile_rows = 256  # (256, 128) f32 tile = 128 KiB per input
        padded = _round_up(max(n, 1), LANES * SUBLANES)
        rows = padded // LANES
        grid = (max(1, (rows + tile_rows - 1) // tile_rows),)
        rows_padded = grid[0] * tile_rows

        def prep(a):
            flat = jnp.ravel(a).astype(out_dtype)
            flat = jnp.pad(flat, (0, rows_padded * LANES - n))
            return flat.reshape(rows_padded, LANES)

        ins = [prep(a) for a in args]

        def kernel(*refs):
            *in_refs, out_ref = refs
            vals = [r[:] for r in in_refs]
            res = chain(*vals)
            if isinstance(res, tuple):
                res = res[0]
            out_ref[:] = res.astype(out_ref.dtype)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows_padded, LANES), out_dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in ins
            ],
            out_specs=pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(*ins)
        return out.reshape(-1)[:n].reshape(shape)

    return fused


def softmax_rows(x, log: bool = False):
    """Row softmax over the last axis as one Pallas kernel: per-tile
    max/exp/sum entirely in VMEM (the reference's Softmax C kernel role,
    ``tensor/special.py``)."""
    pl, pltpu = _pl()
    orig_shape = x.shape
    x2 = x.reshape(-1, orig_shape[-1])
    m, n = x2.shape
    LANES = 128
    n_pad = _round_up(n, LANES)
    ROWS = 8
    m_pad = _round_up(m, ROWS)
    xp = jnp.pad(x2, ((0, m_pad - m), (0, n_pad - n)),
                 constant_values=-jnp.inf)
    grid = (m_pad // ROWS,)

    def kernel(in_ref, out_ref):
        v = in_ref[:]
        mx = jnp.max(v, axis=1, keepdims=True)
        # guard fully-padded rows (max = -inf)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        e = jnp.exp(v - mx)
        s = jnp.sum(e, axis=1, keepdims=True)
        if log:
            out_ref[:] = (v - mx) - jnp.log(s)
        else:
            out_ref[:] = e / s

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x2.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((ROWS, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ROWS, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(xp)
    return out[:m, :n].reshape(orig_shape)


def log_softmax_rows(x):
    return softmax_rows(x, log=True)


def use_pallas_for(shape, dtype) -> bool:
    """Gate: pallas fusion enabled, on a TPU backend, array big enough,
    float dtype."""
    from aesara_tpu.config import config

    if not config.pallas_fusion:
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    if str(np.dtype(dtype)) not in ("float32", "bfloat16"):
        return False
    n = int(np.prod(shape)) if shape else 1
    return n >= config.pallas_fusion_min_size
