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


def use_flash_for(shape, dtype, min_seqlen: int) -> bool:
    """Gate for the FlashAttention kernels — independent of the elemwise
    ``pallas_fusion`` opt-in, because attention is a MEASURED win
    (benchmarks/README.md: forward 1.26–1.47x from T>=2048, backward
    1.57–2.55x from T>=1024) and defaults ON for TPU ('auto')."""
    from aesara_tpu.config import config

    if config.flash_attention == "off":
        return False
    try:
        on_tpu = jax.default_backend() != "cpu"
    except Exception:
        on_tpu = False
    if str(np.dtype(dtype)) not in ("float32", "bfloat16"):
        return False
    if config.flash_attention == "on":
        return True
    return on_tpu and shape[1] >= min_seqlen


def _flash_tiling(T, D):
    BQ = min(512, _round_up(T, 8))
    BK = min(512, _round_up(T, 8))
    return BQ, BK, _round_up(T, max(BQ, BK)), _round_up(D, 128)


def _flash_forward(qp, kp, vp, *, T, causal, scale, dot_dtype,
                   BQ, BK, T_pad, D_pad, with_lse):
    """The online-softmax forward pallas_call; single source of truth
    for both the user-facing forward and the backward's recompute.
    Returns out_pad or (out_pad, lse_pad)."""
    pl, pltpu = _pl()
    BH = qp.shape[0]
    nq = T_pad // BQ
    nk = T_pad // BK

    def kernel(q_ref, k_ref, v_ref, *outs_and_scratch):
        if with_lse:
            o_ref, lse_ref, m_ref, l_ref, acc_ref = outs_and_scratch
        else:
            o_ref, m_ref, l_ref, acc_ref = outs_and_scratch
            lse_ref = None
        qi = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full((BQ, 128), -jnp.inf, dtype=jnp.float32)
            l_ref[:] = jnp.zeros((BQ, 128), dtype=jnp.float32)
            acc_ref[:] = jnp.zeros((BQ, D_pad), dtype=jnp.float32)

        qt = (q_ref[0] * scale).astype(dot_dtype)
        kt = k_ref[0].astype(dot_dtype)
        vt = v_ref[0].astype(dot_dtype)
        s = jax.lax.dot_general(
            qt, kt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                   # (BQ, BK)
        col = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        valid = col < T
        if causal:
            row = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            valid = jnp.logical_and(valid, col <= row)
        s = jnp.where(valid, s, -jnp.inf)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - m_safe)
        p = jnp.where(valid, p, 0.0)
        alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(dot_dtype), vt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = alpha * acc_ref[:] + pv
        m_ref[:] = jnp.broadcast_to(m_new, (BQ, 128))
        l_ref[:] = jnp.broadcast_to(l_new, (BQ, 128))

        @pl.when(j == nk - 1)
        def _finish():
            l_f = jnp.where(l_ref[:, :1] == 0.0, 1.0, l_ref[:, :1])
            o_ref[0] = (acc_ref[:] / l_f).astype(o_ref.dtype)
            if with_lse:
                m_fin = jnp.where(
                    jnp.isfinite(m_ref[:, :1]), m_ref[:, :1], 0.0
                )
                lse_ref[0] = jnp.broadcast_to(
                    m_fin + jnp.log(l_f), (BQ, 128)
                ).astype(jnp.float32)

    out_shape = jax.ShapeDtypeStruct((BH, T_pad, D_pad), qp.dtype)
    out_spec = pl.BlockSpec((1, BQ, D_pad), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    if with_lse:
        out_shapes = (out_shape,
                      jax.ShapeDtypeStruct((BH, T_pad, 128), jnp.float32))
        out_specs = (out_spec,
                     pl.BlockSpec((1, BQ, 128), lambda b, i, j: (b, i, 0),
                                  memory_space=pltpu.VMEM))
    else:
        out_shapes = out_shape
        out_specs = out_spec
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, BQ, D_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, 128), jnp.float32),
            pltpu.VMEM((BQ, D_pad), jnp.float32),
        ],
    )(qp, kp, vp)


def flash_attention(q, k, v, causal: bool = False, scale: float | None = None,
                    bf16_dots: bool = False):
    """Fused attention with online softmax — the (T, T) score matrix
    never touches HBM.

    Canonical TPU grid structure: grid = (BH, q_tiles, k_tiles) with the
    k axis innermost — TPU executes the grid sequentially over the last
    axis, so the running max / denominator / accumulator live in VMEM
    scratch across k steps while Pallas pipelines the next k/v tile's
    HBM→VMEM copy under the current tile's compute.

    q, k, v: (BH, T, D).  ``bf16_dots`` runs both MXU matmuls in
    bfloat16 with f32 accumulation (the MXU's native mode); bf16 inputs
    do so automatically.
    """
    BH, T, D = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    BQ, BK, T_pad, D_pad = _flash_tiling(T, D)

    def padp(a):
        return jnp.pad(a, ((0, 0), (0, T_pad - T), (0, D_pad - D)))

    dot_dtype = (jnp.bfloat16 if (bf16_dots or q.dtype == jnp.bfloat16)
                 else jnp.float32)
    out = _flash_forward(
        padp(q), padp(k), padp(v), T=T, causal=causal, scale=scale,
        dot_dtype=dot_dtype, BQ=BQ, BK=BK, T_pad=T_pad, D_pad=D_pad,
        with_lse=False,
    )
    return out[:, :T, :D]


def flash_attention_grads(q, k, v, do, causal: bool = False,
                          scale: float | None = None,
                          bf16_dots: bool = False):
    """FlashAttention backward: (dq, dk, dv) without ever materializing
    the (T, T) score matrix in HBM.

    FlashAttention-2 structure: re-run the forward once keeping only the
    per-row logsumexp, precompute D = rowsum(dO ⊙ O), then
        S = scale·QKᵀ, P = exp(S − lse), dP = dO·Vᵀ,
        dS = P ⊙ (dP − D), dQ = scale·dS·K, dK = scale·dSᵀ·Q, dV = Pᵀ·dO
    with two sequential-accumulation kernels: dq over k tiles
    (grid (BH, q_tiles, k_tiles)) and dk/dv over q tiles
    (grid (BH, k_tiles, q_tiles)) — running accumulators live in VMEM
    scratch across the innermost axis, like the forward.
    """
    pl, pltpu = _pl()
    BH, T, D = q.shape
    if scale is None:
        scale = 1.0 / float(np.sqrt(D))
    BQ, BK, T_pad, D_pad = _flash_tiling(T, D)

    def padp(a):
        return jnp.pad(a, ((0, 0), (0, T_pad - T), (0, D_pad - D)))

    qp, kp, vp, dop = padp(q), padp(k), padp(v), padp(do.astype(q.dtype))
    nq = T_pad // BQ
    nk = T_pad // BK
    dot_dtype = (jnp.bfloat16 if (bf16_dots or q.dtype == jnp.bfloat16)
                 else jnp.float32)

    # ---- pass 1: the SAME forward kernel, keeping O + row logsumexp ----
    o_pad, lse = _flash_forward(
        qp, kp, vp, T=T, causal=causal, scale=scale, dot_dtype=dot_dtype,
        BQ=BQ, BK=BK, T_pad=T_pad, D_pad=D_pad, with_lse=True,
    )

    # D_i = rowsum(dO ⊙ O), broadcast into the (…, 128) lane layout
    dd = jnp.sum(dop.astype(jnp.float32) * o_pad.astype(jnp.float32),
                 axis=-1)
    dd = jnp.broadcast_to(dd[:, :, None], (BH, T_pad, 128))

    # ---- pass 2: dQ, accumulating over k tiles ----
    def dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref, dq_ref,
                  acc_ref):
        qi = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            acc_ref[:] = jnp.zeros((BQ, D_pad), dtype=jnp.float32)

        live = ((j * BK) <= (qi * BQ + BQ - 1)) if causal else (j >= 0)

        @pl.when(live)
        def _accum():
            qt = (q_ref[0] * scale).astype(dot_dtype)
            kt = k_ref[0].astype(dot_dtype)
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
            valid = col < T
            if causal:
                row = qi * BQ + jax.lax.broadcasted_iota(
                    jnp.int32, (BQ, BK), 0
                )
                valid = jnp.logical_and(valid, col <= row)
            p = jnp.where(valid, jnp.exp(s - lse_ref[0][:, :1]), 0.0)
            dp = jax.lax.dot_general(
                do_ref[0].astype(dot_dtype), v_ref[0].astype(dot_dtype),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            ds = p * (dp - dd_ref[0][:, :1])
            acc_ref[:] += jax.lax.dot_general(
                ds.astype(dot_dtype), kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(j == nk - 1)
        def _finish():
            dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)

    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct((BH, T_pad, D_pad), q.dtype),
        grid=(BH, nq, nk),
        in_specs=[
            pl.BlockSpec((1, BQ, D_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, D_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, D_pad), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BQ, D_pad), jnp.float32)],
    )(qp, kp, vp, dop, lse, dd)

    # ---- pass 3: dK and dV, accumulating over q tiles ----
    def dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dd_ref,
                   dk_ref, dv_ref, dk_acc, dv_acc):
        ki = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _init():
            dk_acc[:] = jnp.zeros((BK, D_pad), dtype=jnp.float32)
            dv_acc[:] = jnp.zeros((BK, D_pad), dtype=jnp.float32)

        live = ((j * BQ + BQ - 1) >= (ki * BK)) if causal else (j >= 0)

        @pl.when(live)
        def _accum():
            qt = (q_ref[0] * scale).astype(dot_dtype)
            kt = k_ref[0].astype(dot_dtype)
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col = ki * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
            valid = col < T
            row = j * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            valid = jnp.logical_and(valid, row < T)
            if causal:
                valid = jnp.logical_and(valid, col <= row)
            p = jnp.where(valid, jnp.exp(s - lse_ref[0][:, :1]), 0.0)
            dot = do_ref[0].astype(dot_dtype)
            dv_acc[:] += jax.lax.dot_general(
                p.astype(dot_dtype), dot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                dot, v_ref[0].astype(dot_dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - dd_ref[0][:, :1])
            dk_acc[:] += jax.lax.dot_general(
                ds.astype(dot_dtype), qt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(j == nq - 1)
        def _finish():
            # dS already carries one factor of scale through qt; dK needs
            # exactly one overall — qt folded it in, so none extra here
            dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((BH, T_pad, D_pad), q.dtype),
            jax.ShapeDtypeStruct((BH, T_pad, D_pad), q.dtype),
        ),
        grid=(BH, nk, nq),
        in_specs=[
            pl.BlockSpec((1, BK, D_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, D_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, D_pad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 128), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BQ, 128), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, BK, D_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D_pad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((BK, D_pad), jnp.float32),
            pltpu.VMEM((BK, D_pad), jnp.float32),
        ],
    )(kp, vp, qp, dop, lse, dd)

    return dq[:, :T, :D], dk[:, :T, :D], dv[:, :T, :D]
