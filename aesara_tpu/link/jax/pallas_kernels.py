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


_LOG2E = 1.4426950408889634  # log2(e): score dots are computed in log2
_NEG = -0.7 * 3.4e38         # finite -inf stand-in (exp2 underflows to 0)


def _flash_tiling(T, D, dtype=None, causal=False):
    """Pick (BQ, BK, T_pad, D_pad).

    Single-pass mode (BK == T_pad, non-causal): the whole K/V panel is
    VMEM-resident per head, so softmax needs no online max/denominator
    bookkeeping at all — one rowmax + exp2 + rowsum per q tile.  This
    is the winning formulation in the bf16 T=2048 regime where the
    online-rescale loop is VPU-bound (benchmarks/README.md round 5).
    Falls back to the 512-tile online-softmax grid when K/V or the
    (BQ, T) score tile would not fit the VMEM budget, or when causal
    (where tile-skip over dead k tiles wins instead).
    """
    D_pad = _round_up(D, 128)
    gran = 16 if (dtype is not None and
                  np.dtype(dtype) == np.dtype("bfloat16")) else 8
    bytes_ = 2 if gran == 16 else 4
    if not causal:
        T_sp = _round_up(T, gran)
        kv_bytes = 2 * T_sp * D_pad * bytes_
        if kv_bytes <= 4 * 2**20:
            for BQ in (512, 256, 128):
                BQ_eff = min(BQ, T_sp)
                T_pad = _round_up(T, BQ_eff)
                if BQ_eff * T_pad * 4 <= 4 * 2**20:
                    return BQ_eff, T_pad, T_pad, D_pad
    BQ = min(512, _round_up(T, gran))
    BK = min(512, _round_up(T, gran))
    return BQ, BK, _round_up(T, max(BQ, BK)), D_pad


def _flash_forward(qp, kp, vp, *, T, causal, scale, dot_dtype,
                   BQ, BK, T_pad, D_pad, with_lse):
    """The flash forward pallas_call; single source of truth for both
    the user-facing forward and the backward's recompute.  Returns
    out_pad or (out_pad, lse2_pad) — the logsumexp is in **log2 units**
    (scores are computed as log2e·scale·QKᵀ so the softmax runs on
    ``exp2``, saving the per-element ln2 multiply inside every exp).

    VPU-work elision (the bf16 T=2048 fix, round 5): masking iota/
    compare/select only runs on tiles that can actually contain masked
    entries (padded tail tiles, causal diagonal tiles); causal dead
    tiles are skipped entirely; and when BK == T_pad (single-pass mode,
    see ``_flash_tiling``) the online max/denominator rescale loop
    disappears — softmax is one rowmax/exp2/rowsum per q tile.
    """
    pl, pltpu = _pl()
    BH = qp.shape[0]
    nq = T_pad // BQ
    nk = T_pad // BK
    single = (nk == 1)
    pad_cols = (T_pad != T)
    lscale = scale * _LOG2E

    def _masked_s(s, qi, j):
        col = j * BK + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        valid = col < T
        if causal:
            row = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
            valid = jnp.logical_and(valid, col <= row)
        return jnp.where(valid, s, _NEG)

    def kernel(q_ref, k_ref, v_ref, *outs_and_scratch):
        if with_lse:
            o_ref, lse_ref = outs_and_scratch[:2]
            scratch = outs_and_scratch[2:]
        else:
            o_ref = outs_and_scratch[0]
            lse_ref = None
            scratch = outs_and_scratch[1:]
        qi = pl.program_id(1)
        j = pl.program_id(2) if not single else 0

        qt = (q_ref[0] * lscale).astype(dot_dtype)
        kt = k_ref[0].astype(dot_dtype)
        vt = v_ref[0].astype(dot_dtype)

        def _s():
            return jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # (BQ, BK)

        if single:
            # one-pass softmax: no running state, no rescale
            s = _s()
            if pad_cols or causal:
                s = _masked_s(s, qi, j)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(dot_dtype), vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0] = (pv / l).astype(o_ref.dtype)
            if with_lse:
                lse_ref[0] = jnp.broadcast_to(
                    m + jnp.log2(l), (BQ, 128)).astype(jnp.float32)
            return

        m_ref, l_ref, acc_ref = scratch

        @pl.when(j == 0)
        def _init():
            m_ref[:] = jnp.full((BQ, 128), _NEG, dtype=jnp.float32)
            l_ref[:] = jnp.zeros((BQ, 128), dtype=jnp.float32)
            acc_ref[:] = jnp.zeros((BQ, D_pad), dtype=jnp.float32)

        # causal: tiles fully above the diagonal contribute nothing
        live = (j * BK <= qi * BQ + BQ - 1) if causal else (j >= 0)
        # masking only where masked entries can exist: padded tail
        # tiles, or causal tiles crossing the diagonal
        needs = jnp.array(False)
        if pad_cols:
            needs = jnp.logical_or(needs, (j + 1) * BK > T)
        if causal:
            needs = jnp.logical_or(needs, (j + 1) * BK - 1 > qi * BQ)

        def _accum(s, guarded):
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp2(s - m_new)
            if guarded:
                # a fully-masked row has m_new == _NEG and p == 1 on
                # every masked entry; zero them (can only happen on
                # masked tiles)
                p = jnp.where(s == _NEG, 0.0, p)
            alpha = jnp.exp2(m_prev - m_new)
            l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(dot_dtype), vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[:] = alpha * acc_ref[:] + pv
            m_ref[:] = jnp.broadcast_to(m_new, (BQ, 128))
            l_ref[:] = jnp.broadcast_to(l_new, (BQ, 128))

        if pad_cols or causal:
            @pl.when(jnp.logical_and(live, needs))
            def _masked():
                _accum(_masked_s(_s(), qi, j), guarded=True)

            @pl.when(jnp.logical_and(live, jnp.logical_not(needs)))
            def _clean():
                _accum(_s(), guarded=False)
        else:
            _accum(_s(), guarded=False)

        @pl.when(j == nk - 1)
        def _finish():
            l_f = jnp.where(l_ref[:, :1] == 0.0, 1.0, l_ref[:, :1])
            o_ref[0] = (acc_ref[:] / l_f).astype(o_ref.dtype)
            if with_lse:
                m_fin = jnp.where(m_ref[:, :1] == _NEG, 0.0, m_ref[:, :1])
                lse_ref[0] = jnp.broadcast_to(
                    m_fin + jnp.log2(l_f), (BQ, 128)
                ).astype(jnp.float32)

    out_shape = jax.ShapeDtypeStruct((BH, T_pad, D_pad), qp.dtype)
    grid = (BH, nq) if single else (BH, nq, nk)

    def _qmap(b, i, j=0):
        return (b, i, 0)

    def _kmap(b, i, j=None):
        return (b, 0, 0) if single else (b, j, 0)

    out_spec = pl.BlockSpec((1, BQ, D_pad), _qmap, memory_space=pltpu.VMEM)
    if with_lse:
        out_shapes = (out_shape,
                      jax.ShapeDtypeStruct((BH, T_pad, 128), jnp.float32))
        out_specs = (out_spec,
                     pl.BlockSpec((1, BQ, 128), _qmap,
                                  memory_space=pltpu.VMEM))
    else:
        out_shapes = out_shape
        out_specs = out_spec
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, D_pad), _qmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D_pad), _kmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BK, D_pad), _kmap, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[] if single else [
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
    BQ, BK, T_pad, D_pad = _flash_tiling(T, D, q.dtype, causal)

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
    gran = 16 if q.dtype == jnp.bfloat16 else 8
    BQ = BK = min(512, _round_up(T, gran))
    T_pad = _round_up(T, BK)
    D_pad = _round_up(D, 128)
    lscale = scale * _LOG2E

    def padp(a):
        return jnp.pad(a, ((0, 0), (0, T_pad - T), (0, D_pad - D)))

    qp, kp, vp, dop = padp(q), padp(k), padp(v), padp(do.astype(q.dtype))
    nq = T_pad // BQ
    nk = T_pad // BK
    pad_cols = (T_pad != T)
    dot_dtype = (jnp.bfloat16 if (bf16_dots or q.dtype == jnp.bfloat16)
                 else jnp.float32)

    # ---- pass 1: the forward kernel, keeping O + the row logsumexp
    # (log2 units — the grad kernels recompute p via exp2).  Use the
    # single-pass forward tiling when it matches this T_pad, else the
    # same tile grid as the grad kernels.
    fBQ, fBK, fT_pad, _ = _flash_tiling(T, D, q.dtype, causal)
    if fT_pad != T_pad:
        fBQ, fBK = BQ, BK
    o_pad, lse = _flash_forward(
        qp, kp, vp, T=T, causal=causal, scale=scale, dot_dtype=dot_dtype,
        BQ=fBQ, BK=fBK, T_pad=T_pad, D_pad=D_pad, with_lse=True,
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
        needs = jnp.array(False)
        if pad_cols:
            needs = jnp.logical_or(needs, (j + 1) * BK > T)
        if causal:
            needs = jnp.logical_or(needs, (j + 1) * BK - 1 > qi * BQ)

        def _accum(masked):
            qt = (q_ref[0] * lscale).astype(dot_dtype)
            kt = k_ref[0].astype(dot_dtype)
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2(s - lse_ref[0][:, :1])
            if masked:
                col = j * BK + jax.lax.broadcasted_iota(
                    jnp.int32, (BQ, BK), 1
                )
                valid = col < T
                if causal:
                    row = qi * BQ + jax.lax.broadcasted_iota(
                        jnp.int32, (BQ, BK), 0
                    )
                    valid = jnp.logical_and(valid, col <= row)
                p = jnp.where(valid, p, 0.0)
            dp = jax.lax.dot_general(
                do_ref[0].astype(dot_dtype), v_ref[0].astype(dot_dtype),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            ds = p * (dp - dd_ref[0][:, :1])
            acc_ref[:] += jax.lax.dot_general(
                ds.astype(dot_dtype), kt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if pad_cols or causal:
            @pl.when(jnp.logical_and(live, needs))
            def _masked():
                _accum(masked=True)

            @pl.when(jnp.logical_and(live, jnp.logical_not(needs)))
            def _clean():
                _accum(masked=False)
        else:
            _accum(masked=False)

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
        needs = jnp.array(False)
        if pad_cols:
            needs = jnp.logical_or(needs, (ki + 1) * BK > T)
            needs = jnp.logical_or(needs, (j + 1) * BQ > T)
        if causal:
            needs = jnp.logical_or(needs, (ki + 1) * BK - 1 > j * BQ)

        def _accum(masked):
            qt = (q_ref[0] * lscale).astype(dot_dtype)
            kt = k_ref[0].astype(dot_dtype)
            s = jax.lax.dot_general(
                qt, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2(s - lse_ref[0][:, :1])
            if masked:
                col = ki * BK + jax.lax.broadcasted_iota(
                    jnp.int32, (BQ, BK), 1
                )
                valid = col < T
                row = j * BQ + jax.lax.broadcasted_iota(
                    jnp.int32, (BQ, BK), 0
                )
                valid = jnp.logical_and(valid, row < T)
                if causal:
                    valid = jnp.logical_and(valid, col <= row)
                p = jnp.where(valid, p, 0.0)
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

        if pad_cols or causal:
            @pl.when(jnp.logical_and(live, needs))
            def _masked():
                _accum(masked=True)

            @pl.when(jnp.logical_and(live, jnp.logical_not(needs)))
            def _clean():
                _accum(masked=False)
        else:
            _accum(masked=False)

        @pl.when(j == nq - 1)
        def _finish():
            # dS carries scale·log2e through qt; dK needs exactly one
            # factor of scale overall, so divide the log2e back out
            dk_ref[0] = (dk_acc[:] * (1.0 / _LOG2E)).astype(dk_ref.dtype)
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
