"""BSS — blocked segment-slot sparse layout + Pallas SpMV for TPU.

The TPU-native ``structured_dot`` kernel (SURVEY §2.6 "segment-sum/
gather Pallas kernels"; reference counterpart: the structured-dot C
kernels in ``/root/reference/aesara/sparse/rewriting.py``).

Why not CSR/BCOO on device: XLA:TPU lowers a runtime-index gather over
an ``nnz``-long index vector to a serialized loop (measured ~14 ms for
1.3M nnz — 150x slower than the densified matvec), and Mosaic/Pallas
supports exactly ONE gather shape: lane-wise ``take_along_axis`` where
indices and operand have the SAME shape and the gather axis is the
128-lane minor axis.  BSS is the layout that turns SpMV into that
primitive:

  * rows are laid on lanes: row ``r`` -> (tile ``r // 128``, lane
    ``r % 128``),
  * columns are cut into 128-wide segments: col ``c`` -> (segment
    ``c // 128``, offset ``c % 128``),
  * for each (tile, segment, lane) cell the nnz entries are stacked on
    ``P`` sublane slots (``P`` = max cell occupancy over the matrix,
    padded to a multiple of 8).

Storage: ``val[T, S*P, 128]`` (matrix dtype) and ``lo[T, S*P, 128]``
(int8 — offsets are < 128; measured same speed as int32 at 63% of the
footprint).  The kernel needs NO segment search and NO scatter: per row
tile it statically loops segments, broadcasts the segment's 128 rhs
values across sublanes, lane-gathers by ``lo``, multiply-accumulates,
and reduces sublanes once at the end.

Measured on the real chip (16384x8192, density 0.01, f32): 83 us/SpMV
vs 722 us for the densified matvec (8.7x) and ~14 ms for the XLA gather
formulation (170x).

Exactness: padded slots carry ``val == 0`` and are masked with a
``where`` before accumulating, so implicit zeros NEVER touch the rhs —
``inf``/``nan`` entries of ``b`` poison exactly the rows whose stored
pattern hits them, matching scipy/reference CSR semantics.  (The mask
also zeroes *explicitly stored* zeros; scipy's constructors prune
those, and the measured cost is <3%.)
"""

from __future__ import annotations

import numpy as np

LANE = 128

# gate: above this max-cell-occupancy the layout's padding waste makes
# the densified matvec competitive (bytes ratio ~= 5*P/512 of dense);
# measured crossover documented in benchmarks/README.md
P_GATE = 32
# gate: per-grid-step VMEM footprint (val + lo + rhs blocks) must fit
# comfortably next to Mosaic's own scratch
VMEM_GATE_BYTES = 8 * 2**20
# gate: rhs column count above which one MXU matmul on the densified
# matrix beats C unrolled SpMV passes
C_GATE = 8


class BSSMat:
    """Device-resident BSS matrix: a jax pytree (val/lo leaves, static
    layout aux), so it crosses the ``jit`` boundary like any array and
    threads through ``lax.scan`` closures.  ``t`` optionally holds the
    transposed layout (built at bridge time when the graph transposes)."""

    __slots__ = ("val", "lo", "shape", "T", "S", "P", "dtype", "t")

    def __init__(self, val, lo, shape, T, S, P, dtype, t=None):
        self.val = val
        self.lo = lo
        self.shape = tuple(shape)
        self.T = T
        self.S = S
        self.P = P
        self.dtype = dtype
        self.t = t

    @property
    def ndim(self):
        return 2

    def transpose(self):
        if self.t is None:
            raise ValueError(
                "BSSMat has no transposed layout (bridge plan did not "
                "request one)"
            )
        # re-link so double transpose returns the original layout
        return BSSMat(self.t.val, self.t.lo, self.t.shape, self.t.T,
                      self.t.S, self.t.P, self.t.dtype,
                      t=BSSMat(self.val, self.lo, self.shape, self.T,
                               self.S, self.P, self.dtype))

    @property
    def T_(self):  # avoid clashing with the tile-count attribute ``T``
        return self.transpose()


def _flatten(m: BSSMat):
    return (m.val, m.lo, m.t), (m.shape, m.T, m.S, m.P, m.dtype)


def _unflatten(aux, children):
    val, lo, t = children
    shape, T, S, P, dtype = aux
    return BSSMat(val, lo, shape, T, S, P, dtype, t=t)


def _register_pytree():
    import jax

    jax.tree_util.register_pytree_node(BSSMat, _flatten, _unflatten)


_register_pytree()


def cell_occupancy(x) -> int:
    """Max (tile, segment, lane)-cell occupancy P of a scipy matrix —
    the gate statistic, computable without building the arrays."""
    coo = x.tocoo()
    if coo.nnz == 0:
        return 0
    S = (x.shape[1] + LANE - 1) // LANE
    r = coo.row.astype(np.int64)
    c = coo.col.astype(np.int64)
    cell = ((r // LANE) * S + (c // LANE)) * LANE + (r % LANE)
    return int(np.unique(cell, return_counts=True)[1].max())


def csr_to_bss(x, with_transpose: bool = False) -> BSSMat:
    """Host-side layout build (once per shared-value version; ~230 ms
    for 1.3M nnz).  Accepts any scipy sparse matrix."""
    import jax
    import scipy.sparse as sps

    if not sps.issparse(x):
        raise TypeError("csr_to_bss needs a scipy sparse matrix")
    n, d = x.shape
    T = max(1, (n + LANE - 1) // LANE)
    S = max(1, (d + LANE - 1) // LANE)
    coo = x.tocoo()
    coo.sum_duplicates()
    r = coo.row.astype(np.int64)
    c = coo.col.astype(np.int64)
    v = coo.data
    tile, lane = r // LANE, r % LANE
    seg, lo = c // LANE, c % LANE
    cell = (tile * S + seg) * LANE + lane
    order = np.argsort(cell, kind="stable")
    cell_s, v_s, lo_s = cell[order], v[order], lo[order]
    first = np.ones(len(cell_s), bool)
    if len(cell_s):
        first[1:] = cell_s[1:] != cell_s[:-1]
    idx_of_first = np.maximum.accumulate(
        np.where(first, np.arange(len(cell_s)), 0)
    )
    p = np.arange(len(cell_s)) - idx_of_first
    P = int(p.max()) + 1 if len(p) else 1
    P_pad = max(8, ((P + 7) // 8) * 8)
    np_dtype = np.dtype(x.dtype)
    if np_dtype == np.float64:
        np_dtype = np.dtype(np.float32)  # TPU-native precision
    val = np.zeros((T, S, P_pad, LANE), np_dtype)
    lov = np.zeros((T, S, P_pad, LANE), np.int8)
    if len(cell_s):
        t_i = cell_s // (S * LANE)
        s_i = (cell_s // LANE) % S
        l_i = cell_s % LANE
        val[t_i, s_i, p, l_i] = v_s
        lov[t_i, s_i, p, l_i] = lo_s
    t = csr_to_bss(x.T.tocsr()) if with_transpose else None
    return BSSMat(
        jax.device_put(val.reshape(T, S * P_pad, LANE)),
        jax.device_put(lov.reshape(T, S * P_pad, LANE)),
        (n, d), T, S, P_pad, np_dtype.name, t=t,
    )


def bss_eligible(x) -> bool:
    """Value-side gate (the graph-side cone gate lives in
    ``sparse_dispatch.bss_inputs``)."""
    import scipy.sparse as sps

    if not sps.issparse(x) or x.ndim != 2:
        return False
    n, d = x.shape
    if n == 0 or d == 0:
        return False
    P = cell_occupancy(x)
    P_pad = max(8, ((P + 7) // 8) * 8)
    S = (d + LANE - 1) // LANE
    block = S * P_pad * LANE * (np.dtype(x.dtype).itemsize + 1) + S * LANE * 4
    return P_pad <= P_GATE and block <= VMEM_GATE_BYTES


def bss_matmul(a: BSSMat, b):
    """``a @ b`` for BSS ``a`` and dense ``b`` of shape (d,) or (d, C).
    Returns (n,) / (n, C).  Two kernels, auto-routed by C:

    * C <= C_GATE: the lane-gather SpMV kernel (one
      ``take_along_axis`` + multiply-accumulate per segment per column).
    * C > C_GATE (the ML SpMM shape — sparse weights x dense activation
      batch): per (row-tile, 128-wide C tile) the kernel densifies each
      128x128 segment block IN VMEM from the slot layout (P
      compare-select passes — no scatter, Mosaic has none) and runs it
      through the MXU against the rhs segment, f32 accumulation.  The
      block build costs P*128*128 VPU selects per segment and is reused
      across the whole 128-column tile; bf16 operands run the MXU in
      native bf16 (round 5; measured crossover table in
      benchmarks/README.md).

    Runs the Pallas TPU kernel on TPU backends and the Pallas
    interpreter elsewhere (tests on the 8-device virtual CPU mesh
    exercise the same kernel bodies)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = a.shape
    T, S, P = a.T, a.S, a.P
    b = jnp.asarray(b)
    vec = b.ndim == 1
    b2 = b[:, None] if vec else b
    C = b2.shape[1]
    if C > C_GATE:
        return _bss_matmul_wide(a, b2)
    out_dtype = jnp.result_type(a.val.dtype, b.dtype)

    # pad rhs into (C, S, 128) segment planes (traced; XLA fuses)
    bp = jnp.pad(b2, ((0, S * LANE - d), (0, 0)))
    bseg = jnp.transpose(bp.reshape(S, LANE, C), (2, 0, 1))

    def kernel(val_ref, lo_ref, b_ref, out_ref):
        accs = [jnp.zeros((P, LANE), jnp.float32) for _ in range(C)]
        for s in range(S):
            vals = val_ref[0, s * P:(s + 1) * P, :].astype(jnp.float32)
            los = lo_ref[0, s * P:(s + 1) * P, :].astype(jnp.int32)
            for c in range(C):
                brow = jnp.broadcast_to(b_ref[c, s:s + 1, :], (P, LANE))
                g = jnp.take_along_axis(brow, los, axis=1)
                # mask padded slots: implicit zeros never touch b
                accs[c] = accs[c] + jnp.where(vals == 0.0, 0.0, vals * g)
        for c in range(C):
            out_ref[0, c, :, :] = jnp.broadcast_to(
                jnp.sum(accs[c], axis=0)[None, :], (8, LANE)
            ).astype(out_ref.dtype)

    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, C, 8, LANE), out_dtype),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S * P, LANE), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S * P, LANE), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, S, LANE), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, 8, LANE), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a.val, a.lo, bseg)
    res = jnp.transpose(out[:, :, 0, :], (0, 2, 1)).reshape(T * LANE, C)[:n]
    return res[:, 0] if vec else res


def _bss_matmul_wide(a: BSSMat, b2):
    """Wide-rhs SpMM: block-densify each segment in VMEM, MXU matmul.

    Grid (T, C_tiles); per step loops the S segments, expanding the
    (P, LANE) slot stack into the dense (LANE_rows, LANE_cols) block via
    P compare-select passes against a column iota, then accumulates
    ``block @ b_seg`` (MXU, f32 accumulate).  Padded slots carry
    ``val == 0`` and are masked, so implicit zeros never touch b.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = a.shape
    T, S, P = a.T, a.S, a.P
    C = b2.shape[1]
    out_dtype = jnp.result_type(a.val.dtype, b2.dtype)
    dot_dtype = (jnp.bfloat16
                 if (a.val.dtype == jnp.bfloat16 or b2.dtype == jnp.bfloat16)
                 else jnp.float32)
    CT = 128
    C_pad = _round_up_bss(C, CT)
    nc = C_pad // CT
    bp = jnp.pad(b2.astype(dot_dtype),
                 ((0, S * LANE - d), (0, C_pad - C)))

    def kernel(val_ref, lo_ref, b_ref, out_ref, acc_ref):
        s = pl.program_id(2)

        @pl.when(s == 0)
        def _init():
            acc_ref[:] = jnp.zeros((LANE, CT), jnp.float32)

        col = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
        vals = val_ref[0]
        los = lo_ref[0].astype(jnp.int32)
        # dense (rows, cols) block: rows are lanes of the slot stack, so
        # slot plane p scatters val[p, r] to (r, lo[p, r]) — expressed
        # as a compare-select against the column iota (no scatter on
        # Mosaic); distinct slots of one cell always carry distinct lo
        # (duplicates were summed at layout build), so writes never race
        block = jnp.zeros((LANE, LANE), dot_dtype)
        for p in range(P):
            lo_r = los[p, :][:, None]                      # (LANE, 1)
            v_r = vals[p, :][:, None].astype(dot_dtype)
            hit = jnp.logical_and(col == lo_r, v_r != 0)
            block = jnp.where(hit, v_r, block)
        acc_ref[:] += jax.lax.dot_general(
            block, b_ref[0, 0].astype(dot_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(s == S - 1)
        def _finish():
            out_ref[0] = acc_ref[:].astype(out_ref.dtype)

    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, LANE, C_pad), out_dtype),
        grid=(T, nc, S),
        in_specs=[
            pl.BlockSpec((1, P, LANE), lambda t, j, s: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, LANE), lambda t, j, s: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANE, CT), lambda t, j, s: (0, s, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LANE, CT), lambda t, j, s: (t, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((LANE, CT), jnp.float32)],
        interpret=interpret,
    )(a.val, a.lo, bp.reshape(1, S, LANE, C_pad))
    return out.reshape(T * LANE, C_pad)[:n, :C]


def _round_up_bss(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bss_sddmm(a: BSSMat, gz, b):
    """SDDMM — ``(gz @ bᵀ)`` sampled at ``a``'s pattern, returned as a
    BCOO matrix (the native StructuredDotGradA, reference
    ``sparse/basic.py`` gA).

    Per (row-tile, segment) the kernel computes the dense 128x128 grad
    block ``G = gz_tile @ b_segᵀ`` on the MXU, then lane-gathers
    ``G[lane, lo]`` per slot plane — the only gather Mosaic supports.
    Slot coordinates are DERIVABLE from the layout (row = tile·128+lane,
    col = seg·128+lo), so the BCOO indices are pure iota/lo arithmetic:
    no serialized nnz-long gather anywhere.  Padded slots emit explicit
    zeros (valid coords, zero data) — harmless to BCOO consumers.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental import sparse as jsparse

    n, d = a.shape
    T, S, P = a.T, a.S, a.P
    gz = jnp.asarray(gz)
    b = jnp.asarray(b)
    gz2 = gz[:, None] if gz.ndim == 1 else gz
    b2 = b[:, None] if b.ndim == 1 else b
    C = b2.shape[1]
    C_pad = _round_up_bss(C, LANE if C > 8 else 8)
    dot_dtype = (jnp.bfloat16
                 if (gz2.dtype == jnp.bfloat16 or b2.dtype == jnp.bfloat16)
                 else jnp.float32)
    gzp = jnp.pad(gz2.astype(dot_dtype),
                  ((0, T * LANE - gz2.shape[0]), (0, C_pad - C)))
    bp = jnp.pad(b2.astype(dot_dtype),
                 ((0, S * LANE - d), (0, C_pad - C)))
    out_dtype = a.val.dtype

    def kernel(gz_ref, b_ref, val_ref, lo_ref, out_ref):
        g = jax.lax.dot_general(
            gz_ref[0], b_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                             # (LANE_r, LANE_c)
        los = lo_ref[0].astype(jnp.int32)             # (P, LANE)
        vals = val_ref[0]
        idx = jnp.concatenate(
            [jnp.transpose(los),
             jnp.zeros((LANE, LANE - P), jnp.int32)], axis=1,
        )                                             # (LANE_r, LANE)
        got = jnp.take_along_axis(g, idx, axis=1)     # [r, p] = g[r, lo]
        sampled = jnp.transpose(got[:, :P])           # (P, LANE)
        out_ref[0] = jnp.where(vals == 0, 0.0,
                               sampled).astype(out_ref.dtype)

    interpret = jax.default_backend() not in ("tpu", "axon")
    slot_vals = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, S * P, LANE), out_dtype),
        grid=(T, S),
        in_specs=[
            pl.BlockSpec((1, LANE, C_pad), lambda t, s: (0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANE, C_pad), lambda t, s: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, LANE), lambda t, s: (t, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, LANE), lambda t, s: (t, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, LANE), lambda t, s: (t, s, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gzp.reshape(1, T * LANE, C_pad), bp.reshape(1, S, LANE, C_pad),
      a.val, a.lo)

    # slot coords from layout arithmetic (no gather): row = t·128+lane,
    # col = s·128+lo
    rows = jnp.broadcast_to(
        (jnp.arange(T, dtype=jnp.int32)[:, None, None] * LANE
         + jnp.arange(LANE, dtype=jnp.int32)[None, None, :]),
        (T, S * P, LANE))
    seg = jnp.broadcast_to(
        (jnp.arange(S, dtype=jnp.int32)[:, None] * LANE)
        .repeat(P, axis=0)[None, :, :1],
        (T, S * P, LANE))
    cols = seg + a.lo.astype(jnp.int32)
    indices = jnp.stack([rows.reshape(-1), cols.reshape(-1)], axis=1)
    data = slot_vals.reshape(-1)
    return jsparse.BCOO((data, indices), shape=(n, d))
