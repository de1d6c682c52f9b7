"""XLA lowerings for sparse ops via jax.experimental.sparse BCOO.

Sparse VALUES cannot cross the jit boundary as scipy objects, so graphs
whose sparse leaves are constants (or built via CSM from dense parts)
lower fully; sparse function INPUTS run on the py path (same boundary as
the reference's JAX backend).  ``structured_dot`` maps to
``bcoo_dot_general`` — the gather/segment-sum formulation of
SURVEY §2.6.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from aesara_tpu.link.jax.dispatch import jax_funcify, jax_typify
from aesara_tpu.sparse import basic as sb


def _to_bcoo(val):
    from jax.experimental import sparse as jsparse

    if sp.issparse(val):
        coo = val.tocoo()
        indices = jnp.stack(
            [jnp.asarray(coo.row, jnp.int32), jnp.asarray(coo.col, jnp.int32)], axis=1
        )
        return jsparse.BCOO((jnp.asarray(coo.data), indices), shape=val.shape)
    return val


def _is_bcoo(v) -> bool:
    return type(v).__name__ == "BCOO"


# Ops whose lowerings below tolerate a DENSE array where the graph says
# sparse (each has exactly one sparse operand and a branch on _is_bcoo).
# Used by the linker's densify bridge: random scatter/gather is slow on
# TPU while the MXU is not, so a moderate-size sparse function input is
# cheaper as ONE host-side densify + plain dense compute than as BCOO
# scatter work every call (measured: the sparse-GLM BASELINE config is
# scatter-bound as BCOO and MXU-bound densified — benchmarks/README.md).
def _densify_safe_op_types():
    from aesara_tpu.tensor.shape import Shape, Shape_i

    return (
        Shape,  # shape is densify-invariant (dense.shape == sparse.shape)
        Shape_i,
        sb.StructuredDot,
        sb.Dot,
        sb.Usmm,
        sb.Transpose,
        sb.Neg,
        sb.SpSum,
        sb.DenseFromSparse,
        sb.MulSD,
        sb.MulSV,
        sb.AddSD,
        sb.SamplingDot,
        sb.Diag,
    )


def _scan_inner_input(node, idx):
    """Inner-fgraph input variable fed by outer Scan input ``idx``, for
    the positions a sparse value can occupy (shared / non-sequence).
    Returns None for positions that stack or slice (seqs, recurrences) —
    a sparse value there cannot be bridged dense."""
    info = node.op.info
    n_mit = len(info.mit_sot_taps)
    n_mit_taps = sum(len(t) for t in info.mit_sot_taps)
    o_shared0 = 1 + info.n_seqs + n_mit + info.n_sit_sot
    o_nonseq0 = o_shared0 + info.n_shared
    i_shared0 = info.n_seqs + n_mit_taps + info.n_sit_sot
    if o_shared0 <= idx < o_nonseq0:
        return node.op.inner_inputs[i_shared0 + (idx - o_shared0)]
    if idx >= o_nonseq0:
        k = idx - o_nonseq0
        if k >= info.n_non_seqs:
            return None
        return node.op.inner_inputs[i_shared0 + info.n_shared + k]
    return None


def densifiable_inputs(fgraph) -> list:
    """Per-fgraph-input flag: True when the input is sparse-typed and its
    entire sparse cone — every sparse-typed variable reachable from it
    through op applications, including through ``Scan``/``OpFromGraph``
    inner graphs — is consumed only by densify-safe ops (one sparse
    operand each) and never escapes as a (sub)graph output.  Such an
    input may be bridged onto the device as a dense array."""
    from aesara_tpu.sparse.basic import SparseTensorType
    from aesara_tpu.scan.op import Scan

    safe = _densify_safe_op_types()

    def cone_ok(start) -> bool:
        seen = set()
        stack = [(fgraph, start)]
        while stack:
            g, v = stack.pop()
            key = (id(g), v)
            if key in seen:
                continue
            seen.add(key)
            if v in g.outputs:
                return False
            clients = getattr(g, "clients", None)
            if clients is None:
                # inner FunctionGraphs keep a clients mapping too; if one
                # somehow lacks it, refuse rather than guess
                return False
            for node, idx in (clients.get(v, ()) if hasattr(clients, "get")
                              else clients(v)):
                if node == "output":
                    return False
                op = getattr(node, "op", None)
                if isinstance(op, Scan):
                    iv = _scan_inner_input(node, idx)
                    if iv is None:
                        return False
                    stack.append((op.fgraph, iv))
                    continue
                inner_fg = getattr(op, "fgraph", None)
                if inner_fg is not None and not isinstance(op, safe):
                    # generic HasInnerGraph (OpFromGraph): 1:1 input map
                    if len(node.inputs) != len(inner_fg.inputs):
                        return False
                    stack.append((inner_fg, inner_fg.inputs[idx]))
                    continue
                if not isinstance(op, safe):
                    return False
                if sum(
                    isinstance(i.type, SparseTensorType) for i in node.inputs
                ) != 1:
                    return False
                stack.extend(
                    (g, o) for o in node.outputs
                    if isinstance(o.type, SparseTensorType)
                )
        return True

    return [
        isinstance(inp.type, SparseTensorType) and cone_ok(inp)
        for inp in fgraph.inputs
    ]


def _bss_cols_ok(b) -> bool:
    """rhs column count must be static: ``bss_matmul`` routes narrow C
    to the lane-gather SpMV kernel and wide C to the block-densify MXU
    SpMM kernel (round 5), so any static width is admissible."""
    if b.type.ndim == 1:
        return True
    if b.type.ndim == 2:
        return b.type.shape[1] is not None
    return False


def bss_inputs(fgraph) -> list:
    """Per-fgraph-input BSS bridge plan: ``{"transpose": bool}`` when
    the input is sparse-typed and its whole sparse cone is consumed only
    by ``StructuredDot`` (sparse lhs, static narrow rhs), ``Usmm`` (x
    slot), ``Transpose`` and shape ops — the ops the BSS Pallas kernel
    covers — else ``None``.  ``transpose`` records whether the bridge
    must build the transposed layout too (the grad graph's
    ``structured_dot(x.T, gz)`` pattern).

    float32 only: BSS stores values at f32 (TPU-native), so a float64
    graph would silently lose precision on backends where f64 is real
    (the CPU test mesh) — those keep the densify/BCOO bridges."""
    from aesara_tpu.sparse.basic import SparseTensorType
    from aesara_tpu.scan.op import Scan
    from aesara_tpu.tensor.shape import Shape, Shape_i

    def plan_for(start):
        state = {"transpose": False}
        seen = set()
        stack = [(fgraph, start)]
        while stack:
            g, v = stack.pop()
            key = (id(g), v)
            if key in seen:
                continue
            seen.add(key)
            if v in g.outputs:
                return None
            clients = getattr(g, "clients", None)
            if clients is None:
                return None
            for node, idx in (clients.get(v, ()) if hasattr(clients, "get")
                              else clients(v)):
                if node == "output":
                    return None
                op = getattr(node, "op", None)
                if isinstance(op, Scan):
                    iv = _scan_inner_input(node, idx)
                    if iv is None:
                        return None
                    stack.append((op.fgraph, iv))
                    continue
                inner_fg = getattr(op, "fgraph", None)
                if inner_fg is not None:
                    if len(node.inputs) != len(inner_fg.inputs):
                        return None
                    stack.append((inner_fg, inner_fg.inputs[idx]))
                    continue
                if isinstance(op, sb.StructuredDot):
                    if idx != 0 or not _bss_cols_ok(node.inputs[1]):
                        return None
                elif isinstance(op, sb.StructuredDotGradA):
                    # pattern-only use (slot 2): the native SDDMM kernel
                    # reads the layout's lo/val planes directly
                    if idx != 2:
                        return None
                elif isinstance(op, sb.Usmm):
                    if (idx != 1
                            or isinstance(node.inputs[2].type,
                                          SparseTensorType)
                            or not _bss_cols_ok(node.inputs[2])):
                        return None
                elif isinstance(op, sb.Transpose):
                    state["transpose"] = True
                    stack.append((g, node.outputs[0]))
                elif isinstance(op, (Shape, Shape_i)):
                    pass
                else:
                    return None
        return state

    return [
        plan_for(inp)
        if (isinstance(inp.type, SparseTensorType)
            and inp.type.dtype == "float32") else None
        for inp in fgraph.inputs
    ]


@jax_funcify.register(sb.StructuredDot)
def _jx_structured_dot(op, node=None, **kw):
    def structured_dot(a, b):
        from aesara_tpu.link.jax.bss import BSSMat, bss_matmul

        if isinstance(a, BSSMat):  # BSS bridge value: Pallas kernel
            return bss_matmul(a, b)
        a = _to_bcoo(a)
        return a @ jnp.asarray(b)

    return structured_dot


@jax_funcify.register(sb.Dot)
def _jx_sparse_dot(op, node=None, **kw):
    def sparse_dot(a, b):
        a = _to_bcoo(a)
        b = _to_bcoo(b)
        res = a @ b
        from jax.experimental import sparse as jsparse

        if isinstance(res, jsparse.BCOO):
            res = res.todense()
        return res

    return sparse_dot


@jax_funcify.register(sb.DenseFromSparse)
def _jx_dense_from_sparse(op, node=None, **kw):
    def dense_from_sparse(x):
        from jax.experimental import sparse as jsparse

        x = _to_bcoo(x)
        if isinstance(x, jsparse.BCOO):
            return x.todense()
        return jnp.asarray(x)

    return dense_from_sparse


@jax_funcify.register(sb.SparseFromDense)
def _jx_sparse_from_dense(op, node=None, **kw):
    def sparse_from_dense(x):
        import jax as _jax
        from jax.experimental import sparse as jsparse

        x = jnp.asarray(x)
        if isinstance(x, _jax.core.Tracer):
            # under jit the nonzero count is data-dependent; pin nse to
            # the dense bound so the shape stays static (downstream nnz
            # work degrades to size work, but the graph compiles)
            return jsparse.BCOO.fromdense(x, nse=int(np.prod(x.shape)))
        return jsparse.BCOO.fromdense(x)

    return sparse_from_dense


@jax_funcify.register(sb.Usmm)
def _jx_usmm(op, node=None, **kw):
    def usmm(alpha, x, y, z):
        from aesara_tpu.link.jax.bss import BSSMat, bss_matmul

        if isinstance(x, BSSMat):
            return alpha * bss_matmul(x, jnp.asarray(y)) + z
        x = _to_bcoo(x)
        y = _to_bcoo(y)
        res = x @ y
        from jax.experimental import sparse as jsparse

        if isinstance(res, jsparse.BCOO):
            res = res.todense()
        return alpha * res + z

    return usmm


@jax_funcify.register(sb.CSM)
def _jx_csm(op, node=None, **kw):
    def csm(data, indices, indptr, shape):
        from jax.experimental import sparse as jsparse

        # CSR parts → BCOO coordinates (device-side expansion)
        shape_t = tuple(int(s) for s in np.asarray(shape))
        indptr = jnp.asarray(indptr, jnp.int32)
        counts = jnp.diff(indptr)
        # a TRACED data array still has a static leading dim under jit —
        # that is exactly the total_repeat_length jnp.repeat needs
        # (gating on Tracer-ness crashed every traced-data CSM whose
        # counts weren't concrete, e.g. the sparse Diag gradient)
        n_data = np.shape(data)[0]
        major = jnp.repeat(
            jnp.arange(len(counts), dtype=jnp.int32), counts,
            total_repeat_length=int(n_data) if isinstance(n_data, int)
            else None,
        )
        minor = jnp.asarray(indices, jnp.int32)
        if op.format == "csr":
            coords = jnp.stack([major, minor], axis=1)
        else:
            coords = jnp.stack([minor, major], axis=1)
        return jsparse.BCOO((jnp.asarray(data), coords), shape=shape_t)

    return csm


@jax_funcify.register(sb.Transpose)
def _jx_sparse_transpose(op, node=None, **kw):
    def transpose(x):
        from aesara_tpu.link.jax.bss import BSSMat

        if isinstance(x, BSSMat):
            return x.transpose()
        return _to_bcoo(x).T

    return transpose


@jax_funcify.register(sb.Neg)
def _jx_sparse_neg(op, node=None, **kw):
    return lambda x: -_to_bcoo(x)


@jax_funcify.register(sb.CSMProperties)
def _jx_csm_properties(op, node=None, **kw):
    fmt = node.inputs[0].type.format if node is not None else "csr"

    def csm_properties(x):
        from jax.experimental import sparse as jsparse

        x = _to_bcoo(x)
        if not isinstance(x, jsparse.BCOO):  # densified bridge value
            # CSR/CSC with EXPLICIT zeros: every cell stored, so nse is
            # the static m*n and CSM(data, indices, indptr, shape)
            # rebuilds the same matrix
            x = jnp.asarray(x)
            m, n = x.shape
            if fmt == "csr":
                data = x.reshape(-1)
                indices = jnp.tile(jnp.arange(n, dtype=jnp.int32), m)
                indptr = (jnp.arange(m + 1, dtype=jnp.int32)
                          * jnp.int32(n))
            else:
                data = x.T.reshape(-1)
                indices = jnp.tile(jnp.arange(m, dtype=jnp.int32), n)
                indptr = (jnp.arange(n + 1, dtype=jnp.int32)
                          * jnp.int32(m))
            # HOST np value, like the Shape lowering: under jit a
            # jnp.asarray of a static tuple is STAGED (a tracer), which
            # would defeat the linker's trace-time shape folding and
            # crash any downstream ARange
            shape = np.asarray(x.shape, np.int32)
            return data, indices, indptr, shape
        # BCOO → compressed parts on device: STABLE sort by the major
        # axis only, then indptr via searchsorted; nse is static under
        # jit.  Major-only (not lexsort by (major, minor)): the bridge's
        # BCOO preserves scipy's entry order (tocoo keeps data order),
        # and the py-oracle (like the reference's CSMProperties.perform)
        # passes csm.data/indices through UNSORTED — a CSR input with
        # has_sorted_indices=False must come back in its own within-row
        # order, not canonicalized (review finding, round 5 session 3)
        rows, cols = x.indices[:, 0], x.indices[:, 1]
        major, minor = (rows, cols) if fmt == "csr" else (cols, rows)
        dim = x.shape[0] if fmt == "csr" else x.shape[1]
        order = jnp.argsort(major, stable=True)
        data = x.data[order]
        indices = minor[order].astype(jnp.int32)
        indptr = jnp.searchsorted(
            major[order], jnp.arange(dim + 1)).astype(jnp.int32)
        shape = np.asarray(x.shape, np.int32)  # host: see dense branch
        return data, indices, indptr, shape

    return csm_properties


@jax_funcify.register(sb.Diag)
def _jx_sp_diag(op, node=None, **kw):
    def sp_diag(x):
        from jax.experimental import sparse as jsparse

        x = _to_bcoo(x)
        if not isinstance(x, jsparse.BCOO):  # densified bridge value
            return jnp.diagonal(jnp.asarray(x))
        # gather the stored diagonal entries without densifying the
        # matrix: scatter-add stored (i,i) values into a k-vector
        # (duplicate coords sum, matching BCOO semantics)
        k = min(x.shape)
        rows, cols = x.indices[:, 0], x.indices[:, 1]
        on_diag = (rows == cols) & (rows < k)
        dest = jnp.where(on_diag, rows, k)  # k = out-of-range → dropped
        vals = jnp.where(on_diag, x.data, jnp.zeros((), x.data.dtype))
        return jnp.zeros((k,), x.data.dtype).at[dest].add(vals, mode="drop")

    return sp_diag


@jax_funcify.register(sb.SquareDiagonal)
def _jx_square_diagonal(op, node=None, **kw):
    def square_diagonal(d):
        from jax.experimental import sparse as jsparse

        d = jnp.asarray(d)
        n = d.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        return jsparse.BCOO((d, jnp.stack([idx, idx], axis=1)),
                            shape=(n, n))

    return square_diagonal


@jax_funcify.register(sb.SpSum)
def _jx_sp_sum(op, node=None, **kw):
    axis = op.axis

    def sp_sum(x):
        from jax.experimental import sparse as jsparse

        x = _to_bcoo(x)
        if not _is_bcoo(x):  # densified bridge value
            return jnp.sum(jnp.asarray(x), axis=axis)
        res = jsparse.bcoo_reduce_sum(
            x, axes=(0, 1) if axis is None else (axis,)
        )
        if isinstance(res, jsparse.BCOO):
            res = res.todense()
        return res

    return sp_sum


@jax_funcify.register(sb.MulSD)
def _jx_mul_sd(op, node=None, **kw):
    def mul_sd(a, b):
        from jax.experimental import sparse as jsparse

        a = _to_bcoo(a)
        b = jnp.asarray(b)
        if not _is_bcoo(a):  # densified bridge value
            # mask to implicit-zero semantics: the sparse path touches
            # only stored entries, so 0-positions stay EXACT 0 even
            # where b holds inf/nan (attention-style masking)
            z = jnp.zeros((), dtype=a.dtype)
            return jnp.where(a != 0, (a * b).astype(a.dtype), z)
        rows, cols = a.indices[:, 0], a.indices[:, 1]
        return jsparse.BCOO(
            ((a.data * b[rows, cols]).astype(a.data.dtype), a.indices),
            shape=a.shape,
        )

    return mul_sd


@jax_funcify.register(sb.MulSV)
def _jx_mul_sv(op, node=None, **kw):
    def mul_sv(a, v):
        from jax.experimental import sparse as jsparse

        a = _to_bcoo(a)
        v = jnp.asarray(v)
        if not _is_bcoo(a):  # densified bridge value (masked: see mul_sd)
            z = jnp.zeros((), dtype=a.dtype)
            return jnp.where(a != 0, (a * v).astype(a.dtype), z)
        cols = a.indices[:, 1]
        return jsparse.BCOO(
            ((a.data * v[cols]).astype(a.data.dtype), a.indices),
            shape=a.shape,
        )

    return mul_sv


@jax_funcify.register(sb.MulSS)
def _jx_mul_ss(op, node=None, **kw):
    def mul_ss(a, b):
        from jax.experimental import sparse as jsparse

        return jsparse.bcoo_multiply_sparse(_to_bcoo(a), _to_bcoo(b))

    return mul_ss


@jax_funcify.register(sb.AddSD)
def _jx_add_sd(op, node=None, **kw):
    def add_sd(a, b):
        a = _to_bcoo(a)
        b = jnp.asarray(b)
        if not _is_bcoo(a):  # densified bridge value
            return a + b
        # nnz-sized scatter-add instead of densifying a first
        rows, cols = a.indices[:, 0], a.indices[:, 1]
        return b.astype(jnp.result_type(a.data.dtype, b.dtype)).at[
            rows, cols
        ].add(a.data)

    return add_sd


@jax_funcify.register(sb.AddSS)
def _jx_add_ss(op, node=None, **kw):
    def add_ss(a, b):
        from jax.experimental import sparse as jsparse

        a, b = _to_bcoo(a), _to_bcoo(b)
        out = jsparse.BCOO(
            (jnp.concatenate([a.data, b.data]),
             jnp.concatenate([a.indices, b.indices])),
            shape=a.shape,
        )
        # static nse bound = concatenated size (jit-safe)
        return jsparse.bcoo_sum_duplicates(out, nse=out.data.shape[0])

    return add_ss


@jax_funcify.register(sb.SamplingDot)
def _jx_sampling_dot(op, node=None, **kw):
    def sampling_dot(x, y, p):
        from jax.experimental import sparse as jsparse

        p = _to_bcoo(p)
        if not _is_bcoo(p):  # densified bridge value: one MXU matmul,
            # masked so implicit zeros stay exact 0 under inf/nan in x@yT
            z = jnp.zeros((), dtype=p.dtype)
            return jnp.where(
                p != 0, (jnp.asarray(x) @ jnp.asarray(y).T * p).astype(p.dtype), z
            )
        rows, cols = p.indices[:, 0], p.indices[:, 1]
        # nnz × K work: gather the needed rows of x and y only
        vals = jnp.sum(
            jnp.asarray(x)[rows] * jnp.asarray(y)[cols], axis=-1
        )
        return jsparse.BCOO(
            ((vals * p.data).astype(p.data.dtype), p.indices), shape=p.shape
        )

    return sampling_dot


@jax_funcify.register(sb.StructuredDotGradA)
def _jx_structured_dot_grad_a(op, node=None, **kw):
    def structured_dot_grad_a(gz, b, a):
        from jax.experimental import sparse as jsparse

        from aesara_tpu.link.jax.bss import BSSMat, bss_sddmm

        if isinstance(a, BSSMat):
            # native SDDMM Pallas kernel: MXU per-block gz@bᵀ +
            # lane-gather sampling; coords from layout arithmetic
            return bss_sddmm(a, gz, b)
        a = _to_bcoo(a)
        gz = jnp.asarray(gz)
        b = jnp.asarray(b)
        rows, cols = a.indices[:, 0], a.indices[:, 1]
        # (gz @ b.T) sampled at a's pattern: nnz × K gathers, no (M,N)
        if b.ndim == 1:
            vals = gz[rows] * b[cols]
        else:
            vals = jnp.sum(gz[rows] * b[cols], axis=-1)
        return jsparse.BCOO(
            (vals.astype(a.data.dtype), a.indices), shape=a.shape
        )

    return structured_dot_grad_a
