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


@jax_funcify.register(sb.StructuredDot)
def _jx_structured_dot(op, node=None, **kw):
    def structured_dot(a, b):
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
        major = jnp.repeat(
            jnp.arange(len(counts), dtype=jnp.int32), counts,
            total_repeat_length=int(np.asarray(data).shape[0]) if not isinstance(
                data, jax.core.Tracer
            ) else None,
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
        return _to_bcoo(x).T

    return transpose


@jax_funcify.register(sb.Neg)
def _jx_sparse_neg(op, node=None, **kw):
    return lambda x: -_to_bcoo(x)


@jax_funcify.register(sb.SpSum)
def _jx_sp_sum(op, node=None, **kw):
    axis = op.axis

    def sp_sum(x):
        from jax.experimental import sparse as jsparse

        x = _to_bcoo(x)
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
