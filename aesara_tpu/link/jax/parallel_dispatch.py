"""XLA lowerings for the collective ops: jax.lax collectives over named
mesh axes (run inside shard_map) and with_sharding_constraint for the
GSPMD path."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from aesara_tpu.link.jax.dispatch import jax_funcify
from aesara_tpu.parallel.ops import (
    AllGather,
    AllReduce,
    AllToAll,
    AxisIndex,
    PPermute,
    ReduceScatter,
    ShardConstraint,
)


def _in_shard_map(axis_name) -> bool:
    """True when tracing inside shard_map/pmap (axis name bound)."""
    try:
        lax.axis_size(axis_name)
        return True
    except Exception:
        return False


@jax_funcify.register(AllReduce)
def _jx_allreduce(op, node=None, **kw):
    name = op.axis_name
    fns = {"sum": lax.psum, "max": lax.pmax, "min": lax.pmin, "mean": lax.pmean}
    fn = fns[op.reduce_op]

    def allreduce(x):
        if not _in_shard_map(name):
            return x  # unbound axis: single-shard semantics (identity)
        return fn(x, axis_name=name)

    return allreduce


@jax_funcify.register(AllGather)
def _jx_allgather(op, node=None, **kw):
    name, axis, tiled = op.axis_name, op.axis, op.tiled

    def allgather(x):
        if not _in_shard_map(name):
            return x if tiled else jnp.expand_dims(x, 0)
        return lax.all_gather(x, axis_name=name, axis=axis, tiled=tiled)

    return allgather


@jax_funcify.register(PPermute)
def _jx_ppermute(op, node=None, **kw):
    name, perm = op.axis_name, list(op.perm)

    def ppermute(x):
        if not _in_shard_map(name):
            return x if (0, 0) in op.perm else jnp.zeros_like(x)
        return lax.ppermute(x, axis_name=name, perm=perm)

    return ppermute


@jax_funcify.register(AllToAll)
def _jx_alltoall(op, node=None, **kw):
    name = op.axis_name

    def all_to_all(x):
        if not _in_shard_map(name):
            return x
        return lax.all_to_all(
            x, axis_name=name, split_axis=op.split_axis,
            concat_axis=op.concat_axis, tiled=True,
        )

    return all_to_all


@jax_funcify.register(ReduceScatter)
def _jx_reduce_scatter(op, node=None, **kw):
    name = op.axis_name

    def reduce_scatter(x):
        if not _in_shard_map(name):
            return x
        return lax.psum_scatter(
            x, axis_name=name, scatter_dimension=op.scatter_axis, tiled=True
        )

    return reduce_scatter


@jax_funcify.register(AxisIndex)
def _jx_axis_index(op, node=None, **kw):
    name = op.axis_name

    def axis_index():
        if not _in_shard_map(name):
            return jnp.int32(0)
        return lax.axis_index(name).astype(jnp.int32)

    return axis_index


@jax_funcify.register(ShardConstraint)
def _jx_shard_constraint(op, node=None, **kw):
    spec = op.spec

    def shard_constraint(x):
        from aesara_tpu.parallel.shard import get_mesh

        mesh = get_mesh()
        try:
            if mesh is not None:
                from jax.sharding import NamedSharding

                return lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
            return lax.with_sharding_constraint(x, spec)
        except Exception:
            return x  # no mesh context: annotation is a no-op

    return shard_constraint


# --- context/sequence-parallel attention (parallel/attention.py) -------------

from aesara_tpu.parallel.attention import RingAttention, UlyssesAttention  # noqa: E402


@jax_funcify.register(RingAttention)
def _jax_ring_attention(op, node=None, **kwargs):
    axis = op.axis_name
    causal = op.causal

    def ring(q, k, v):
        import jax.numpy as jnp
        from jax import lax

        from aesara_tpu.tensor.nnet.attention import _attention_ref

        if not _in_shard_map(axis):
            # unsharded compile: the shard is the whole sequence
            return _attention_ref(q, k, v, causal, 1.0 / float(np.sqrt(q.shape[-1])))

        P = lax.psum(1, axis)               # static axis size
        rank = lax.axis_index(axis)
        T = q.shape[1]
        scale = jnp.asarray(1.0 / float(np.sqrt(q.shape[-1])), dtype=jnp.float32)
        fwd = [(i, (i + 1) % P) for i in range(P)]   # kv travels i → i+1

        q32 = q.astype(jnp.float32)
        m = jnp.full(q.shape[:2], -1e30, dtype=jnp.float32)       # (BH, T)
        l = jnp.zeros(q.shape[:2], dtype=jnp.float32)
        o = jnp.zeros(q.shape, dtype=jnp.float32)
        q_pos = rank * T + jnp.arange(T)

        for step in range(P):
            # after `step` forward hops, this device holds the block that
            # originated on rank - step (mod P)
            src = (rank - step) % P
            s = jnp.einsum("btd,bsd->bts", q32, k.astype(jnp.float32)) * scale
            if causal:
                k_pos = src * T + jnp.arange(k.shape[1])
                s = jnp.where(k_pos[None, None, :] <= q_pos[None, :, None],
                              s, -jnp.inf)
            m_new = jnp.maximum(m, s.max(axis=-1))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[..., None])
            l = l * corr + p.sum(axis=-1)
            o = o * corr[..., None] + jnp.einsum(
                "bts,bsd->btd", p, v.astype(jnp.float32)
            )
            m = m_new
            if step + 1 < P:
                k = lax.ppermute(k, axis, fwd)
                v = lax.ppermute(v, axis, fwd)
        return (o / l[..., None]).astype(q.dtype)

    return ring


@jax_funcify.register(UlyssesAttention)
def _jax_ulysses_attention(op, node=None, **kwargs):
    axis = op.axis_name
    causal = op.causal

    def ulysses(q, k, v):
        import jax.numpy as jnp
        from jax import lax

        from aesara_tpu.tensor.nnet.attention import _attention_ref

        if not _in_shard_map(axis):
            return _attention_ref(q, k, v, causal, 1.0 / float(np.sqrt(q.shape[-1])))

        P = lax.psum(1, axis)
        if q.shape[0] % P:
            raise ValueError(
                f"Ulysses needs batch*heads ({q.shape[0]}) divisible by the "
                f"'{axis}' axis size ({P})"
            )
        # seq-sharded (BH, T/P, D) → head-sharded (BH/P, T, D)
        def to_heads(x):
            return lax.all_to_all(x, axis, split_axis=0, concat_axis=1,
                                  tiled=True)

        def to_seq(x):
            return lax.all_to_all(x, axis, split_axis=1, concat_axis=0,
                                  tiled=True)

        qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
        if causal:
            out = _attention_ref(qh, kh, vh, True, scale)
        else:
            out = _attention_ref(qh, kh, vh, False, scale)
        return to_seq(out)

    return ulysses


from aesara_tpu.parallel.attention import ShardedAttentionGrad  # noqa: E402


@jax_funcify.register(ShardedAttentionGrad)
def _jax_sharded_attention_grad(op, node=None, **kwargs):
    from aesara_tpu.parallel.attention import RingAttention, UlyssesAttention

    fwd_cls = RingAttention if op.kind == "ring" else UlyssesAttention
    fwd = jax_funcify(fwd_cls(op.axis_name, op.causal))

    def grad_fn(q, k, v, gz):
        _, vjp = jax.vjp(fwd, q, k, v)
        return tuple(vjp(gz.astype(q.dtype)))

    return grad_fn
