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
