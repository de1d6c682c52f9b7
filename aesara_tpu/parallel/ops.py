"""Collective-communication ops as first-class graph Ops.

TPU-native replacement for the reference's MPI op set
(``aesara/tensor/io.py``: MPIRecv:108, MPISend:199, isend/irecv:265-290).
Each op carries a mesh ``axis_name``; the XLA lowering is the matching
``jax.lax`` collective (valid inside ``shard_map_function``), and the
NumPy oracle evaluates world-size-1 semantics so py-mode differential
tests still run single-process (the reference tests distribution by
spawning ``mpiexec -np 2``; ours run on an
``xla_force_host_platform_device_count`` mesh instead — SURVEY §4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.type import TensorType


__all__ = [
    "AllReduce", "AllGather", "PPermute", "AllToAll", "ReduceScatter",
    "AxisIndex", "ShardConstraint",
    "psum", "pmax", "pmin", "pmean", "all_gather", "ppermute", "all_to_all",
    "reduce_scatter", "axis_index", "shard_constraint", "send", "recv",
    "isend", "irecv",
]


class AllReduce(Op):
    """psum/pmax/pmin/pmean over a mesh axis → lax.psum & friends."""

    __props__ = ("reduce_op", "axis_name")
    jax_never_fold = True  # collectives must stay symbolic under the trace

    def __init__(self, reduce_op: str, axis_name: str):
        if reduce_op not in ("sum", "max", "min", "mean"):
            raise ValueError(f"bad reduce_op {reduce_op}")
        self.reduce_op = reduce_op
        self.axis_name = axis_name

    def make_node(self, x):
        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        # world-size-1 oracle: reduction over one rank is the identity
        output_storage[0][0] = inputs[0]

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        # SPMD transpose of psum is per-shard IDENTITY (jax's pbroadcast
        # rule): out_d = Σ_i x_i and the cotangent is already replicated,
        # so summing it again would scale gradients by the axis size
        # (caught by the gpipe gradient-vs-dense test).
        (gz,) = output_grads
        if self.reduce_op == "sum":
            return [gz]
        if self.reduce_op == "mean":
            from aesara_tpu.tensor.basic import constant

            n = AllReduce("sum", self.axis_name)(
                constant(np.asarray(1.0, dtype=gz.type.dtype))
            )
            return [gz / n]
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0], "pmax/pmin grad")]

    def __str__(self):
        return f"p{self.reduce_op}{{{self.axis_name}}}"


class AllGather(Op):
    """Concatenate shards over a mesh axis (lax.all_gather, tiled)."""

    __props__ = ("axis_name", "axis", "tiled")
    jax_never_fold = True  # collectives must stay symbolic under the trace

    def __init__(self, axis_name: str, axis: int = 0, tiled: bool = True):
        self.axis_name = axis_name
        self.axis = int(axis)
        self.tiled = bool(tiled)

    def make_node(self, x):
        x = as_tensor_variable(x)
        if self.tiled:
            shape = list(x.type.shape)
            shape[self.axis] = None  # size multiplies by axis size
            out_t = TensorType(x.type.dtype, tuple(shape))
        else:
            out_t = TensorType(x.type.dtype, (None,) + x.type.shape)
        return Apply(self, [x], [out_t()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = x if self.tiled else x[None]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        # proper grad is reduce_scatter; landed when RS grads are tested
        return [grad_not_implemented(self, 0, inputs[0], "all_gather grad")]

    def __str__(self):
        return f"all_gather{{{self.axis_name},axis={self.axis}}}"


class PPermute(Op):
    """Point-to-point ring/permutation exchange (lax.ppermute).

    This is the collective that subsumes the reference's MPISend/MPIRecv
    pairs: ``perm`` is a list of (source, dest) rank pairs; data rides the
    ICI ring instead of MPI over the host network.
    """

    __props__ = ("axis_name", "perm")
    jax_never_fold = True  # collectives must stay symbolic under the trace

    def __init__(self, axis_name: str, perm: Tuple[Tuple[int, int], ...]):
        self.axis_name = axis_name
        self.perm = tuple((int(a), int(b)) for a, b in perm)

    def make_node(self, x):
        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        # world-1: identity if 0→0 is in the perm, else zeros
        if (0, 0) in self.perm:
            output_storage[0][0] = x
        else:
            output_storage[0][0] = np.zeros_like(x)

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        inv = tuple((d, s) for s, d in self.perm)
        return [PPermute(self.axis_name, inv)(gz)]

    def __str__(self):
        return f"ppermute{{{self.axis_name}}}"


class AllToAll(Op):
    """lax.all_to_all over a mesh axis."""

    __props__ = ("axis_name", "split_axis", "concat_axis")
    jax_never_fold = True  # collectives must stay symbolic under the trace

    def __init__(self, axis_name: str, split_axis: int, concat_axis: int):
        self.axis_name = axis_name
        self.split_axis = int(split_axis)
        self.concat_axis = int(concat_axis)

    def make_node(self, x):
        x = as_tensor_variable(x)
        shape = list(x.type.shape)
        shape[self.split_axis] = None
        shape[self.concat_axis] = None
        return Apply(self, [x], [TensorType(x.type.dtype, tuple(shape))()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [AllToAll(self.axis_name, self.concat_axis, self.split_axis)(gz)]

    def __str__(self):
        return f"all_to_all{{{self.axis_name}}}"


class ReduceScatter(Op):
    """psum_scatter: reduce then shard over the axis."""

    __props__ = ("axis_name", "scatter_axis")
    jax_never_fold = True  # collectives must stay symbolic under the trace

    def __init__(self, axis_name: str, scatter_axis: int = 0):
        self.axis_name = axis_name
        self.scatter_axis = int(scatter_axis)

    def make_node(self, x):
        x = as_tensor_variable(x)
        shape = list(x.type.shape)
        shape[self.scatter_axis] = None
        return Apply(self, [x], [TensorType(x.type.dtype, tuple(shape))()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0], "reduce_scatter grad")]

    def __str__(self):
        return f"reduce_scatter{{{self.axis_name}}}"


class AxisIndex(Op):
    """This shard's coordinate along a mesh axis (lax.axis_index)."""

    __props__ = ("axis_name",)
    jax_never_fold = True  # collectives must stay symbolic under the trace

    def __init__(self, axis_name: str):
        self.axis_name = axis_name

    def make_node(self):
        return Apply(self, [], [TensorType("int32", ())()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.int32(0)

    def grad(self, inputs, output_grads):
        return []

    def __str__(self):
        return f"axis_index{{{self.axis_name}}}"


class ShardConstraint(Op):
    """Attach a PartitionSpec to an intermediate value
    (lax.with_sharding_constraint in the GSPMD path)."""

    __props__ = ("spec",)
    view_map = {0: [0]}

    def __init__(self, spec):
        from jax.sharding import PartitionSpec

        if not isinstance(spec, PartitionSpec):
            spec = PartitionSpec(*spec) if isinstance(spec, (tuple, list)) else PartitionSpec(spec)
        self.spec = spec

    def make_node(self, x):
        x = as_tensor_variable(x)
        out_t = x.type.clone(sharding=tuple(self.spec))
        return Apply(self, [x], [out_t()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        return [output_grads[0]]

    def __str__(self):
        return f"shard{{{self.spec}}}"


# --- user API ---------------------------------------------------------------

def psum(x, axis_name: str):
    return AllReduce("sum", axis_name)(x)


def pmax(x, axis_name: str):
    return AllReduce("max", axis_name)(x)


def pmin(x, axis_name: str):
    return AllReduce("min", axis_name)(x)


def pmean(x, axis_name: str):
    return AllReduce("mean", axis_name)(x)


def all_gather(x, axis_name: str, axis: int = 0, tiled: bool = True):
    return AllGather(axis_name, axis, tiled)(x)


def ppermute(x, axis_name: str, perm):
    return PPermute(axis_name, tuple(perm))(x)


def all_to_all(x, axis_name: str, split_axis: int, concat_axis: int):
    return AllToAll(axis_name, split_axis, concat_axis)(x)


def reduce_scatter(x, axis_name: str, scatter_axis: int = 0):
    return ReduceScatter(axis_name, scatter_axis)(x)


def axis_index(axis_name: str):
    return AxisIndex(axis_name)()


def shard_constraint(x, spec):
    return ShardConstraint(spec)(x)


# --- MPI-parity shims (reference tensor/io.py:265-290) -------------------------

def send(var, dest: int, tag: int = 0, axis_name: str = "data",
         src: int | None = None):
    """Parity shim: point-to-point send becomes a ppermute edge.

    ppermute edges are STATIC (src, dst) pairs — there is no "current
    rank" in an SPMD program, so the sender must be named explicitly
    (review finding: a hardcoded src=0 silently delivered rank 0's shard
    for every sender)."""
    if src is None:
        raise ValueError(
            "send() on a device mesh needs an explicit src rank: SPMD "
            "collectives are compiled once for all ranks, so the "
            "(src, dest) edge must be static — send(x, dest=d, src=s). "
            "For host-side MPI-style p2p use aesara_tpu.tensor.io.send."
        )
    return ppermute(var, axis_name, [(src, dest)])


def recv(shape, dtype, source: int, tag: int = 0, axis_name: str = "data"):
    raise NotImplementedError(
        "recv as a standalone op does not exist on TPU: use "
        "parallel.ppermute (the send/recv pair is one collective edge)"
    )


def isend(var, dest, tag=0, **kwargs):
    return send(var, dest, tag, **kwargs)  # same static-edge contract


def irecv(shape, dtype, source, tag=0, **kwargs):
    return recv(shape, dtype, source, tag, **kwargs)
