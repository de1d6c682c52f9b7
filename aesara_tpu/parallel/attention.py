"""Context/sequence-parallel attention (SURVEY §2.12/§7: "SP/CP via
blockwise-scan ring attention rewrite; Ulysses via all_to_all head
exchange").  The reference has no attention at all; these are the
TPU-first specializations of the framework's ``FusedAttention`` op for
sequence-sharded meshes.

Both ops consume the LOCAL sequence shard (per shard_map semantics) and
produce the local shard of the GLOBAL attention result:

- ``RingAttention``: k/v blocks rotate around the mesh axis via
  ``lax.ppermute`` while a running online-softmax (m, l, o) accumulates —
  the (T, T) score matrix never exists, and each hop overlaps with the
  next block's matmuls (the blockwise form of FlashAttention over ICI).
- ``UlyssesAttention``: two ``lax.all_to_all`` hops re-shard from
  sequence-parallel to head-parallel, run dense attention per head, and
  shard back.  Cheaper when heads ≥ axis size and T is moderate.

The world-size-1 oracle (``perform``) is plain attention, so py/XLA
differential testing works unsharded, and an 8-device CPU mesh test
checks the sharded result against the single-device reference.
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.nnet.attention import _attention_ref

__all__ = ["RingAttention", "UlyssesAttention", "ring_attention",
           "ulysses_attention", "context_parallel_db"]


class _ShardedAttention(Op):
    """Common contract: (BH, T_local, D) q, k, v → (BH, T_local, D)."""

    __props__ = ("axis_name", "causal")
    jax_never_fold = True  # collectives must stay symbolic under the trace

    def __init__(self, axis_name: str, causal: bool = False):
        self.axis_name = axis_name
        self.causal = bool(causal)

    def make_node(self, q, k, v):
        q = as_tensor_variable(q)
        k = as_tensor_variable(k)
        v = as_tensor_variable(v)
        if not (q.type.ndim == k.type.ndim == v.type.ndim == 3):
            raise TypeError(f"{type(self).__name__} expects 3-d (BH, T, D) q/k/v")
        return Apply(self, [q, k, v], [q.type()])

    def perform(self, node, inputs, output_storage):
        # world-size-1 oracle: the local shard IS the global sequence
        import jax.numpy as jnp

        q, k, v = inputs
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
        res = _attention_ref(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             self.causal, scale)
        output_storage[0][0] = np.asarray(res, dtype=node.outputs[0].type.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def __str__(self):
        return f"{type(self).__name__}{{{self.axis_name}, causal={self.causal}}}"


class ShardedAttentionGrad(Op):
    """vjp of ring/ulysses attention — the backward pass reverses the
    collectives (jax derives the transposed ppermute/all_to_all), so CP
    training is one program too.  Three outputs: (dq, dk, dv)."""

    __props__ = ("axis_name", "causal", "kind")
    jax_never_fold = True

    def __init__(self, axis_name: str, causal: bool, kind: str):
        self.axis_name = axis_name
        self.causal = bool(causal)
        if kind not in ("ring", "ulysses"):
            raise ValueError(f"bad kind {kind}")
        self.kind = kind

    def make_node(self, q, k, v, gz):
        q = as_tensor_variable(q)
        k = as_tensor_variable(k)
        v = as_tensor_variable(v)
        gz = as_tensor_variable(gz)
        return Apply(self, [q, k, v, gz], [q.type(), k.type(), v.type()])

    def perform(self, node, inputs, output_storage):
        # world-size-1 oracle: vjp of dense attention
        import jax
        import jax.numpy as jnp

        q, k, v, gz = inputs
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _attention_ref(q_, k_, v_, self.causal, scale),
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        )
        for i, g in enumerate(vjp(jnp.asarray(gz, dtype=q.dtype))):
            output_storage[i][0] = np.asarray(g, dtype=inputs[i].dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0], input_shapes[1], input_shapes[2]]


class RingAttention(_ShardedAttention):
    def L_op(self, inputs, outputs, output_grads):
        g = ShardedAttentionGrad(self.axis_name, self.causal, "ring")(
            *inputs, output_grads[0]
        )
        return [g[0], g[1], g[2]]


class UlyssesAttention(_ShardedAttention):
    def L_op(self, inputs, outputs, output_grads):
        g = ShardedAttentionGrad(self.axis_name, self.causal, "ulysses")(
            *inputs, output_grads[0]
        )
        return [g[0], g[1], g[2]]


def ring_attention(q, k, v, axis_name, causal=False):
    return RingAttention(axis_name, causal)(q, k, v)


def ulysses_attention(q, k, v, axis_name, causal=False):
    return UlyssesAttention(axis_name, causal)(q, k, v)


# --- rewrite pack: FusedAttention → sharded form (opt-in) --------------------

from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter  # noqa: E402
from aesara_tpu.graph.rewriting.db import LocalGroupDB  # noqa: E402
from aesara_tpu.tensor.nnet.attention import FusedAttention  # noqa: E402


def attention_to_ring(axis_name: str):
    """Build a rewriter mapping every FusedAttention onto a ring over
    ``axis_name`` — apply when compiling a sequence-sharded graph."""

    @node_rewriter([FusedAttention])
    def local_attention_to_ring(fgraph, node):
        new = RingAttention(axis_name, node.op.causal)(*node.inputs)
        copy_stack_trace(node.outputs[0], new)
        return [new]

    return local_attention_to_ring


def attention_to_ulysses(axis_name: str):
    @node_rewriter([FusedAttention])
    def local_attention_to_ulysses(fgraph, node):
        new = UlyssesAttention(axis_name, node.op.causal)(*node.inputs)
        copy_stack_trace(node.outputs[0], new)
        return [new]

    return local_attention_to_ulysses


context_parallel_db = LocalGroupDB()
context_parallel_db.name = "context_parallel_db"


# flag-driven automatic form: any FusedAttention compiles context-parallel
# when config.context_parallel_axis is set (the §2.12 "rewrite-pack
# specialization of attention graphs")
@node_rewriter([FusedAttention])
def local_attention_context_parallel(fgraph, node):
    from aesara_tpu.config import config

    axis = config.context_parallel_axis
    if not axis:
        return False
    cls = RingAttention if config.context_parallel_impl == "ring" else UlyssesAttention
    new = cls(axis, node.op.causal)(*node.inputs)
    copy_stack_trace(node.outputs[0], new)
    return [new]


_registered = False


def _register():
    """Idempotent optdb hookup — deferred because this module loads while
    compile.mode is still initializing (called again from the package
    root once the pipeline exists)."""
    global _registered
    if _registered:
        return
    try:
        from aesara_tpu.compile.mode import optdb
    except ImportError:
        return
    from aesara_tpu.graph.rewriting.basic import in2out

    optdb.register(
        "local_attention_context_parallel",
        in2out(local_attention_context_parallel,
               name="local_attention_context_parallel"),
        "fast_run", "context_parallel", position=2.05,
    )
    _registered = True


_register()
