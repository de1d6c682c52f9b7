"""Uncanonicalize pack (reference ``tensor/rewriting/uncanonicalize.py``:
``local_max_to_min:talk``, ``local_alloc_dimshuffle_lift:68``,
``local_reshape_dimshuffle:90``, ``local_dimshuffle_alloc:118``,
``local_dimshuffle_subtensor:141``).

Runs at optdb position 3, after specialize: undoes canonical forms that
are good for matching but bad for codegen.  On XLA most relayouts fuse
anyway, so these mainly shrink the graph the lowering walks.
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.mode import register_uncanonicalize
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.tensor import math as tm
from aesara_tpu.tensor.basic import Alloc, as_tensor_variable, constant
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.shape import Reshape


__all__ = ["local_max_to_min", "local_alloc_dimshuffle_lift",
           "local_reshape_dimshuffle"]


@node_rewriter([Elemwise])
def local_max_to_min(fgraph, node):
    """``neg(max(neg(x)))`` → ``min(x)`` (reference ``local_max_to_min``):
    the canonical min form re-collapsed to one reduction."""
    if node.op.scalar_op is not tm.neg.scalar_op:
        return False
    inner = node.inputs[0]
    if inner.owner is None or not isinstance(inner.owner.op, tm.Max):
        return False
    reduced = inner.owner.inputs[0]
    if reduced.owner is None or not isinstance(reduced.owner.op, Elemwise):
        return False
    if reduced.owner.op.scalar_op is not tm.neg.scalar_op:
        return False
    x = reduced.owner.inputs[0]
    axis = inner.owner.op.axis
    res = tm.min(x, axis=axis)
    copy_stack_trace(node.outputs[0], res)
    return [res]


@node_rewriter([DimShuffle])
def local_alloc_dimshuffle_lift(fgraph, node):
    """``DimShuffle(Alloc(scalar, shp))`` → ``Alloc(scalar, permuted shp)``
    (reference ``local_alloc_dimshuffle_lift``): build the broadcast in
    its final layout instead of relaying it out."""
    ds_op = node.op
    alloc_out = node.inputs[0]
    if alloc_out.owner is None or not isinstance(alloc_out.owner.op, Alloc):
        return False
    value = alloc_out.owner.inputs[0]
    if value.type.ndim != 0:
        return False
    shape_vars = alloc_out.owner.inputs[1:]
    one = constant(np.asarray(1, dtype="int64"))
    new_shape = [one if o == "x" else shape_vars[o] for o in ds_op.new_order]
    res = Alloc()(value, *new_shape)
    copy_stack_trace(node.outputs[0], res)
    return [res]


@node_rewriter([Reshape])
def local_reshape_dimshuffle(fgraph, node):
    """``Reshape(DimShuffle(x))`` where the dimshuffle only INSERTS
    broadcast dims (no permutation/squeeze) → ``Reshape(x)`` directly
    (reference ``local_reshape_dimshuffle``)."""
    ds_out = node.inputs[0]
    if ds_out.owner is None or not isinstance(ds_out.owner.op, DimShuffle):
        return False
    order = ds_out.owner.op.new_order
    kept = [o for o in order if o != "x"]
    if kept != sorted(kept) or len(kept) != ds_out.owner.inputs[0].type.ndim:
        return False  # permutes or drops dims: layout actually changes
    x = ds_out.owner.inputs[0]
    res = node.op(x, node.inputs[1])
    copy_stack_trace(node.outputs[0], res)
    return [res.owner.outputs[0] if res.owner else res]


register_uncanonicalize(local_max_to_min, name="local_max_to_min")
register_uncanonicalize(local_alloc_dimshuffle_lift,
                        name="local_alloc_dimshuffle_lift")
register_uncanonicalize(local_reshape_dimshuffle,
                        name="local_reshape_dimshuffle")


@node_rewriter([DimShuffle])
def local_dimshuffle_alloc(fgraph, node):
    """DimShuffle(Alloc(v, shp)) → Alloc(v', permuted shp): broadcast
    AFTER the (free) transpose instead of transposing the filled array
    (reference ``local_dimshuffle_alloc``, uncanonicalize.py:146)."""
    from aesara_tpu.tensor.basic import Alloc, constant as t_constant

    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Alloc):
        return False
    v, *shp = inner.inputs
    order = node.op.new_order
    new_shp = [
        t_constant(1, dtype="int64") if d == "x" else shp[d] for d in order
    ]
    # v must stay right-aligned-broadcastable against the permuted shape:
    # safe when v is scalar (the overwhelmingly common fill case)
    if v.type.ndim != 0:
        return False
    res = Alloc()(v, *new_shp)
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_uncanonicalize(local_dimshuffle_alloc)
