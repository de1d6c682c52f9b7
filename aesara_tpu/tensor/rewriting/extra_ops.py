"""extra_ops rewrites (reference ``tensor/rewriting/extra_ops.py``):
Unique over constant-content inputs simplifies away — high value here
because Unique's data-dependent shape forces the py path, so removing
it keeps graphs XLA-lowerable."""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.mode import register_canonicalize, register_useless
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.tensor.basic import Alloc, as_tensor_variable
from aesara_tpu.tensor.extra_ops import BroadcastTo, Repeat, Unique


def _plain_unique(op) -> bool:
    return not (op.return_index or op.return_inverse or op.return_counts)


@node_rewriter([Unique])
def local_Unique_scalar(fgraph, node):
    """unique(scalar-like) → reshape (a single element IS unique)
    (reference ``local_Unique_scalar``)."""
    op = node.op
    if not _plain_unique(op):
        return False
    x = node.inputs[0]
    if x.type.ndim != 0:
        return False
    res = x.reshape((1,))
    copy_stack_trace(node.outputs[0], res)
    return [res]


@node_rewriter([Unique])
def local_Unique_Alloc_lift(fgraph, node):
    """unique(alloc(x, ...)) → unique(x): broadcasting adds no new
    values (reference ``local_Unique_Alloc_lift``)."""
    op = node.op
    if not _plain_unique(op) or op.axis is not None:
        return False
    inner = node.inputs[0]
    if inner.owner is None or not isinstance(inner.owner.op, Alloc):
        return False
    x = inner.owner.inputs[0]
    res = Unique()(x)
    copy_stack_trace(node.outputs[0], res)
    return [res]


@node_rewriter([Unique])
def local_Unique_BroadcastTo_lift(fgraph, node):
    """unique(broadcast_to(x, ...)) → unique(x) (reference)."""
    op = node.op
    if not _plain_unique(op) or op.axis is not None:
        return False
    inner = node.inputs[0]
    if inner.owner is None or not isinstance(inner.owner.op, BroadcastTo):
        return False
    x = inner.owner.inputs[0]
    res = Unique()(x)
    copy_stack_trace(node.outputs[0], res)
    return [res]


@node_rewriter([Unique])
def local_Unique_Repeat_lift(fgraph, node):
    """unique(repeat(x, ...)) → unique(x) (reference)."""
    op = node.op
    if not _plain_unique(op) or op.axis is not None:
        return False
    inner = node.inputs[0]
    if inner.owner is None or not isinstance(inner.owner.op, Repeat):
        return False
    x = inner.owner.inputs[0]
    res = Unique()(x)
    copy_stack_trace(node.outputs[0], res)
    return [res]


@node_rewriter([Unique])
def local_Unique_second(fgraph, node):
    """unique(second(x, y)) == unique(fill) → unique of the fill value
    (reference ``local_Unique_second``)."""
    from aesara_tpu.scalar.ops import Second
    from aesara_tpu.tensor.elemwise import Elemwise

    op = node.op
    if not _plain_unique(op) or op.axis is not None:
        return False
    inner = node.inputs[0]
    if inner.owner is None or not isinstance(inner.owner.op, Elemwise):
        return False
    if not isinstance(inner.owner.op.scalar_op, Second):
        return False
    y = inner.owner.inputs[1]
    res = Unique()(y)
    copy_stack_trace(node.outputs[0], res)
    return [res]


@node_rewriter([BroadcastTo])
def local_remove_scalar_BroadcastTo(fgraph, node):
    """broadcast_to(x, ()) → x (reference)."""
    x = node.inputs[0]
    out = node.outputs[0]
    if out.type.ndim != 0:
        return False
    copy_stack_trace(out, x)
    return [x]


for _rw in (local_Unique_scalar, local_Unique_Alloc_lift,
            local_Unique_BroadcastTo_lift, local_Unique_Repeat_lift,
            local_Unique_second, local_remove_scalar_BroadcastTo):
    register_useless(_rw)
    register_canonicalize(_rw)
del _rw
