"""Special-function rewrites (reference ``aesara/tensor/rewriting/special.py``):
recognize softmax/log-softmax graph patterns and replace them with the
dedicated ops — numerically stable and lowered to fused jax.nn kernels."""

from __future__ import annotations

import numpy as np

from aesara_tpu import scalar as aes
from aesara_tpu.compile.mode import register_specialize, register_stabilize
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.math import Sum
from aesara_tpu.tensor.special import LogSoftmax, Softmax


def _is_ew(node, cls):
    return (
        node is not None
        and isinstance(node.op, Elemwise)
        and isinstance(node.op.scalar_op, cls)
    )


def _match_softmax(var):
    """exp(x) / sum(exp(x), axis, keepdims) → (x, axis) or None."""
    node = var.owner
    if not _is_ew(node, aes.ops.TrueDiv):
        return None
    num, den = node.inputs
    if not _is_ew(num.owner, aes.ops.Exp):
        return None
    x = num.owner.inputs[0]
    # denominator: sum of the same exp, possibly through a keepdims
    # DimShuffle broadcast
    d = den
    if d.owner is not None and isinstance(d.owner.op, DimShuffle):
        d = d.owner.inputs[0]
    if d.owner is None or not isinstance(d.owner.op, Sum):
        return None
    summed = d.owner.inputs[0]
    if summed is not num and not (
        _is_ew(summed.owner, aes.ops.Exp) and summed.owner.inputs[0] is x
    ):
        return None
    axes = d.owner.op.axis
    if axes is None or len(axes) != 1:
        return None
    return x, axes[0]


@node_rewriter([Elemwise])
def local_softmax_graph(fgraph, node):
    """exp(x)/sum(exp(x)) → Softmax (reference softmax recognition)."""
    if not isinstance(node.op.scalar_op, aes.ops.TrueDiv):
        return False
    m = _match_softmax(node.outputs[0])
    if m is None:
        return False
    x, axis = m
    res = Softmax(axis)(x)
    if res.type != node.outputs[0].type:
        conv = node.outputs[0].type.convert_variable(res)
        if conv is None:
            return False
        res = conv
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_specialize(local_softmax_graph)


@node_rewriter([Elemwise])
def local_logsoftmax(fgraph, node):
    """log(Softmax(x)) → LogSoftmax(x) (reference local_logsoftmax —
    the stability rewrite)."""
    if not isinstance(node.op.scalar_op, aes.ops.Log):
        return False
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Softmax):
        return False
    res = LogSoftmax(inner.op.axis)(inner.inputs[0])
    if res.type != node.outputs[0].type:
        conv = node.outputs[0].type.convert_variable(res)
        if conv is None:
            return False
        res = conv
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_stabilize(local_logsoftmax)
register_specialize(local_logsoftmax)


#: reference rewrite names (tensor/rewriting/special.py + nnet/basic.py):
#: the graph-recognition passes above play these roles on the XLA path
softmax_simplifier = local_softmax_graph
crossentropy_to_crossentropy_with_softmax = local_logsoftmax
crossentropy_to_crossentropy_with_softmax_with_bias = local_logsoftmax
graph_merge_softmax_with_crossentropy_softmax = local_softmax_graph
