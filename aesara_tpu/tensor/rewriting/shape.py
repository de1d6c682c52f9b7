"""Shape rewrites: fold static shape information into constants
(reference ``aesara/tensor/rewriting/shape.py``: ShapeFeature:76,
ShapeOptimizer:729 — the TPU build replaces the whole-graph shape-cache
feature with direct static-shape folding, since ``TensorType.shape``
already carries per-dim knowledge end-to-end)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.mode import register_canonicalize, register_useless
from aesara_tpu.graph.ir import Constant
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.tensor.basic import MakeVector, NotScalarConstantError, constant, get_scalar_constant_value
from aesara_tpu.tensor.shape import Reshape, Shape, Shape_i, SpecifyShape
from aesara_tpu.tensor.subtensor import SYM, Subtensor


@node_rewriter([Shape])
def local_shape_to_constant(fgraph, node):
    """Shape(x) with fully-known static shape → constant vector; partially
    known → MakeVector mixing constants and Shape_i."""
    (x,) = node.inputs
    shp = x.type.shape
    if all(s is not None for s in shp):
        return [constant(np.asarray(shp, dtype="int64"))]
    if any(s is not None for s in shp):
        from aesara_tpu.tensor.shape import shape_i

        elems = [
            constant(s, dtype="int64") if s is not None else Shape_i(d)(x)
            for d, s in enumerate(shp)
        ]
        res = MakeVector("int64")(*elems)
        copy_stack_trace(node.outputs[0], res)
        return [res]
    return False


register_canonicalize(local_shape_to_constant)


@node_rewriter([Shape_i])
def local_shape_i_to_constant(fgraph, node):
    (x,) = node.inputs
    s = x.type.shape[node.op.i]
    if s is not None:
        return [constant(s, dtype="int64")]
    return False


register_canonicalize(local_shape_i_to_constant)


@node_rewriter([Subtensor])
def local_subtensor_of_shape(fgraph, node):
    """Shape(x)[i] (constant i) → Shape_i(x)"""
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Shape):
        return False
    idx = node.op.idx_list
    if len(idx) != 1 or isinstance(idx[0], slice) or idx[0] is SYM:
        return False
    i = idx[0]
    x = inner.inputs[0]
    if i < 0:
        i += x.type.ndim
    if not (0 <= i < x.type.ndim):
        return False
    if x.type.shape[i] is not None:
        return [constant(x.type.shape[i], dtype="int64")]
    res = Shape_i(i)(x)
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_canonicalize(local_subtensor_of_shape)


@node_rewriter([Shape])
def local_shape_of_specify_shape(fgraph, node):
    """Shape(SpecifyShape(x, s)) → uses the specified info via the
    SpecifyShape output's refined static shape (covered by
    local_shape_to_constant); remove the SpecifyShape indirection."""
    inner = node.inputs[0].owner
    if inner is not None and isinstance(inner.op, SpecifyShape):
        # keep the refined static type: Shape of the specify output
        return False
    return False


@node_rewriter([SpecifyShape])
def local_merge_consecutive_specify_shape(fgraph, node):
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, SpecifyShape):
        return False
    from aesara_tpu.tensor.shape import specify_shape

    merged = specify_shape(inner.inputs[0], node.outputs[0].type.shape)
    copy_stack_trace(node.outputs[0], merged)
    return [merged]


register_canonicalize(local_merge_consecutive_specify_shape)
