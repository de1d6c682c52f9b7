"""Basic tensor rewrites: useless-op removal, fill/alloc lifting, constant
folding (reference ``aesara/tensor/rewriting/basic.py``, 24 rewriters).

Registered into the global optdb stages via
``aesara_tpu.compile.mode.register_*`` — tags match the reference
(canonicalize / stabilize / specialize / useless).
"""

from __future__ import annotations

import numpy as np

from aesara_tpu import scalar as aes
from aesara_tpu.compile.mode import (
    register_canonicalize,
    register_specialize,
    register_useless,
)
from aesara_tpu.graph.ir import Constant
from aesara_tpu.graph.op import Op
from aesara_tpu.graph.rewriting.basic import (
    GraphRewriter,
    copy_stack_trace,
    node_rewriter,
)
from aesara_tpu.tensor.basic import Alloc, Join, MakeVector, ScalarFromTensor, Split, TensorFromScalar, as_tensor_variable, cast, constant
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.shape import Reshape, Shape, Shape_i, SpecifyShape, Unbroadcast
from aesara_tpu.tensor.subtensor import Subtensor
from aesara_tpu.tensor.type import TensorType


# ---------------------------------------------------------------------------
# constant folding (reference rewriting/basic.py topo_constant_folding)
# ---------------------------------------------------------------------------

@node_rewriter(None)
def constant_folding(fgraph, node):
    """Evaluate nodes whose inputs are all constants (reference
    ``tensor/rewriting/basic.py`` constant_folding)."""
    if not node.inputs:
        return False
    if not all(isinstance(i, Constant) for i in node.inputs):
        return False
    try:
        if not node.op.do_constant_folding(fgraph, node):
            return False
    except Exception:
        return False
    from aesara_tpu.utils import MethodNotDefined

    storage = [[None] for _ in node.outputs]
    try:
        node.op.perform(node, [i.data for i in node.inputs], storage)
    except (MethodNotDefined, NotImplementedError):
        return False
    except Exception:
        return False
    results = []
    for s, o in zip(storage, node.outputs):
        try:
            const = o.type.make_constant(s[0])
        except Exception:
            return False
        copy_stack_trace(o, const)
        results.append(const)
    return results


register_canonicalize(constant_folding, name="constant_folding")


# ---------------------------------------------------------------------------
# useless-op removals
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_useless_elemwise_identity(fgraph, node):
    """identity(x) → x"""
    if isinstance(node.op.scalar_op, aes.ops.Identity):
        return [node.inputs[0]]
    return False


register_useless(local_useless_elemwise_identity)
register_canonicalize(local_useless_elemwise_identity)


@node_rewriter([DimShuffle])
def local_useless_dimshuffle(fgraph, node):
    """DimShuffle that changes nothing → x"""
    op = node.op
    if op.new_order == tuple(range(op.input_ndim)):
        return [node.inputs[0]]
    return False


register_useless(local_useless_dimshuffle)
register_canonicalize(local_useless_dimshuffle)


@node_rewriter([DimShuffle])
def local_dimshuffle_lift(fgraph, node):
    """DimShuffle(DimShuffle(x)) → one DimShuffle (reference
    ``rewriting/elemwise.py:377`` dimshuffle lift)."""
    op = node.op
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, DimShuffle):
        return False
    inner_op = inner.op
    new_order = []
    for d in op.new_order:
        if d == "x":
            new_order.append("x")
        else:
            new_order.append(inner_op.new_order[d])
    res = DimShuffle(inner.inputs[0].type.ndim, tuple(new_order))(inner.inputs[0])
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_canonicalize(local_dimshuffle_lift)


@node_rewriter([SpecifyShape])
def local_useless_specify_shape(fgraph, node):
    """SpecifyShape adding no information → x"""
    x = node.inputs[0]
    out = node.outputs[0]
    if x.type.shape == out.type.shape:
        return [x]
    return False


register_useless(local_useless_specify_shape)
register_canonicalize(local_useless_specify_shape)


@node_rewriter([Unbroadcast])
def local_useless_unbroadcast(fgraph, node):
    if node.inputs[0].type.shape == node.outputs[0].type.shape:
        return [node.inputs[0]]
    return False


register_useless(local_useless_unbroadcast)


@node_rewriter([Reshape])
def local_useless_reshape(fgraph, node):
    """reshape to the identical static shape → x"""
    x = node.inputs[0]
    out = node.outputs[0]
    if (
        x.type.ndim == out.type.ndim
        and all(s is not None for s in x.type.shape)
        and x.type.shape == out.type.shape
    ):
        return [x]
    # reshape(reshape(x, s1), s2) → reshape(x, s2)
    if x.owner is not None and isinstance(x.owner.op, Reshape):
        res = Reshape(node.op.ndim)(x.owner.inputs[0], node.inputs[1])
        copy_stack_trace(out, res)
        return [res]
    return False


register_canonicalize(local_useless_reshape)


@node_rewriter([Subtensor])
def local_useless_slice(fgraph, node):
    """x[:] (full slices only) → x"""
    if all(
        isinstance(e, slice) and e == slice(None, None, None)
        for e in node.op.idx_list
    ):
        return [node.inputs[0]]
    return False


register_useless(local_useless_slice)
register_canonicalize(local_useless_slice)


@node_rewriter([Elemwise])
def local_useless_cast(fgraph, node):
    """cast to the same dtype → x"""
    if isinstance(node.op.scalar_op, aes.ops.Cast):
        x = node.inputs[0]
        if x.type.dtype == node.outputs[0].type.dtype:
            return [x]
        # cast(cast(y)) → cast(y) ONLY when the inner cast is lossless
        # for y's dtype (a narrowing or kind-changing inner cast — e.g.
        # float->int truncation — must stay)
        if (
            x.owner is not None
            and isinstance(x.owner.op, Elemwise)
            and isinstance(x.owner.op.scalar_op, aes.ops.Cast)
        ):
            y = x.owner.inputs[0]
            inner_np = np.dtype(x.type.dtype)
            y_np = np.dtype(y.type.dtype)
            if np.can_cast(y_np, inner_np, casting="safe"):
                res = cast(y, node.outputs[0].type.dtype)
                copy_stack_trace(node.outputs[0], res)
                return [res]
    return False


register_canonicalize(local_useless_cast)


# ---------------------------------------------------------------------------
# fill/alloc handling (reference fill/alloc removal rewrites)
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_fill_to_alloc_or_remove(fgraph, node):
    """fill(template, v):
    - same static shape as v → v (fill is a no-op)
    (reference local_fill_to_alloc / local_useless_fill)
    """
    if not isinstance(node.op.scalar_op, aes.ops.Second):
        return False
    template, v = node.inputs
    out = node.outputs[0]
    if (
        v.type.ndim == out.type.ndim
        and v.type.dtype == out.type.dtype
        and v.type.shape == out.type.shape
    ):
        return [v]
    return False


register_canonicalize(local_fill_to_alloc_or_remove)


@node_rewriter([Alloc])
def local_useless_alloc(fgraph, node):
    """Alloc whose value already has the target static shape → value."""
    value = node.inputs[0]
    out = node.outputs[0]
    if (
        value.type.ndim == out.type.ndim
        and value.type.shape == out.type.shape
        and all(s is not None for s in out.type.shape)
    ):
        return [value]
    return False


register_useless(local_useless_alloc)
register_canonicalize(local_useless_alloc)


@node_rewriter([TensorFromScalar])
def local_tensor_scalar_tensor(fgraph, node):
    """tensor_from_scalar(scalar_from_tensor(x)) → x"""
    inner = node.inputs[0].owner
    if inner is not None and isinstance(inner.op, ScalarFromTensor):
        return [inner.inputs[0]]
    return False


register_canonicalize(local_tensor_scalar_tensor)


@node_rewriter([ScalarFromTensor])
def local_scalar_tensor_scalar(fgraph, node):
    """scalar_from_tensor(tensor_from_scalar(x)) → x"""
    inner = node.inputs[0].owner
    if inner is not None and isinstance(inner.op, TensorFromScalar):
        return [inner.inputs[0]]
    return False


register_canonicalize(local_scalar_tensor_scalar)


@node_rewriter([Join])
def local_join_1(fgraph, node):
    """join of a single tensor → that tensor (reference local_join_1)."""
    if len(node.inputs) == 2:  # axis + one tensor
        return [node.inputs[1]]
    return False


register_canonicalize(local_join_1)


@node_rewriter([Split])
def local_useless_split(fgraph, node):
    """Split into one piece → the input (reference local_useless_split)."""
    if node.op.len_splits == 1:
        return {node.outputs[0]: node.inputs[0]}
    return False


register_useless(local_useless_split)
