"""Subtensor rewrites (reference ``aesara/tensor/rewriting/subtensor.py``,
27 rewriters — the load-bearing subset)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.mode import register_canonicalize, register_specialize
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.tensor.basic import Alloc, constant
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.subtensor import SYM, IncSubtensor, Subtensor


def _static_slice(e):
    """slice with all-int/None parts, else None."""
    if isinstance(e, slice):
        parts = (e.start, e.stop, e.step)
        if any(p is SYM for p in parts):
            return None
        return e
    if e is SYM:
        return None
    return e


@node_rewriter([Subtensor])
def local_subtensor_merge(fgraph, node):
    """x[a:b][c:d] → x[combined] when both slices are static 1-dim
    non-negative forward slices (reference local_subtensor_merge)."""
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Subtensor):
        return False
    if node.inputs[1:] or inner.inputs[1:]:
        return False  # only fully-static index lists
    out_idx = node.op.idx_list
    in_idx = inner.op.idx_list
    if len(out_idx) != 1 or len(in_idx) != 1:
        return False
    o, i = _static_slice(out_idx[0]), _static_slice(in_idx[0])
    if not isinstance(i, slice) or i.step not in (None, 1):
        return False
    i_start = i.start or 0
    if i_start < 0 or (i.stop is not None and i.stop < 0):
        return False
    if isinstance(o, slice):
        if o.step not in (None, 1):
            return False
        o_start = o.start or 0
        if o_start < 0 or (o.stop is not None and o.stop < 0):
            return False
        new_start = i_start + o_start
        if o.stop is None:
            new_stop = i.stop
        else:
            new_stop = i_start + o.stop
            if i.stop is not None:
                new_stop = min(new_stop, i.stop)
        res = Subtensor((slice(new_start, new_stop, None),))(inner.inputs[0])
    elif isinstance(o, int):
        if o < 0:
            return False
        res = Subtensor((i_start + o,))(inner.inputs[0])
    else:
        return False
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(local_subtensor_merge)


@node_rewriter([Subtensor])
def local_subtensor_of_alloc(fgraph, node):
    """alloc(v, ...)[int-index on a broadcast dim] stays an alloc of the
    sliced shape — avoids materializing then slicing."""
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Alloc):
        return False
    # only the simple full-int or basic forward-slice lead index
    idx = node.op.idx_list
    if len(idx) != 1 or not isinstance(idx[0], int) or idx[0] < 0:
        return False
    value = inner.inputs[0]
    shape_vars = inner.inputs[1:]
    if len(shape_vars) < 2:
        return False
    if value.type.ndim == len(shape_vars):
        # value has the full rank; dropping dim 0 only valid if broadcast
        if value.type.shape[0] != 1:
            return False
        from aesara_tpu.tensor.basic import alloc

        res = alloc(value[0], *shape_vars[1:])
    else:
        from aesara_tpu.tensor.basic import alloc

        res = alloc(value, *shape_vars[1:])
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_specialize(local_subtensor_of_alloc)


@node_rewriter([IncSubtensor])
def local_useless_inc_subtensor(fgraph, node):
    """set_subtensor(x[full slice], y) → y (type-permitting)."""
    if not node.op.set_instead_of_inc:
        return False
    if not all(
        isinstance(e, slice) and e == slice(None, None, None)
        for e in node.op.idx_list
    ):
        return False
    x, y = node.inputs[0], node.inputs[1]
    if len(node.op.idx_list) != x.type.ndim:
        return False
    if y.type.ndim != x.type.ndim:
        return False
    conv = node.outputs[0].type.convert_variable(y)
    if conv is None:
        return False
    return [conv]


register_canonicalize(local_useless_inc_subtensor)
