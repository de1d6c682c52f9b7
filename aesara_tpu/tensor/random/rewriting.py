"""Random-variable rewrites (reference ``aesara/tensor/random/rewriting.py``:
``local_rv_size_lift``, ``local_dimshuffle_rv_lift``,
``local_subtensor_rv_lift``, ``local_remove_useless_rv``).

TPU framing: because the whole graph compiles to one XLA program, the
reference's motivation (avoid materialising big intermediate draws in
host memory) becomes "shrink the random op's output so XLA allocates and
fills less HBM".  ``local_subtensor_rv_lift`` draws ONLY the indexed
slice: same distribution family, far fewer random bits — but different
actual numbers, so like the reference it is opt-in (not in fast_run).
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.mode import optdb
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, in2out, node_rewriter
from aesara_tpu.graph.rewriting.db import LocalGroupDB
from aesara_tpu.tensor.basic import as_tensor_variable, constant
from aesara_tpu.tensor.elemwise import DimShuffle
from aesara_tpu.tensor.random.op import RandomVariable
from aesara_tpu.tensor.shape import SpecifyShape
from aesara_tpu.tensor.subtensor import (
    AdvancedSubtensor,
    AdvancedSubtensor1,
    Subtensor,
)


__all__ = ["local_rv_size_lift", "local_dimshuffle_rv_lift",
           "local_subtensor_rv_lift", "local_remove_useless_specify_shape_rv",
           "random_rewrites_db"]


def _is_empty_size(size_var) -> bool:
    try:
        from aesara_tpu.tensor.basic import get_vector_length

        return get_vector_length(size_var) == 0
    except Exception:
        return False


@node_rewriter([RandomVariable])
def local_rv_size_lift(fgraph, node):
    """Fold an explicit ``size`` that merely restates the broadcast of the
    parameter batch shapes back into implicit form (size=()) — the
    canonical form the other RV rewrites key on (reference
    ``local_rv_size_lift``)."""
    op = node.op
    rng, size, *params = node.inputs
    if _is_empty_size(size):
        return False
    # size is redundant iff it equals the broadcast batch shape statically
    out = node.outputs[1]
    out_shape = out.type.shape
    if any(s is None for s in out_shape):
        return False
    batch = out_shape[: len(out_shape) - op.ndim_supp]
    # compute the params' broadcast batch shape statically
    dims = []
    for p, nd in zip(params, op.ndims_params):
        bshape = p.type.shape[: p.type.ndim - nd] if p.type.ndim > nd else ()
        dims.append(bshape)
    if not dims:
        return False
    maxlen = max((len(d) for d in dims), default=0)
    if maxlen != len(batch):
        return False
    bc = []
    for i in range(maxlen):
        vals = []
        for d in dims:
            off = maxlen - len(d)
            if i >= off:
                v = d[i - off]
                if v is None:
                    return False
                vals.append(v)
        known = [v for v in vals if v != 1]
        bc.append(known[0] if known else 1)
    if tuple(bc) != tuple(batch):
        return False
    new_out = op.make_node(rng, constant(np.asarray([], dtype="int64")), *params)
    copy_stack_trace(node.outputs, new_out.outputs)
    return dict(zip(node.outputs, new_out.outputs))


@node_rewriter([DimShuffle])
def local_dimshuffle_rv_lift(fgraph, node):
    """Move a pure transpose THROUGH a RandomVariable by permuting its
    ``size`` instead (reference ``local_dimshuffle_rv_lift``) — the draw
    is generated directly in the transposed layout, saving a device
    relayout.  Only fires on full permutations (no broadcast insert/
    squeeze) of scalar-support RVs with scalar params."""
    ds_op = node.op
    rv_out = node.inputs[0]
    rv_node = rv_out.owner
    if rv_node is None or not isinstance(rv_node.op, RandomVariable):
        return False
    rv_op = rv_node.op
    if rv_op.ndim_supp != 0:
        return False
    order = ds_op.new_order
    if any(o == "x" for o in order) or sorted(order) != list(range(len(order))):
        return False  # not a pure permutation
    rng, size, *params = rv_node.inputs
    if _is_empty_size(size):
        return False
    if any(p.type.ndim != 0 for p in params):
        return False  # non-scalar params would need their own transpose
    if len([c for c, _ in fgraph.clients.get(rv_out, [])]) > 1:
        return False  # another consumer still needs the original layout
    perm_size = as_tensor_variable([size[i] for i in order])
    new_node = rv_op.make_node(rng, perm_size, *params)
    copy_stack_trace(node.outputs[0], new_node.outputs[1])
    return {node.outputs[0]: new_node.outputs[1],
            rv_node.outputs[0]: new_node.outputs[0]}


@node_rewriter([Subtensor, AdvancedSubtensor1, AdvancedSubtensor])
def local_subtensor_rv_lift(fgraph, node):
    """Draw only the indexed slice: ``normal(mu, sd, size=(N,))[i]`` →
    ``normal(mu[i], sd[i])`` for batch-indexed RVs with batched params
    (reference ``local_subtensor_rv_lift``).  Also fires on boolean-mask
    indexing (``rv[mask]`` → rv over masked params) when the mask covers
    batch dims only.  Changes the sampled values (fewer random bits
    consumed) — registered opt-in only."""
    sub_op = node.op
    rv_out = node.inputs[0]
    rv_node = rv_out.owner
    if rv_node is None or not isinstance(rv_node.op, RandomVariable):
        return False
    rv_op = rv_node.op
    if rv_op.ndim_supp != 0:
        return False
    rng, size, *params = rv_node.inputs
    if not _is_empty_size(size):
        return False  # explicit size: batch dims are not the params' dims
    if len([c for c, _ in fgraph.clients.get(rv_out, [])]) > 1:
        return False
    # index every param identically (they broadcast to the batch shape);
    # only params with full batch rank can be sliced directly
    batch_ndim = max(
        (p.type.ndim - nd for p, nd in zip(params, rv_op.ndims_params)),
        default=0,
    )
    if batch_ndim == 0:
        return False
    if isinstance(sub_op, AdvancedSubtensor1):
        # vector-indexing the leading batch dim: index params the same way
        idx = (node.inputs[1],)
        consumed = 1
    elif isinstance(sub_op, AdvancedSubtensor):
        # the boolean-mask form rv[mask]: the mask consumes mask.ndim
        # leading batch dims at once
        if sub_op.idx_list != ("array",):
            return False
        mask = node.inputs[1]
        if mask.type.dtype != "bool":
            return False
        idx = (mask,)
        consumed = mask.type.ndim
    else:
        from aesara_tpu.tensor.subtensor import get_idx_list

        idx = get_idx_list(node.inputs, sub_op.idx_list)
        consumed = len(idx)
    if consumed > batch_ndim:
        return False
    new_params = []
    for p, nd in zip(params, rv_op.ndims_params):
        if p.type.ndim - nd == batch_ndim:
            new_params.append(p[tuple(idx)])
        elif p.type.ndim - nd == 0:
            new_params.append(p)
        else:
            return False
    new_node = rv_op.make_node(rng, constant(np.asarray([], dtype="int64")),
                               *new_params)
    copy_stack_trace(node.outputs[0], new_node.outputs[1])
    return {node.outputs[0]: new_node.outputs[1],
            rv_node.outputs[0]: new_node.outputs[0]}


@node_rewriter([SpecifyShape])
def local_remove_useless_specify_shape_rv(fgraph, node):
    """SpecifyShape on an RV whose static shape already proves the claim
    is a no-op (reference ``local_remove_useless_rv`` family)."""
    x = node.inputs[0]
    if x.owner is None or not isinstance(x.owner.op, RandomVariable):
        return False
    out = node.outputs[0]
    if x.type.shape != out.type.shape or any(s is None for s in x.type.shape):
        return False
    copy_stack_trace(out, x)
    return {out: x}


# the reference keeps these in their own DB queried by RandomStream modes
random_rewrites_db = LocalGroupDB()
random_rewrites_db.name = "random_rewrites_db"
random_rewrites_db.register("local_rv_size_lift", local_rv_size_lift, "basic")
random_rewrites_db.register(
    "local_dimshuffle_rv_lift", local_dimshuffle_rv_lift, "basic"
)
random_rewrites_db.register(
    "local_subtensor_rv_lift", local_subtensor_rv_lift, "basic"
)

# shape-proof SpecifyShape removal is safe everywhere
optdb.register(
    "local_remove_useless_specify_shape_rv",
    in2out(local_remove_useless_specify_shape_rv,
           name="local_remove_useless_specify_shape_rv"),
    "fast_run", "random", position=48.9,
)
