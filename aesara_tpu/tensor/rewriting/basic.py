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
from aesara_tpu.tensor.basic import (
    Alloc,
    Join,
    MakeVector,
    NotScalarConstantError,
    ScalarFromTensor,
    Split,
    TensorFromScalar,
    as_tensor_variable,
    cast,
    constant,
    get_scalar_constant_value,
)
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
register_specialize(local_useless_dimshuffle)


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
register_specialize(local_dimshuffle_lift)


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
    """reshape to the identical static shape → x; reshape(x, x.shape) →
    x structurally, even with unknown dims (reference
    ``local_useless_reshape``)."""
    x = node.inputs[0]
    out = node.outputs[0]
    if (
        x.type.ndim == out.type.ndim
        and all(s is not None for s in x.type.shape)
        and x.type.shape == out.type.shape
    ):
        return [x]
    # structural: the target shape IS x's own shape vector
    if x.type.ndim == out.type.ndim:
        from aesara_tpu.tensor.shape import Shape, Shape_i

        shp = node.inputs[1]
        sn = shp.owner
        if sn is not None and isinstance(sn.op, Shape) and sn.inputs[0] is x:
            return [x]
        # MakeVector(Shape_i{0}(x), Shape_i{1}(x), ...) in order
        if (
            sn is not None
            and isinstance(sn.op, MakeVector)
            and len(sn.inputs) == x.type.ndim
            and all(
                (
                    e.owner is not None
                    and isinstance(e.owner.op, Shape_i)
                    and e.owner.op.i == d
                    and e.owner.inputs[0] is x
                )
                or (
                    isinstance(e, Constant)
                    and x.type.shape[d] is not None
                    and int(np.asarray(e.data)) == x.type.shape[d]
                )
                for d, e in enumerate(sn.inputs)
            )
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
    """Split into one piece → the input, keeping the runtime size check
    (reference local_useless_split, ``basic.py:1101-1116``: the raw op's
    perform raises when splits don't sum to the axis length — eliding
    the node must not silently erase that error)."""
    if node.op.len_splits != 1:
        return False
    from aesara_tpu.raise_op import Assert
    from aesara_tpu.tensor.math import eq

    x, axis, splits = node.inputs
    res = x
    # static case: provably consistent → no assert needed
    ax = None
    try:
        ax = int(get_scalar_constant_value(axis))
    except NotScalarConstantError:
        pass
    sp0 = None
    try:
        sp0 = get_scalar_constant_value(splits)
    except NotScalarConstantError:
        pass
    static_ok = (
        ax is not None
        and sp0 is not None
        and x.type.shape[ax if ax >= 0 else ax + x.type.ndim] == int(sp0)
    )
    if not static_ok:
        check = Assert("Split{1}: split size must equal the axis length")
        res = check(x, eq(x.shape[axis], splits[0]))
        copy_stack_trace(node.outputs[0], res)
    return {node.outputs[0]: res}


register_useless(local_useless_split)
register_canonicalize(local_useless_split)
register_specialize(local_useless_split)


# ---------------------------------------------------------------------------
# round-2 additions (reference basic.py: local_cast_cast:719,
# local_remove_useless_assert:797, local_join_empty:888,
# local_join_make_vector:935, local_merge_switch_same_cond:1068,
# local_merge_alloc:1197, local_view_op:1187)
# ---------------------------------------------------------------------------

def _check_and_raise_nodes():
    from aesara_tpu.raise_op import CheckAndRaise

    return CheckAndRaise


@node_rewriter(None)
def local_remove_useless_assert(fgraph, node):
    """Drop constant-true conditions; an assert with none left IS its
    input (reference local_remove_useless_assert)."""
    from aesara_tpu.raise_op import CheckAndRaise

    if not isinstance(node.op, CheckAndRaise):
        return False
    value, *conds = node.inputs
    kept = []
    for c in conds:
        if isinstance(c, Constant):
            if not bool(np.asarray(c.data)):
                return False  # constant-FALSE: leave it to raise at runtime
            continue
        kept.append(c)
    if len(kept) == len(conds):
        return False
    if not kept:
        res = value
    else:
        res = node.op(value, *kept)
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(local_remove_useless_assert)


@node_rewriter(None)
def local_remove_all_assert(fgraph, node):
    """Strip every assert (reference local_remove_all_assert) — UNSAFE,
    only under the explicit tag, never in fast_run."""
    from aesara_tpu.raise_op import CheckAndRaise

    if not isinstance(node.op, CheckAndRaise):
        return False
    res = node.inputs[0]
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    return [conv]


# matches the reference's tags: in the DB but OFF unless requested
from aesara_tpu.compile.mode import canonicalize as _canon_db  # noqa: E402

_canon_db.register(
    "local_remove_all_assert", local_remove_all_assert,
    "unsafe", use_db_name_as_tag=False,
)


@node_rewriter([Join])
def local_join_empty(fgraph, node):
    """Drop statically-empty operands from a join; a single survivor
    replaces the join (reference local_join_empty)."""
    from aesara_tpu.tensor.basic import (
        NotScalarConstantError,
        get_scalar_constant_value,
        join,
    )

    axis_in, *parts = node.inputs
    try:
        axis = int(get_scalar_constant_value(axis_in))
    except NotScalarConstantError:
        return False
    kept = [
        p for p in parts
        if p.type.shape[axis if axis >= 0 else axis + p.type.ndim] != 0
    ]
    if len(kept) == len(parts):
        return False
    if not kept:
        # every operand statically empty: keep one so the (empty)
        # output survives with the right type — join() with no
        # tensors would raise and abort the whole rewriter pass
        kept = parts[:1]
    res = kept[0] if len(kept) == 1 else join(axis, *kept)
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(local_join_empty)


@node_rewriter([Join])
def local_join_make_vector(fgraph, node):
    """join(0, make_vector(..), make_vector(..)) → one make_vector
    (reference local_join_make_vector)."""
    from aesara_tpu.tensor.basic import (
        NotScalarConstantError,
        get_scalar_constant_value,
    )

    axis_in, *parts = node.inputs
    try:
        axis = int(get_scalar_constant_value(axis_in))
    except NotScalarConstantError:
        return False
    if axis != 0 or len(parts) < 2:
        return False
    if not all(
        p.owner is not None and isinstance(p.owner.op, MakeVector)
        for p in parts
    ):
        return False
    elems = [e for p in parts for e in p.owner.inputs]
    res = MakeVector(node.outputs[0].type.dtype)(*elems)
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(local_join_make_vector)


@node_rewriter([Elemwise])
def local_merge_switch_same_cond(fgraph, node):
    """elemwise(op)(switch(c,a,b), switch(c,x,y)) →
    switch(c, op(a,x), op(b,y)) — one select instead of two (reference
    local_merge_switch_same_cond)."""
    from aesara_tpu.scalar.ops import Switch

    if isinstance(node.op.scalar_op, Switch):
        return False
    switches = [
        i for i in node.inputs
        if i.owner is not None
        and isinstance(i.owner.op, Elemwise)
        and isinstance(i.owner.op.scalar_op, Switch)
    ]
    if len(switches) < 2:
        return False
    cond = switches[0].owner.inputs[0]
    group = [
        s for s in switches
        if s.owner.inputs[0] is cond
        and len(fgraph.clients.get(s, ())) == 1
    ]
    if len(group) < 2:
        return False
    from aesara_tpu.tensor.basic import switch as t_switch

    lhs_args, rhs_args = [], []
    for i in node.inputs:
        if i in group:
            lhs_args.append(i.owner.inputs[1])
            rhs_args.append(i.owner.inputs[2])
        else:
            lhs_args.append(i)
            rhs_args.append(i)
    res = t_switch(cond, node.op(*lhs_args), node.op(*rhs_args))
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(local_merge_switch_same_cond)


@node_rewriter([Alloc])
def local_merge_alloc(fgraph, node):
    """alloc(alloc(x, ...inner), ...outer) → alloc(x, ...outer) when the
    outer alloc fully determines the shape (reference
    local_merge_alloc)."""
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Alloc):
        return False
    x = inner.inputs[0]
    if x.type.ndim > node.outputs[0].type.ndim:
        return False
    # legality: merging must not silently drop the outer alloc's runtime
    # broadcast check — every aligned dim must be the SAME expression, a
    # constant 1 (legally broadcast), or equal constants
    inner_shp = list(inner.inputs[1:])
    outer_shp = list(node.inputs[1:])
    for di, do in zip(reversed(inner_shp), reversed(outer_shp)):
        if di is do:
            continue
        if isinstance(di, Constant) and int(np.asarray(di.data)) == 1:
            continue
        if (
            isinstance(di, Constant) and isinstance(do, Constant)
            and int(np.asarray(di.data)) == int(np.asarray(do.data))
        ):
            continue
        return False
    res = Alloc()(x, *node.inputs[1:])
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(local_merge_alloc)


@node_rewriter(None)
def local_view_op(fgraph, node):
    """ViewOp is identity for rewriting purposes (reference
    local_view_op)."""
    from aesara_tpu.compile.ops import ViewOp

    if not isinstance(node.op, ViewOp):
        return False
    res = node.inputs[0]
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    return [conv]


register_canonicalize(local_view_op)


# ---------------------------------------------------------------------------
# round-2 additions (reference rewriting/basic.py + elemwise.py stragglers)
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_cast_cast(fgraph, node):
    """cast(cast(x, t1), t2) → cast(x, t2) when the inner cast is
    lossless (np.can_cast(x.dtype → t1, "safe")) so collapsing cannot
    change values (reference ``local_cast_cast``)."""
    if not isinstance(node.op.scalar_op, aes.ops.Cast):
        return False
    inner = node.inputs[0].owner
    if inner is None or not (
        isinstance(inner.op, Elemwise)
        and isinstance(inner.op.scalar_op, aes.ops.Cast)
    ):
        return False
    x = inner.inputs[0]
    t1 = inner.outputs[0].type.dtype
    if x.type.dtype == t1:
        safe = True
    else:
        try:
            safe = np.can_cast(np.dtype(x.type.dtype), np.dtype(t1),
                               casting="safe")
        except TypeError:
            return False
    if not safe:
        return False
    res = cast(x, node.outputs[0].type.dtype)
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_canonicalize(local_cast_cast)


@node_rewriter([Elemwise])
def local_alloc_unary(fgraph, node):
    """unary(Alloc(v, shp)) → Alloc(unary(v), shp): compute the scalar
    once, broadcast after (reference ``local_alloc_unary``)."""
    if len(node.inputs) != 1 or len(node.outputs) != 1:
        return False
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Alloc):
        return False
    v, *shp = inner.inputs
    applied = node.op(v)
    if applied.type.dtype != node.outputs[0].type.dtype:
        applied = cast(applied, node.outputs[0].type.dtype)
    res = Alloc()(applied, *shp)
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_specialize(local_alloc_unary)


@node_rewriter([Elemwise])
def local_elemwise_alloc(fgraph, node):
    """Drop Allocs feeding a multi-input Elemwise when another input
    already forces the broadcast shape — XLA broadcasts for free, the
    materialized fill is pure HBM waste (reference
    ``local_elemwise_alloc``).  Requires a same-shape proof from the
    ShapeFeature (or static types)."""
    if len(node.inputs) < 2:
        return False
    sf = getattr(fgraph, "shape_feature", None)
    out = node.outputs[0]

    def provably_same_shape(a, b):
        if (
            a.type.ndim == b.type.ndim
            and all(s is not None for s in a.type.shape)
            and a.type.shape == b.type.shape
        ):
            return True
        return sf is not None and sf.same_shape(a, b)

    # a non-Alloc input whose shape equals the output's fixes the shape
    anchor = next(
        (
            i for i in node.inputs
            if (i.owner is None or not isinstance(i.owner.op, Alloc))
            and i.type.ndim == out.type.ndim
            and provably_same_shape(i, out)
        ),
        None,
    )
    if anchor is None:
        return False
    changed = False
    new_inputs = []
    for i in node.inputs:
        if (
            i is not anchor
            and i.owner is not None
            and isinstance(i.owner.op, Alloc)
            and provably_same_shape(i, out)
        ):
            v = i.owner.inputs[0]
            # re-broadcastable: pad v to the output ndim with leading 'x'
            if v.type.ndim < i.type.ndim:
                pad = i.type.ndim - v.type.ndim
                v = DimShuffle(
                    v.type.ndim, ("x",) * pad + tuple(range(v.type.ndim))
                )(v)
            elif v.type.ndim != i.type.ndim:
                new_inputs.append(i)
                continue
            new_inputs.append(v)
            changed = True
        else:
            new_inputs.append(i)
    if not changed:
        return False
    res = node.op(*new_inputs, return_list=True)
    conv = [o.type.convert_variable(r) for o, r in zip(node.outputs, res)]
    if any(c is None for c in conv):
        return False
    for o, c in zip(node.outputs, conv):
        copy_stack_trace(o, c)
    return conv


register_specialize(local_elemwise_alloc)


@node_rewriter(None)
def local_useless_topk(fgraph, node):
    """TopK computing both values and indices with one output unused →
    the single-output op (reference ``local_useless_topk``)."""
    from aesara_tpu.tensor.sort import TopKOp

    if not isinstance(node.op, TopKOp):
        return False
    op = node.op
    if not (op.return_values and op.return_indices):
        return False
    vals, idxs = node.outputs
    vals_used = bool(fgraph.clients.get(vals))
    idxs_used = bool(fgraph.clients.get(idxs))
    if vals_used and idxs_used:
        return False
    if not vals_used and not idxs_used:
        return False
    new_op = TopKOp(
        axis=op.axis, sorted=op.sorted,
        return_values=vals_used, return_indices=idxs_used,
        idx_dtype=op.idx_dtype,
    )
    (new_out,) = new_op(*node.inputs, return_list=True)
    if vals_used:
        copy_stack_trace(vals, new_out)
        return {vals: new_out}
    copy_stack_trace(idxs, new_out)
    return {idxs: new_out}


register_useless(local_useless_topk)


@node_rewriter([Elemwise])
def local_upcast_elemwise_constant_inputs(fgraph, node):
    """Scalar constants feeding an Elemwise upcast to the output dtype
    at compile time, removing runtime Cast chains (reference
    ``local_upcast_elemwise_constant_inputs``)."""
    if len(node.outputs) != 1:
        return False
    out_dtype = node.outputs[0].type.dtype
    if out_dtype in ("bool",):
        return False
    changed = False
    new_inputs = []
    for i in node.inputs:
        if (
            isinstance(i, Constant)
            and i.type.ndim == 0
            and i.type.dtype != out_dtype
            and i.type.dtype not in ("bool",)
        ):
            try:
                if np.can_cast(np.asarray(i.data).dtype, np.dtype(out_dtype),
                               casting="same_kind") or np.asarray(
                    np.asarray(i.data).astype(out_dtype)
                ) == np.asarray(i.data):
                    new_c = constant(
                        np.asarray(i.data).astype(out_dtype), dtype=out_dtype
                    )
                    new_inputs.append(new_c)
                    changed = True
                    continue
            except (TypeError, ValueError):
                pass
        new_inputs.append(i)
    if not changed:
        return False
    res = node.op(*new_inputs, return_list=True)
    if res[0].type != node.outputs[0].type:
        return False
    for o, r in zip(node.outputs, res):
        copy_stack_trace(o, r)
    return res


register_canonicalize(local_upcast_elemwise_constant_inputs)


@node_rewriter([Elemwise])
def local_fill_sink(fgraph, node):
    """f(fill(a, b), c) → fill(a, f(b, c)): sink fills below other
    elemwise ops so the *values* become adjacent for algebraic
    cancellation (reference ``local_fill_sink`` — grad graphs are full
    of ``second``/fill wrappers that otherwise block patterns)."""
    if isinstance(node.op.scalar_op, aes.ops.Second):
        return False
    if len(node.outputs) != 1:
        return False
    templates = []
    new_inputs = []
    changed = False
    for i in node.inputs:
        o = i.owner
        if (
            o is not None
            and isinstance(o.op, Elemwise)
            and isinstance(o.op.scalar_op, aes.ops.Second)
        ):
            templates.append(o.inputs[0])
            new_inputs.append(o.inputs[1])
            changed = True
        else:
            new_inputs.append(i)
    if not changed:
        return False
    from aesara_tpu.tensor.basic import fill

    res = node.op(*new_inputs)
    for t in templates:
        res = fill(t, res)
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(local_fill_sink)


@node_rewriter([Elemwise])
def local_fill_to_alloc(fgraph, node):
    """fill(template, v) that survives canonicalize (shape NOT provably
    equal) → explicit ``alloc(v, *template.shape)`` at specialize — the
    broadcast is explicit for XLA and the template value is dead
    (reference ``local_fill_to_alloc``)."""
    if not isinstance(node.op.scalar_op, aes.ops.Second):
        return False
    template, v = node.inputs
    out = node.outputs[0]
    # the alloc takes its dims from the TEMPLATE: only valid when the
    # value does not broadcast the template (reference guard:
    # shape_ref.broadcastable == out.broadcastable)
    if v.type.ndim > template.type.ndim:
        return False
    t_bcast = tuple(s == 1 for s in template.type.shape)
    o_bcast = tuple(s == 1 for s in out.type.shape)
    if template.type.ndim != out.type.ndim or t_bcast != o_bcast:
        return False
    from aesara_tpu.tensor.basic import alloc
    from aesara_tpu.tensor.shape import shape_i

    vv = v
    if vv.type.dtype != out.type.dtype:
        vv = cast(vv, out.type.dtype)
    res = alloc(vv, *[shape_i(template, d) for d in range(out.type.ndim)])
    conv = out.type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(out, conv)
    return [conv]


register_specialize(local_fill_to_alloc)
