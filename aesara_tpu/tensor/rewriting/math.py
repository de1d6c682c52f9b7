"""Math rewrites: algebraic canonicalization and numerical stabilization
(reference ``aesara/tensor/rewriting/math.py``, 3,643 LoC / 47 rewriters:
AlgebraicCanonizer:664, local_exp_log:283, log1p/expm1/softplus
stabilizations)."""

from __future__ import annotations

import numpy as np

from aesara_tpu import scalar as aes
from aesara_tpu.compile.mode import (
    register_canonicalize,
    register_specialize,
    register_stabilize,
)
from aesara_tpu.graph.ir import Constant
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.scalar.ops import discrete_dtypes
from aesara_tpu.tensor.basic import (
    NotScalarConstantError,
    as_tensor_variable,
    cast,
    constant,
    get_scalar_constant_value,
)
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
import aesara_tpu.tensor.math as tm


def _is_elemwise(node, scalar_cls):
    return isinstance(node.op, Elemwise) and isinstance(node.op.scalar_op, scalar_cls)


def _const_val(var):
    try:
        return get_scalar_constant_value(var, only_process_constants=True)
    except NotScalarConstantError:
        return None


def _keep_type(out_var, res):
    """Match the replaced variable's dtype (rewrites must preserve types)."""
    if res.type.dtype != out_var.type.dtype:
        res = cast(res, out_var.type.dtype)
    if res.type.ndim != out_var.type.ndim:
        return None
    conv = out_var.type.convert_variable(res)
    return conv


# ---------------------------------------------------------------------------
# canonicalize: identity elements and inverses
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_add_zero(fgraph, node):
    """x + 0 → x ; x - 0 → x"""
    if _is_elemwise(node, (aes.ops.Add, aes.ops.Sub)):
        is_sub = isinstance(node.op.scalar_op, aes.ops.Sub)
        new_inputs = []
        for i, inp in enumerate(node.inputs):
            v = _const_val(inp)
            if v is not None and np.all(np.asarray(v) == 0) and (not is_sub or i == 1):
                continue
            new_inputs.append(inp)
        if len(new_inputs) == len(node.inputs) or not new_inputs:
            return False
        if len(new_inputs) == 1:
            res = _keep_type(node.outputs[0], new_inputs[0])
        elif is_sub:
            return False
        else:
            res = _keep_type(node.outputs[0], tm.add(*new_inputs))
        if res is None:
            return False
        copy_stack_trace(node.outputs[0], res)
        return [res]
    return False


register_canonicalize(local_add_zero)


@node_rewriter([Elemwise])
def local_mul_one_or_zero(fgraph, node):
    """x*1 → x ; x*0 → zeros"""
    if not _is_elemwise(node, aes.ops.Mul):
        return False
    new_inputs = []
    found_zero = False
    for inp in node.inputs:
        v = _const_val(inp)
        if v is not None and np.all(np.asarray(v) == 1):
            continue
        if v is not None and np.all(np.asarray(v) == 0):
            found_zero = True
        new_inputs.append(inp)
    out = node.outputs[0]
    if found_zero:
        # result is zeros with the full broadcast shape: sum the
        # zeros_like of every input (keeps shape semantics)
        acc = None
        for inp in node.inputs:
            z = inp.zeros_like(dtype=out.type.dtype) if hasattr(inp, "zeros_like") else None
            acc = z if acc is None else acc + z
        res = _keep_type(out, acc)
        if res is None:
            return False
        copy_stack_trace(out, res)
        return [res]
    if len(new_inputs) == len(node.inputs):
        return False
    if not new_inputs:
        return False
    res = new_inputs[0] if len(new_inputs) == 1 else tm.mul(*new_inputs)
    res = _keep_type(out, res)
    if res is None:
        return False
    copy_stack_trace(out, res)
    return [res]


register_canonicalize(local_mul_one_or_zero)


@node_rewriter([Elemwise])
def local_div_one(fgraph, node):
    """x / 1 → x"""
    if not _is_elemwise(node, aes.ops.TrueDiv):
        return False
    v = _const_val(node.inputs[1])
    if v is not None and np.all(np.asarray(v) == 1):
        res = _keep_type(node.outputs[0], node.inputs[0])
        if res is None:
            return False
        return [res]
    return False


register_canonicalize(local_div_one)


@node_rewriter([Elemwise])
def local_neg_neg(fgraph, node):
    """-(-x) → x"""
    if not _is_elemwise(node, aes.ops.Neg):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_elemwise(inner, aes.ops.Neg):
        return [inner.inputs[0]]
    return False


register_canonicalize(local_neg_neg)


@node_rewriter([Elemwise])
def local_exp_log(fgraph, node):
    """exp(log(x)) → x ; log(exp(x)) → x (reference ``math.py:283``)."""
    sop = node.op.scalar_op
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Elemwise):
        return False
    in_sop = inner.op.scalar_op
    if isinstance(sop, aes.ops.Log) and isinstance(in_sop, aes.ops.Exp):
        res = _keep_type(node.outputs[0], inner.inputs[0])
        return [res] if res is not None else False
    if isinstance(sop, aes.ops.Exp) and isinstance(in_sop, aes.ops.Log):
        # only valid for x > 0 — the reference registers this in
        # specialize (value-domain caveat); we follow
        return False
    return False


register_canonicalize(local_exp_log)


@node_rewriter([Elemwise])
def local_sqr_sqrt(fgraph, node):
    """sqr(sqrt(x)) → x (x≥0 domain, as in reference); sqrt(sqr(x)) → |x|"""
    sop = node.op.scalar_op
    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, Elemwise):
        return False
    in_sop = inner.op.scalar_op
    if isinstance(sop, aes.ops.Sqr) and isinstance(in_sop, aes.ops.Sqrt):
        res = _keep_type(node.outputs[0], inner.inputs[0])
        return [res] if res is not None else False
    if isinstance(sop, aes.ops.Sqrt) and isinstance(in_sop, aes.ops.Sqr):
        res = _keep_type(node.outputs[0], tm.abs(inner.inputs[0]))
        return [res] if res is not None else False
    return False


register_canonicalize(local_sqr_sqrt)


# ---------------------------------------------------------------------------
# stabilize
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_log1p(fgraph, node):
    """log(1 + x) → log1p(x) (reference log1p stabilization)."""
    if not _is_elemwise(node, aes.ops.Log):
        return False
    inner = node.inputs[0].owner
    if inner is None or not _is_elemwise(inner, aes.ops.Add):
        return False
    ones = [i for i in inner.inputs if _const_val(i) is not None
            and np.all(np.asarray(_const_val(i)) == 1)]
    others = [i for i in inner.inputs if i not in ones]
    if not ones or not others:
        return False
    rest = others[0] if len(others) == 1 else tm.add(*others)
    res = _keep_type(node.outputs[0], tm.log1p(rest))
    if res is None:
        return False
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_stabilize(local_log1p)


@node_rewriter([Elemwise])
def local_expm1(fgraph, node):
    """exp(x) - 1 → expm1(x)"""
    if not _is_elemwise(node, aes.ops.Sub):
        return False
    a, b = node.inputs
    vb = _const_val(b)
    if (
        vb is not None
        and np.all(np.asarray(vb) == 1)
        and a.owner is not None
        and _is_elemwise(a.owner, aes.ops.Exp)
    ):
        res = _keep_type(node.outputs[0], tm.expm1(a.owner.inputs[0]))
        if res is None:
            return False
        copy_stack_trace(node.outputs[0], res)
        return [res]
    return False


register_stabilize(local_expm1)


@node_rewriter([Elemwise])
def local_exp_over_1_plus_exp(fgraph, node):
    """1/(1+exp(-x)) → sigmoid(x); exp(x)/(1+exp(x)) → sigmoid(x)
    (reference ``nnet/sigm.py`` rewrites)."""
    if not _is_elemwise(node, aes.ops.TrueDiv):
        return False
    num, den = node.inputs
    if den.owner is None or not _is_elemwise(den.owner, aes.ops.Add):
        return False
    den_terms = den.owner.inputs
    ones = [i for i in den_terms if _const_val(i) is not None
            and np.all(np.asarray(_const_val(i)) == 1)]
    exps = [i for i in den_terms
            if i.owner is not None and _is_elemwise(i.owner, aes.ops.Exp)]
    if len(den_terms) != 2 or not ones or not exps:
        return False
    exp_arg = exps[0].owner.inputs[0]
    vnum = _const_val(num)
    if vnum is not None and np.all(np.asarray(vnum) == 1):
        # 1/(1+exp(u)) = sigmoid(-u); fold -(-v) directly
        if exp_arg.owner is not None and _is_elemwise(exp_arg.owner, aes.ops.Neg):
            neg_arg = exp_arg.owner.inputs[0]
        else:
            neg_arg = tm.neg(exp_arg)
        res = _keep_type(node.outputs[0], tm.sigmoid(neg_arg))
    elif (
        num.owner is not None
        and _is_elemwise(num.owner, aes.ops.Exp)
        and num.owner.inputs[0] is exp_arg
    ):
        res = _keep_type(node.outputs[0], tm.sigmoid(exp_arg))
    else:
        return False
    if res is None:
        return False
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_stabilize(local_exp_over_1_plus_exp)


@node_rewriter([Elemwise])
def local_log_sigmoid_to_softplus(fgraph, node):
    """log(sigmoid(x)) → -softplus(-x) (reference sigm.py)."""
    if not _is_elemwise(node, aes.ops.Log):
        return False
    inner = node.inputs[0].owner
    from aesara_tpu.scalar.math import Sigmoid

    if inner is not None and _is_elemwise(inner, Sigmoid):
        x = inner.inputs[0]
        res = _keep_type(node.outputs[0], tm.neg(tm.softplus(tm.neg(x))))
        if res is None:
            return False
        copy_stack_trace(node.outputs[0], res)
        return [res]
    return False


register_stabilize(local_log_sigmoid_to_softplus)


@node_rewriter([Elemwise])
def local_log1p_exp_to_softplus(fgraph, node):
    """log1p(exp(x)) → softplus(x)"""
    if not _is_elemwise(node, aes.ops.Log1p):
        return False
    inner = node.inputs[0].owner
    if inner is not None and _is_elemwise(inner, aes.ops.Exp):
        res = _keep_type(node.outputs[0], tm.softplus(inner.inputs[0]))
        if res is None:
            return False
        copy_stack_trace(node.outputs[0], res)
        return [res]
    return False


register_stabilize(local_log1p_exp_to_softplus)


# ---------------------------------------------------------------------------
# specialize
# ---------------------------------------------------------------------------

@node_rewriter([Elemwise])
def local_mul_switch_sink(fgraph, node):
    """mul(switch(c, 0, x), y) → switch(c, 0, mul(x, y)) — keeps the zero
    branch from polluting gradients with NaNs (reference ``math.py:493``)."""
    if not _is_elemwise(node, aes.ops.Mul):
        return False
    for idx, inp in enumerate(node.inputs):
        if inp.owner is None or not _is_elemwise(inp.owner, aes.ops.Switch):
            continue
        cond, ift, iff = inp.owner.inputs
        v_ift = _const_val(ift)
        v_iff = _const_val(iff)
        others = [x for j, x in enumerate(node.inputs) if j != idx]
        if v_ift is not None and np.all(np.asarray(v_ift) == 0):
            new_mul = tm.mul(iff, *others)
            from aesara_tpu.tensor.basic import switch as tswitch

            res = _keep_type(node.outputs[0], tswitch(cond, ift, new_mul))
            if res is None:
                continue
            copy_stack_trace(node.outputs[0], res)
            return [res]
        if v_iff is not None and np.all(np.asarray(v_iff) == 0):
            new_mul = tm.mul(ift, *others)
            from aesara_tpu.tensor.basic import switch as tswitch

            res = _keep_type(node.outputs[0], tswitch(cond, new_mul, iff))
            if res is None:
                continue
            copy_stack_trace(node.outputs[0], res)
            return [res]
    return False


register_specialize(local_mul_switch_sink)


@node_rewriter([tm.Dot])
def local_dot_to_batched_dot(fgraph, node):
    """no-op placeholder keeping the reference's BlasOpt tag structure:
    on TPU every Dot already lowers to MXU dot_general (SURVEY §2.11
    item 4), so there is no gemm/gemv/ger specialization to do."""
    return False


register_specialize(local_dot_to_batched_dot, "BlasOpt")


@node_rewriter([Elemwise])
def local_flatten_add_mul(fgraph, node):
    """Flatten nested add/mul chains into one variadic node and fold the
    collected constants — the core of the reference's AlgebraicCanonizer
    (``math.py:664``) normal form."""
    sop = node.op.scalar_op
    if not isinstance(sop, (aes.ops.Add, aes.ops.Mul)):
        return False
    is_add = isinstance(sop, aes.ops.Add)
    flat = []
    changed = False
    for inp in node.inputs:
        inner = inp.owner
        if (
            inner is not None
            and isinstance(inner.op, Elemwise)
            and type(inner.op.scalar_op) is type(sop)
            and len(fgraph.clients.get(inp, [])) == 1
        ):
            flat.extend(inner.inputs)
            changed = True
        else:
            flat.append(inp)
    # collect constants
    const_vals = []
    rest = []
    for v in flat:
        cv = _const_val(v)
        if cv is not None and np.asarray(cv).size == 1:
            const_vals.append(np.asarray(cv))
        else:
            rest.append(v)
    if len(const_vals) > 1:
        changed = True
    if not changed:
        return False
    if const_vals:
        total = const_vals[0]
        for c in const_vals[1:]:
            total = total + c if is_add else total * c
        neutral = 0 if is_add else 1
        if not np.all(total == neutral):
            rest = rest + [constant(total.reshape(())[()])]
    if not rest:
        return False
    if len(rest) == 1:
        res = rest[0]
    else:
        res = tm.add(*rest) if is_add else tm.mul(*rest)
    res = _keep_type(node.outputs[0], res)
    if res is None:
        return False
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_canonicalize(local_flatten_add_mul)
