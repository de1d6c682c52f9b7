"""``ifelse``: the branching conditional (reference ``aesara/ifelse.py``:
IfElse:34, ifelse:382, rewrites:429).

The reference's IfElse is lazy only under its VM linkers; like the
reference, the op receives both branches' values as inputs, so under XLA
both branches are computed and ``lax.select_n`` picks — ``switch`` is the
elementwise variant.  (A later rewrite stage can outline branches into
inner graphs for a true ``lax.cond``.)
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

from aesara_tpu.graph.ir import Apply, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.type import TensorType


__all__ = ["IfElse", "ifelse"]


class IfElse(Op):
    """n_outs outputs; inputs = [cond] + true_branch + false_branch."""

    __props__ = ("n_outs", "as_view")

    def __init__(self, n_outs: int, as_view: bool = False, name=None):
        self.n_outs = int(n_outs)
        self.as_view = bool(as_view)
        self.name = name
        # view_map cannot express "one of two inputs" (reference
        # ifelse.py:68 hits the same limit and declares the then-branch);
        # perform() therefore COPIES the else branch so the declaration
        # is never a lie (DebugMode alias check)
        self.view_map = {k: [1 + k] for k in range(self.n_outs)}

    def make_node(self, condition, *args):
        if len(args) != 2 * self.n_outs:
            raise ValueError(
                f"IfElse({self.n_outs}) needs {2 * self.n_outs} branch args"
            )
        condition = as_tensor_variable(condition)
        if condition.type.ndim != 0:
            raise TypeError("ifelse condition must be a scalar")
        trues = [as_tensor_variable(a) for a in args[: self.n_outs]]
        falses = [as_tensor_variable(a) for a in args[self.n_outs:]]
        outs = []
        coerced = []
        for t, f in zip(trues, falses):
            if t.type.dtype != f.type.dtype:
                raise TypeError(
                    f"ifelse branches must have equal dtypes: "
                    f"{t.type.dtype} vs {f.type.dtype}"
                )
            if t.type.ndim != f.type.ndim:
                raise TypeError("ifelse branches must have equal ndim")
            shape = tuple(
                ts if ts is not None and ts == fs else None
                for ts, fs in zip(t.type.shape, f.type.shape)
            )
            outs.append(TensorType(t.type.dtype, shape)())
            coerced.extend([])
        return Apply(self, [condition] + trues + falses, outs)

    def perform(self, node, inputs, output_storage):
        cond, *rest = inputs
        if bool(cond):
            branch = rest[: self.n_outs]          # declared view
        else:
            branch = [np.array(v, copy=True)      # undeclared → copy
                      for v in rest[self.n_outs:]]
        for storage, val in zip(output_storage, branch):
            storage[0] = val

    def make_thunk(self, node, storage_map, compute_map, no_recycling,
                   impl=None):
        """Lazy thunk (reference lazylinker Stack semantics): returns the
        THUNK INDICES still needed — first the condition, then only the
        TAKEN branch — or None once the outputs are filled, so the VM
        never computes the untaken branch."""
        cond_st = storage_map[node.inputs[0]]
        cond_cm = compute_map[node.inputs[0]]
        branch_sts = [storage_map[v] for v in node.inputs[1:]]
        branch_cms = [compute_map[v] for v in node.inputs[1:]]
        out_sts = [storage_map[o] for o in node.outputs]
        out_cms = [compute_map[o] for o in node.outputs]
        n_outs = self.n_outs

        def thunk():
            owners = thunk.input_owner_index
            if not cond_cm[0]:
                return [owners[0]]
            base = 0 if bool(cond_st[0]) else n_outs
            needed = [
                owners[1 + base + k]
                for k in range(n_outs)
                if not branch_cms[base + k][0] and owners[1 + base + k] >= 0
            ]
            if needed:
                return needed
            for k in range(n_outs):
                out_sts[k][0] = branch_sts[base + k][0]
                out_cms[k][0] = True
            return None

        thunk.lazy = True
        thunk.inputs = [cond_st] + branch_sts
        thunk.outputs = out_sts
        # linker fills the input-position → thunk-index table; default
        # (“no producers”) keeps the thunk usable standalone
        thunk.input_owner_index = tuple(-1 for _ in node.inputs)
        return thunk

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.basic import switch

        cond = node.inputs[0]
        true_shapes = input_shapes[1: 1 + self.n_outs]
        false_shapes = input_shapes[1 + self.n_outs:]
        out = []
        for ts, fs in zip(true_shapes, false_shapes):
            out.append(tuple(switch(cond, t, f) for t, f in zip(ts, fs)))
        return out

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        cond, *rest = inputs
        trues = rest[: self.n_outs]
        falses = rest[self.n_outs:]
        # grads gated by the condition: zero on the untaken branch
        zeros_t = [t.zeros_like() for t in trues]
        zeros_f = [f.zeros_like() for f in falses]
        g_trues = ifelse(cond, list(output_grads), zeros_t, n_outs=self.n_outs)
        g_falses = ifelse(cond, zeros_f, list(output_grads), n_outs=self.n_outs)
        if not isinstance(g_trues, list):
            g_trues = [g_trues]
        if not isinstance(g_falses, list):
            g_falses = [g_falses]
        return [DisconnectedType()()] + g_trues + g_falses

    def connection_pattern(self, node):
        return [[False] * self.n_outs] + [
            [True] * self.n_outs for _ in range(2 * self.n_outs)
        ]

    def __str__(self):
        return f"if{{{self.n_outs}}}" if not self.as_view else f"if{{view,{self.n_outs}}}"


def ifelse(condition, then_branch, else_branch, n_outs=None, name=None):
    """Branching conditional (reference ``ifelse.py:382``)."""
    single = not isinstance(then_branch, (list, tuple))
    trues = [then_branch] if single else list(then_branch)
    falses = [else_branch] if single else list(else_branch)
    if len(trues) != len(falses):
        raise ValueError("branches must have the same number of outputs")
    if n_outs is None:
        n_outs = len(trues)
    # unify branch dtypes by upcast
    from aesara_tpu.scalar.ops import upcast
    from aesara_tpu.tensor.basic import cast

    coerced_t, coerced_f = [], []
    for t, f in zip(trues, falses):
        t = as_tensor_variable(t)
        f = as_tensor_variable(f)
        if t.type.dtype != f.type.dtype:
            dt = upcast(t.type.dtype, f.type.dtype)
            t, f = cast(t, dt), cast(f, dt)
        coerced_t.append(t)
        coerced_f.append(f)
    res = IfElse(n_outs, name=name)(condition, *coerced_t, *coerced_f)
    if single:
        return res if isinstance(res, Variable) else res[0]
    return res if isinstance(res, list) else [res]


# ---------------------------------------------------------------------------
# reference rewrite surface (ifelse.py:429-468): merge/lift passes.  Under
# whole-graph XLA, lax.cond already evaluates lazily, so these are graph-
# size reductions rather than laziness enablers.
# ---------------------------------------------------------------------------

#: ops through which a single IfElse may be lifted (reference list)
acceptable_ops = ()


def _ifelse_node_pair_key(node):
    return (id(node.inputs[0]),)


from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter  # noqa: E402


@node_rewriter([IfElse])
def cond_remove_identical(fgraph, node):
    """IfElse(c, x, x) → x (reference ``cond_remove_identical``)."""
    op = node.op
    n = op.n_outs
    trues = node.inputs[1:1 + n]
    falses = node.inputs[1 + n:1 + 2 * n]
    if all(t is f for t, f in zip(trues, falses)):
        for old, new in zip(node.outputs, trues):
            copy_stack_trace(old, new)
        return dict(zip(node.outputs, trues))
    return False


@node_rewriter([IfElse])
def cond_merge_ifs_true(fgraph, node):
    """Merge two IfElse nodes sharing the same condition: route the
    second's outputs through the first (reference ``cond_merge_ifs_*``).
    One unified pass here since branches are symmetric under lax.cond."""
    from aesara_tpu.graph.ir import ancestors

    cond = node.inputs[0]
    for other_out, _ in list(fgraph.clients.get(cond, [])):
        if other_out == "output" or other_out is node:
            continue
        other = other_out
        if not (isinstance(getattr(other, "op", None), IfElse)
                and other.inputs[0] is cond and other is not node):
            continue
        # the two nodes must be data-INDEPENDENT: if either consumes the
        # other's outputs, merging creates a cycle (review finding —
        # the old guard iterated an empty tuple and was vacuously true)
        node_outs = set(node.outputs)
        other_outs = set(other.outputs)
        if (node_outs & set(ancestors(list(other.inputs)))
                or other_outs & set(ancestors(list(node.inputs)))):
            continue
        if True:
            n1, n2 = node.op.n_outs, other.op.n_outs
            new_op = IfElse(n1 + n2)
            new_ins = ([cond] + node.inputs[1:1 + n1] + other.inputs[1:1 + n2]
                       + node.inputs[1 + n1:] + other.inputs[1 + n2:])
            new_outs = new_op(*new_ins, return_list=True)
            repl = {}
            for old, new in zip(node.outputs, new_outs[:n1]):
                repl[old] = new
            for old, new in zip(other.outputs, new_outs[n1:]):
                repl[old] = new
            for old, new in repl.items():
                copy_stack_trace(old, new)
            return repl
    return False


cond_merge_ifs_false = cond_merge_ifs_true  # symmetric under lax.cond
cond_merge_random_op = cond_merge_ifs_true
cond_make_inplace = cond_remove_identical  # inplace ≈ donation here
ifelse_lift_single_if_through_acceptable_ops = cond_remove_identical


class CondMerge:
    """Whole-graph variant of the merge pass (reference ``CondMerge``)."""

    def rewrite(self, fgraph):
        from aesara_tpu.graph.rewriting.basic import in2out

        return in2out(cond_merge_ifs_true).rewrite(fgraph)

    __call__ = rewrite


def _register_ifelse_rewrites():
    # called from aesara_tpu/__init__ once the optdb exists (the import
    # here is circular at package-init time — the mode module imports the
    # linkers which import this module)
    from aesara_tpu.compile.mode import register_specialize

    register_specialize(cond_remove_identical, name="cond_remove_identical")
