"""Relational rewriting (reference ``aesara/graph/rewriting/kanren.py:13``
KanrenRelationSub).  The external miniKanren stack is not available, so
the same role — declare (lhs, rhs) relations as unification patterns —
is served by UnifyRelationSub over the self-contained engine in
``aesara_tpu.graph.unify``."""

from __future__ import annotations

from aesara_tpu.graph.rewriting.basic import NodeRewriter, copy_stack_trace
from aesara_tpu.graph.unify import Var, reify, unify


class UnifyRelationSub(NodeRewriter):
    """Rewrite via a relation given as (lhs_pattern, rhs_pattern) pairs of
    expression tuples containing logic Vars."""

    def __init__(self, relations, node_filter=None, name=None):
        self.relations = list(relations)
        self.node_filter = node_filter
        self.name = name or "UnifyRelationSub"

    def tracks(self):
        return None

    def transform(self, fgraph, node):
        if len(node.outputs) != 1:
            return False
        if self.node_filter is not None and not self.node_filter(node):
            return False
        expr = (node.op,) + tuple(node.inputs)
        for lhs, rhs in self.relations:
            s = unify(lhs, expr, {})
            if s is None:
                continue
            out = reify(rhs, s)
            if isinstance(out, (Var, tuple)):
                continue  # unresolved logic vars
            if out.type != node.outputs[0].type:
                conv = node.outputs[0].type.convert_variable(out)
                if conv is None:
                    continue
                out = conv
            copy_stack_trace(node.outputs[0], out)
            return [out]
        return False


KanrenRelationSub = UnifyRelationSub
