"""Rewrite-engine behavior corpus.

Behavior specs mirroring the reference rewriting suite's intents
(``/root/reference/tests/graph/rewriting/test_basic.py``): pattern
matching with repeated variables/constraints/literals, substitution and
removal rewriters, walking order, op-key tracking, equilibrium
convergence, merge/CSE including constants, and stack-trace
propagation.  Written fresh against this framework's API.
"""

import numpy as np
import pytest

from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Apply, Constant, Type, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.graph.rewriting.basic import (
    EquilibriumGraphRewriter,
    MergeOptimizer,
    OpKeyGraphRewriter,
    PatternNodeRewriter,
    RemovalNodeRewriter,
    SequentialGraphRewriter,
    SequentialNodeRewriter,
    SubstitutionNodeRewriter,
    WalkingGraphRewriter,
    check_chain,
    copy_stack_trace,
    graph_rewriter,
    in2out,
    node_rewriter,
)


class _T(Type):
    def filter(self, data, strict=False, allow_downcast=None):
        return data

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))

    def __str__(self):
        return "T"


T = _T()


def V(name=None):
    return Variable(T, None, None, name=name)


class _NamedOp(Op):
    __props__ = ("label",)

    def __init__(self, label, nin):
        self.label = label
        self.nin = nin

    def make_node(self, *inputs):
        assert len(inputs) == self.nin
        inputs = [
            i if isinstance(i, Variable) else Constant(T, i) for i in inputs
        ]
        return Apply(self, list(inputs), [V()])

    def perform(self, node, inputs, outputs):
        outputs[0][0] = inputs[0]

    def __str__(self):
        return self.label


op1 = _NamedOp("op1", 2)
op2 = _NamedOp("op2", 2)
op3 = _NamedOp("op3", 2)
ident = _NamedOp("ident", 1)
box = _NamedOp("box", 1)


def ops_in(fg):
    return sorted(str(n.op) for n in fg.apply_nodes)


def make_fg(*outputs):
    from aesara_tpu.graph.ir import graph_inputs

    ins = [i for i in graph_inputs(outputs) if not isinstance(i, Constant)]
    return FunctionGraph(ins, list(outputs), clone=False)


# --- PatternNodeRewriter --------------------------------------------------------


def test_pattern_basic_swap():
    x, y = V("x"), V("y")
    fg = make_fg(op1(x, y))
    prw = PatternNodeRewriter((op1, "a", "b"), (op2, "b", "a"))
    WalkingGraphRewriter(prw).rewrite(fg)
    (node,) = fg.apply_nodes
    assert node.op is op2 and node.inputs == [y, x]


def test_pattern_repeated_var_requires_same_variable():
    x, y = V("x"), V("y")
    prw = PatternNodeRewriter((op1, "a", "a"), (ident, "a"))
    fg_hit = make_fg(op1(x, x))
    WalkingGraphRewriter(prw).rewrite(fg_hit)
    assert ops_in(fg_hit) == ["ident"]
    fg_miss = make_fg(op1(x, y))
    WalkingGraphRewriter(prw).rewrite(fg_miss)
    assert ops_in(fg_miss) == ["op1"]


def test_pattern_nested():
    x, y, z = V("x"), V("y"), V("z")
    fg = make_fg(op1(op2(x, y), z))
    prw = PatternNodeRewriter((op1, (op2, "a", "b"), "c"), (op3, "a", (op3, "b", "c")))
    WalkingGraphRewriter(prw).rewrite(fg)
    assert ops_in(fg) == ["op3", "op3"]


def test_pattern_constraint_blocks_match():
    x, y = V("x"), V("y")
    prw = PatternNodeRewriter(
        (op1, "a", "b"),
        (op2, "a", "b"),
        constraints={"a": lambda v: v.name == "x"},
    )
    fg_hit = make_fg(op1(x, y))
    WalkingGraphRewriter(prw).rewrite(fg_hit)
    assert ops_in(fg_hit) == ["op2"]
    fg_miss = make_fg(op1(y, x))
    WalkingGraphRewriter(prw).rewrite(fg_miss)
    assert ops_in(fg_miss) == ["op1"]


def test_pattern_literal_constant_match():
    x = V("x")
    c2 = Constant(T, 2)
    c3 = Constant(T, 3)
    prw = PatternNodeRewriter((op1, "a", 2), (ident, "a"))
    fg_hit = make_fg(box(op1(x, c2)))
    WalkingGraphRewriter(prw).rewrite(fg_hit)
    assert "ident" in ops_in(fg_hit) and "op1" not in ops_in(fg_hit)
    fg_miss = make_fg(box(op1(x, c3)))
    WalkingGraphRewriter(prw).rewrite(fg_miss)
    assert "op1" in ops_in(fg_miss)


def test_pattern_multiple_clients_blocks_inner_match():
    x, y, z = V("x"), V("y"), V("z")
    inner = op2(x, y)
    out1 = op1(inner, z)
    out2 = box(inner)  # second client of the inner subexpression
    fg = make_fg(out1, out2)
    prw = PatternNodeRewriter((op1, (op2, "a", "b"), "c"), (op3, "a", "c"))
    WalkingGraphRewriter(prw).rewrite(fg)
    # inner op2 feeds box too: fusing it away would change out2
    assert "op1" in ops_in(fg)
    # with allow_multiple_clients the rewrite proceeds
    fg2 = make_fg(op1(inner, z), box(inner))
    prw2 = PatternNodeRewriter(
        (op1, (op2, "a", "b"), "c"), (op3, "a", "c"), allow_multiple_clients=True
    )
    WalkingGraphRewriter(prw2).rewrite(fg2)
    assert "op1" not in ops_in(fg2)


# --- substitution / removal / sequential ----------------------------------------


def test_substitution_rewriter():
    x, y = V("x"), V("y")
    fg = make_fg(op1(op1(x, y), y))
    WalkingGraphRewriter(SubstitutionNodeRewriter(op1, op2)).rewrite(fg)
    assert ops_in(fg) == ["op2", "op2"]


def test_removal_rewriter():
    x, y = V("x"), V("y")
    fg = make_fg(op1(ident(x), y))
    WalkingGraphRewriter(RemovalNodeRewriter(ident)).rewrite(fg)
    assert ops_in(fg) == ["op1"]
    (node,) = fg.apply_nodes
    assert node.inputs[0] is x


def test_sequential_node_rewriter_first_win():
    x, y = V("x"), V("y")
    to_op2 = PatternNodeRewriter((op1, "a", "b"), (op2, "a", "b"), name="to2")
    to_op3 = PatternNodeRewriter((op1, "a", "b"), (op3, "a", "b"), name="to3")
    seq = SequentialNodeRewriter(to_op2, to_op3)
    fg = make_fg(op1(x, y))
    WalkingGraphRewriter(seq).rewrite(fg)
    assert ops_in(fg) == ["op2"]


def test_node_rewriter_decorator_tracks():
    calls = []

    @node_rewriter([op1])
    def only_op1(fgraph, node):
        calls.append(node.op)
        return False

    x, y = V("x"), V("y")
    fg = make_fg(op2(op1(x, y), y))
    WalkingGraphRewriter(only_op1).rewrite(fg)
    assert calls and all(o is op1 for o in calls)


# --- walking order / op-key -------------------------------------------------------


def test_walking_out_to_in_sees_consumers_first():
    seen = []

    @node_rewriter([_NamedOp])
    def record(fgraph, node):
        seen.append(str(node.op))
        return False

    x = V("x")
    fg = make_fg(box(ident(x)))
    WalkingGraphRewriter(record, order="out_to_in").rewrite(fg)
    assert seen == ["box", "ident"]
    seen.clear()
    WalkingGraphRewriter(record, order="in_to_out").rewrite(fg)
    assert seen == ["ident", "box"]


def test_op_key_rewriter_only_tracked_nodes():
    seen = []

    @node_rewriter([op1])
    def record(fgraph, node):
        seen.append(node)
        return False

    x, y = V("x"), V("y")
    fg = make_fg(op2(op1(x, y), ident(y)))
    OpKeyGraphRewriter(record).rewrite(fg)
    assert len(seen) == 1 and seen[0].op is op1


# --- equilibrium ---------------------------------------------------------------------


def test_equilibrium_converges_through_chain():
    # op1 -> op2 -> op3 needs two passes; equilibrium reaches fixpoint
    x, y = V("x"), V("y")
    r12 = PatternNodeRewriter((op1, "a", "b"), (op2, "a", "b"), name="r12")
    r23 = PatternNodeRewriter((op2, "a", "b"), (op3, "a", "b"), name="r23")
    fg = make_fg(op1(op1(x, y), y))
    EquilibriumGraphRewriter([r12, r23], max_use_ratio=10).rewrite(fg)
    assert ops_in(fg) == ["op3", "op3"]


def test_equilibrium_nested_growth_terminates():
    # ident(ident(...)) collapse: repeatedly strips wrappers
    x = V("x")
    out = x
    for _ in range(6):
        out = ident(out)
    fg = make_fg(box(out))
    EquilibriumGraphRewriter(
        [RemovalNodeRewriter(ident)], max_use_ratio=50
    ).rewrite(fg)
    assert ops_in(fg) == ["box"]
    (node,) = fg.apply_nodes
    assert node.inputs[0] is x


def test_equilibrium_ping_pong_guard_terminates():
    # a <-> b rules would loop forever; the max-use-ratio guard must stop it
    x, y = V("x"), V("y")
    ab = PatternNodeRewriter((op1, "a", "b"), (op2, "a", "b"), name="ab")
    ba = PatternNodeRewriter((op2, "a", "b"), (op1, "a", "b"), name="ba")
    fg = make_fg(op1(x, y))
    try:
        EquilibriumGraphRewriter([ab, ba], max_use_ratio=5).rewrite(fg)
    except Exception:
        pass  # raising is acceptable; hanging is not
    assert len(fg.apply_nodes) == 1  # structure stayed sane


# --- merge / CSE -----------------------------------------------------------------------


def test_merge_duplicate_subgraphs():
    x, y = V("x"), V("y")
    a1 = op1(x, y)
    a2 = op1(x, y)
    fg = make_fg(op2(a1, a2))
    MergeOptimizer().rewrite(fg)
    (top,) = [n for n in fg.apply_nodes if n.op is op2]
    assert top.inputs[0] is top.inputs[1]
    assert len([n for n in fg.apply_nodes if n.op is op1]) == 1


def test_merge_equal_constants():
    x = V("x")
    c1 = Constant(T, 5)
    c2 = Constant(T, 5)
    fg = make_fg(op2(op1(x, c1), op1(x, c2)))
    MergeOptimizer().rewrite(fg)
    assert len([n for n in fg.apply_nodes if n.op is op1]) == 1


def test_merge_keeps_distinct_constants():
    x = V("x")
    fg = make_fg(op2(op1(x, Constant(T, 5)), op1(x, Constant(T, 6))))
    MergeOptimizer().rewrite(fg)
    assert len([n for n in fg.apply_nodes if n.op is op1]) == 2


def test_merge_recursive():
    # identical two-level towers merge completely
    x, y = V("x"), V("y")
    t1 = op2(op1(x, y), y)
    t2 = op2(op1(x, y), y)
    fg = make_fg(op3(t1, t2))
    MergeOptimizer().rewrite(fg)
    assert len(fg.apply_nodes) == 3  # op1, op2, op3


# --- stack traces / helpers -------------------------------------------------------------


def test_copy_stack_trace():
    src, dst = V("src"), V("dst")
    src.tag.trace = [["somewhere.py:1"]]
    copy_stack_trace(src, dst)
    assert dst.tag.trace == [["somewhere.py:1"]]


def test_check_chain():
    x, y = V("x"), V("y")
    out = op1(op2(x, y), y)
    assert check_chain(out, op1, op2)
    assert not check_chain(out, op2, op1)


def test_graph_rewriter_decorator_and_sequence():
    order = []

    @graph_rewriter
    def first(fgraph):
        order.append("first")

    @graph_rewriter
    def second(fgraph):
        order.append("second")

    x, y = V("x"), V("y")
    fg = make_fg(op1(x, y))
    SequentialGraphRewriter(first, second).rewrite(fg)
    assert order == ["first", "second"]


def test_in2out_composes_node_rewriters():
    x, y = V("x"), V("y")
    fg = make_fg(op1(op2(x, y), y))
    in2out(
        SubstitutionNodeRewriter(op1, op3),
        SubstitutionNodeRewriter(op2, op3),
        name="both",
    ).rewrite(fg)
    assert ops_in(fg) == ["op3", "op3"]


def test_check_chain_edge_cases():
    """Review regression: a fully-matched chain ending at a zero-input op
    must match, and a None element asserts ownerlessness."""

    class _Leaf(Op):
        __props__ = ()

        def make_node(self):
            return Apply(self, [], [V()])

        def perform(self, node, inputs, outputs):
            outputs[0][0] = 0

    leaf = _Leaf()
    out = ident(leaf())
    assert check_chain(out, ident, _Leaf)
    assert check_chain(out, ident)
    assert not check_chain(out, box)
    # None element: next position must be ownerless
    x = V("x")
    out2 = ident(x)
    assert check_chain(out2, ident, None)
    assert not check_chain(ident(ident(x)), ident, None)


def test_check_chain_zero_input_final_documented_divergence():
    """Intentional divergence from the reference (advisor r3): the reference
    expands ``chain`` to ``[op, 0, ...]`` and descends into ``inputs[0]``
    AFTER the final op, so a fully-matched chain whose final node has no
    inputs raises IndexError there.  Here ``check_chain`` stops at the last
    chain element and returns True — the safer contract.  Parity audits
    should treat this as by-design, not a bug."""

    class _Nullary(Op):
        __props__ = ()

        def make_node(self):
            return Apply(self, [], [V()])

        def perform(self, node, inputs, outputs):
            outputs[0][0] = 0

    nullary = _Nullary()
    out = ident(nullary())
    # reference: IndexError (inputs[0] of a no-input node); here: True
    assert check_chain(out, ident, _Nullary) is True
