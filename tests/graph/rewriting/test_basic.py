"""Rewrite-engine tests: pattern rewriting, walking/equilibrium drivers,
merge/CSE, databases — mirrors ``tests/graph/rewriting`` strategy."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import equal_computations
from aesara_tpu.graph.rewriting.basic import (
    EquilibriumGraphRewriter,
    MergeOptimizer,
    PatternNodeRewriter,
    WalkingGraphRewriter,
    in2out,
    node_rewriter,
)
from aesara_tpu.graph.rewriting.db import (
    EquilibriumDB,
    RewriteDatabaseQuery,
    SequenceDB,
)
from aesara_tpu.tensor.elemwise import Elemwise
from aesara_tpu.tensor.math import add, exp, log, mul, neg


def test_pattern_rewriter_log_exp():
    # log(exp(x)) -> x
    rewrite = PatternNodeRewriter(
        (log.elemwise_op, (exp.elemwise_op, "x")), "x", name="log_exp"
    )
    x = at.vector("x", dtype="float64")
    z = log(exp(x)) + 1.0
    fg = FunctionGraph(outputs=[z], clone=False)
    WalkingGraphRewriter(rewrite).rewrite(fg)
    expected = x + 1.0
    assert equal_computations(fg.outputs, [expected], fg.inputs, [x])


def test_node_rewriter_decorator_and_tracking():
    calls = []

    @node_rewriter([neg.elemwise_op])
    def local_neg_neg(fgraph, node):
        calls.append(node)
        inner = node.inputs[0]
        if inner.owner and inner.owner.op == neg.elemwise_op:
            return [inner.owner.inputs[0]]
        return False

    x = at.vector("x", dtype="float64")
    z = neg(neg(x)) + 1.0
    fg = FunctionGraph(outputs=[z], clone=False)
    in2out(local_neg_neg).rewrite(fg)
    assert equal_computations(fg.outputs, [x + 1.0], fg.inputs, [x])
    assert calls  # it fired only on tracked ops


def test_equilibrium_runs_to_fixed_point():
    @node_rewriter([neg.elemwise_op])
    def local_neg_neg(fgraph, node):
        inner = node.inputs[0]
        if inner.owner and inner.owner.op == neg.elemwise_op:
            return [inner.owner.inputs[0]]
        return False

    x = at.vector("x", dtype="float64")
    z = x
    for _ in range(6):  # neg applied 6x → identity
        z = neg(z)
    fg = FunctionGraph(outputs=[z + 0.0], clone=False)
    EquilibriumGraphRewriter([local_neg_neg], max_use_ratio=10).rewrite(fg)
    assert equal_computations(fg.outputs, [x + 0.0], fg.inputs, [x])


def test_merge_optimizer_cse():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    a = (x + y) * (x + y)  # two separate add nodes
    fg = FunctionGraph(outputs=[a], clone=True)
    n_before = len(fg.apply_nodes)
    MergeOptimizer().rewrite(fg)
    assert len(fg.apply_nodes) == n_before - 1
    fg.check_integrity()


def test_merge_constants():
    x = at.vector("x", dtype="float64")
    c1 = at.constant(np.array([1.0, 2.0], dtype="float32"))
    c2 = at.constant(np.array([1.0, 2.0], dtype="float32"))
    fg = FunctionGraph(outputs=[(x + c1) * (x + c2)], clone=True)
    MergeOptimizer().rewrite(fg)
    assert len(fg.apply_nodes) == 2  # one add, one mul


def test_sequence_db_ordering_and_query():
    db = SequenceDB()
    applied = []

    class R:
        def __init__(self, tag):
            self.tag = tag
            self.name = tag

        def rewrite(self, fg):
            applied.append(self.tag)

        def add_requirements(self, fg):
            pass

        def print_summary(self, *a, **k):
            pass

    db.register("b", R("b"), "fast_run", position=2)
    db.register("a", R("a"), "fast_run", position=1)
    db.register("c", R("c"), "slow_only", position=0.5)
    seq = db.query(RewriteDatabaseQuery(include=["fast_run"]))
    x = at.vector("x", dtype="float64")
    fg = FunctionGraph(outputs=[x + 1.0], clone=False)
    seq.rewrite(fg)
    assert applied == ["a", "b"]


def test_query_include_exclude():
    db = EquilibriumDB()

    @node_rewriter([add.elemwise_op])
    def r1(fgraph, node):
        return False

    db.register("r1", r1, "fast_run", "cuda_only")
    assert db.query(RewriteDatabaseQuery(include=["fast_run"])) is not None
    assert db.query(
        RewriteDatabaseQuery(include=["fast_run"], exclude=["cuda_only"])
    ) is None


def test_position_cutoff():
    db = SequenceDB()

    @node_rewriter(None)
    def rr(fgraph, node):
        return False

    w1 = in2out(rr, name="w1")
    w2 = in2out(rr, name="w2")
    db.register("early", w1, "fast_run", position=1)
    db.register("late", w2, "fast_run", position=10)
    q = RewriteDatabaseQuery(include=["fast_run"], position_cutoff=5)
    seq = db.query(q)
    assert len(seq) == 1
