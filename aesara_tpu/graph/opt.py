"""Deprecated-name alias: ``graph/opt.py`` → ``graph/rewriting/basic.py``
(mirrors the reference's own deprecation shim, including the old
``*Optimizer`` names)."""
from aesara_tpu.graph.rewriting.basic import *  # noqa: F401,F403
from aesara_tpu.graph.rewriting.basic import (  # noqa: F401
    EquilibriumGraphRewriter as EquilibriumOptimizer,
    GraphRewriter as GlobalOptimizer,
    NodeRewriter as LocalOptimizer,
    SequentialGraphRewriter as SeqOptimizer,
    WalkingGraphRewriter as TopoOptimizer,
    in2out,
    node_rewriter as local_optimizer,
)
