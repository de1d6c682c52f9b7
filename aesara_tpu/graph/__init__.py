"""Graph core: IR, Op/Type contracts, FunctionGraph, Features, rewriting."""

from aesara_tpu.graph.ir import (
    Apply,
    AtomicVariable,
    Constant,
    NominalVariable,
    Type,
    Variable,
    ancestors,
    applys_between,
    clone,
    clone_get_equiv,
    clone_replace,
    equal_computations,
    explicit_graph_inputs,
    general_toposort,
    graph_inputs,
    io_toposort,
    orphans_between,
    truncated_graph_inputs,
    vars_between,
    walk,
)
from aesara_tpu.graph.op import Op, COp, HasInnerGraph
from aesara_tpu.graph.fg import FunctionGraph, MissingInputError
from aesara_tpu.graph.features import Feature, History, NodeFinder, ReplaceValidate, Validator
from aesara_tpu.graph.rewriting.basic import (
    GraphRewriter,
    NodeRewriter,
    PatternNodeRewriter,
    node_rewriter,
)
from aesara_tpu.graph.rewriting.utils import rewrite_graph
from aesara_tpu.graph.rewriting.basic import graph_rewriter, node_rewriter  # noqa: F401
from aesara_tpu.graph.rewriting.db import RewriteDatabaseQuery  # noqa: F401
