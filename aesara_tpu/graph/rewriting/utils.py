"""Rewrite-related convenience helpers (reference
``aesara/graph/rewriting/utils.py``: rewrite_graph:21, is_same_graph:126).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Variable, equal_computations, graph_inputs


def rewrite_graph(
    graph: Union[Variable, Sequence[Variable], FunctionGraph],
    include: Sequence[str] = ("canonicalize",),
    custom_rewrite=None,
    clone: bool = False,
    **kwargs,
):
    """Apply the default rewrite pipeline (restricted to ``include`` tags)
    to a standalone graph or FunctionGraph (ref ``utils.py:21``)."""
    from aesara_tpu.compile.mode import optdb
    from aesara_tpu.graph.rewriting.db import RewriteDatabaseQuery

    return_fgraph = isinstance(graph, FunctionGraph)
    if return_fgraph:
        fgraph = graph
    else:
        outputs = [graph] if isinstance(graph, Variable) else list(graph)
        fgraph = FunctionGraph(outputs=outputs, clone=clone)

    query_rewrites = optdb.query(RewriteDatabaseQuery(include=include, **kwargs))
    query_rewrites.rewrite(fgraph)
    if custom_rewrite is not None:
        if not hasattr(custom_rewrite, "rewrite"):
            # node-local rewriter (e.g. a LocalGroupDB query result):
            # promote to a whole-graph pass
            from aesara_tpu.graph.rewriting.basic import in2out

            custom_rewrite = in2out(custom_rewrite)
        custom_rewrite.rewrite(fgraph)

    if return_fgraph:
        return fgraph
    if isinstance(graph, Variable):
        return fgraph.outputs[0]
    return fgraph.outputs


def is_same_graph(var1: Variable, var2: Variable, givens: Optional[dict] = None) -> bool:
    """Structural equality after substituting ``givens`` (ref ``:126``)."""
    from aesara_tpu.graph.ir import clone_replace

    if givens:
        var1 = clone_replace(var1, replace=givens)
        var2 = clone_replace(var2, replace=givens)
    return equal_computations([var1], [var2])


def get_clients_at_depth(fgraph, node, depth: int):
    """Client applies exactly ``depth`` hops downstream (reference
    ``get_clients_at_depth``)."""
    frontier = [node]
    for _ in range(depth):
        nxt = []
        for n in frontier:
            for out in n.outputs:
                for client, _i in fgraph.clients.get(out, []):
                    if client != "output":
                        nxt.append(client)
        frontier = nxt
    return frontier


def is_same_graph_with_merge(var1, var2, givens=None):
    """Structural equality via running MergeOptimizer on the combined
    graph (reference ``is_same_graph_with_merge``)."""
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.graph.rewriting.basic import MergeOptimizer

    givens = givens or {}
    from aesara_tpu.graph.ir import clone_replace

    v1, v2 = clone_replace([var1, var2], replace=givens)
    fg = FunctionGraph(outputs=[v1, v2], clone=True)
    MergeOptimizer().rewrite(fg)
    return fg.outputs[0] is fg.outputs[1]
