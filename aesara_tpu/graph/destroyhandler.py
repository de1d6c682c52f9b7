"""DestroyHandler: aliasing/in-place legality
(reference ``aesara/graph/destroyhandler.py:286``).

On TPU in-place execution happens through buffer DONATION of whole-graph
inputs, not per-node destructive writes, so this feature's production
role is the *donation legality pass*: it validates that ops declaring
``destroy_map`` never destroy a protected (non-mutable) input, never
create destroy-races (two destroyers of one variable), and it supplies
the extra orderings that force all readers of a variable to run before
its destroyer (needed by the py/CVM linkers when in-place ops appear).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Set

from aesara_tpu.graph.features import AlreadyThere, Feature


class InconsistencyError(Exception):
    pass


def fast_inplace_check(fgraph, inputs):
    """Inputs that may legally be overwritten (reference ``:257``)."""
    protected = set()
    for feature in fgraph._features:
        protected |= set(getattr(feature, "protected", ()))
    return [
        i for i in inputs
        if i not in protected and i not in fgraph.outputs and i.owner is not None
    ]


class DestroyHandler(Feature):
    """Tracks destroy/view maps across the graph and validates legality."""

    pickle_rm_attr = ["destroyers", "has_destroyers"]

    def __init__(self, do_imports_on_attach: bool = True):
        self.do_imports_on_attach = do_imports_on_attach
        self.destroyers_map: Dict = {}

    def on_attach(self, fgraph):
        if hasattr(fgraph, "destroyers"):
            raise AlreadyThere("DestroyHandler already attached")
        self.destroyers_map = {}
        fgraph.destroyers = self.destroyers
        fgraph.has_destroyers = self.has_destroyers
        fgraph.destroy_handler = self
        if self.do_imports_on_attach:
            for node in fgraph.toposort():
                self.on_import(fgraph, node, "on_attach")

    def on_detach(self, fgraph):
        del fgraph.destroyers
        del fgraph.has_destroyers
        del fgraph.destroy_handler
        self.destroyers_map = {}

    def on_import(self, fgraph, node, reason):
        if node.op.destroy_map:
            for out_idx, in_idxs in node.op.destroy_map.items():
                for i in in_idxs:
                    self.destroyers_map.setdefault(node.inputs[i], []).append(node)

    def on_prune(self, fgraph, node, reason):
        if node.op.destroy_map:
            for out_idx, in_idxs in node.op.destroy_map.items():
                for i in in_idxs:
                    lst = self.destroyers_map.get(node.inputs[i], [])
                    if node in lst:
                        lst.remove(node)

    def on_change_input(self, fgraph, node, i, old_var, new_var, reason=None):
        if node == "output" or not getattr(node, "op", None):
            return
        if node.op.destroy_map:
            for out_idx, in_idxs in node.op.destroy_map.items():
                if i in in_idxs:
                    lst = self.destroyers_map.get(old_var, [])
                    if node in lst:
                        lst.remove(node)
                    self.destroyers_map.setdefault(new_var, []).append(node)

    def destroyers(self, var) -> list:
        return list(self.destroyers_map.get(var, []))

    def has_destroyers(self, vars) -> bool:
        return any(self.destroyers_map.get(v) for v in vars)

    def validate(self, fgraph):
        # 1. no variable destroyed twice
        for var, nodes in self.destroyers_map.items():
            live = [n for n in nodes if n in fgraph.apply_nodes]
            if len(live) > 1:
                raise InconsistencyError(
                    f"multiple in-place destroyers of {var}: {live}"
                )
        # 2. protected variables (fgraph inputs w/o mutable flag, outputs)
        protected = set()
        for feature in fgraph._features:
            protected |= set(getattr(feature, "protected", ()))
        for var, nodes in self.destroyers_map.items():
            live = [n for n in nodes if n in fgraph.apply_nodes]
            if live and var in protected:
                raise InconsistencyError(f"in-place op destroys protected {var}")
        # 3. ordering feasibility is enforced through orderings() +
        # toposort cycle detection

    def orderings(self, fgraph) -> dict:
        """All readers of a destroyed variable must run before the
        destroyer (reference ordering semantics)."""
        order: Dict = {}
        for var, destroyers in self.destroyers_map.items():
            live = [n for n in destroyers if n in fgraph.apply_nodes]
            if not live:
                continue
            destroyer = live[0]
            readers = [
                client for client, idx in fgraph.clients.get(var, [])
                if client != "output"
                and client is not destroyer
                and client in fgraph.apply_nodes
            ]
            if readers:
                order.setdefault(destroyer, []).extend(readers)
        return order


class Supervisor(Feature):
    """Protects non-mutable function inputs from destruction
    (reference ``compile/function/types.py:136``)."""

    def __init__(self, protected):
        self.protected = list(protected)

    def validate(self, fgraph):
        if not hasattr(fgraph, "destroyers"):
            return
        for var in self.protected:
            if fgraph.destroyers(var):
                raise InconsistencyError(
                    f"in-place op would destroy protected input {var}"
                )

    def clone(self):
        return Supervisor(self.protected)


def add_destroy_handler(fgraph):
    """Attach the handler (the reference's optdb entry at 49.5)."""
    if not hasattr(fgraph, "destroyers"):
        fgraph.attach_feature(DestroyHandler())


# register at the reference's pipeline position
from aesara_tpu.compile.mode import optdb  # noqa: E402
from aesara_tpu.graph.rewriting.basic import FromFunctionGraphRewriter  # noqa: E402

optdb.register(
    "add_destroy_handler",
    FromFunctionGraphRewriter(lambda fg: add_destroy_handler(fg)),
    "fast_run", "inplace", position=49.5,
)


class ProtocolError(Exception):
    """Inplace-legalization protocol violated (reference name)."""
