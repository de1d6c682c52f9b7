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


def _view_parent(var):
    """The variable ``var`` aliases through its owner's ``view_map``, or
    None (reference droot chasing, ``destroyhandler.py:286`` region)."""
    node = var.owner
    if node is None:
        return None
    vmap = getattr(node.op, "view_map", None)
    if not vmap:
        return None
    idx = var.index
    if idx in vmap:
        return node.inputs[vmap[idx][0]]
    return None


def droot(var):
    """Root of ``var``'s view chain: follow view_map edges up until a
    non-view variable.  destroy_map edges are NOT followed — a chain of
    destroyers over successive outputs is legal and ordered by data deps."""
    seen = set()
    while True:
        parent = _view_parent(var)
        if parent is None or id(parent) in seen:
            return var
        seen.add(id(var))
        var = parent


def _contains_cycle(fgraph, orderings) -> bool:
    """Kahn count over data deps + extra orderings (reference ``:34``)."""
    nodes = fgraph.apply_nodes
    indeg = {n: 0 for n in nodes}
    children: Dict = defaultdict(list)
    for node in nodes:
        deps = [inp.owner for inp in node.inputs if inp.owner is not None]
        deps.extend(d for d in orderings.get(node, ()) if d in nodes)
        for d in deps:
            if d in indeg:
                children[d].append(node)
                indeg[node] += 1
    stack = [n for n, k in indeg.items() if k == 0]
    visited = 0
    while stack:
        n = stack.pop()
        visited += 1
        for c in children[n]:
            indeg[c] -= 1
            if indeg[c] == 0:
                stack.append(c)
    return visited != len(nodes)


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
        # graph-mutation epoch: bumped on every import/prune/change_input so
        # the derived root/alias maps can be cached per graph state instead
        # of recomputed per destroyers() query (O(V^2) during inplace passes)
        self._epoch = 0
        self._cache_key = None
        self._cached_roots: Dict = {}
        self._cached_members: Dict = {}

    def clone(self):
        # a handler instance is bound to ONE fgraph (self.fgraph); cloning
        # an fgraph must give the clone its own handler, or re-attaching
        # this instance would rebind/reset the original's tracking
        return DestroyHandler(do_imports_on_attach=self.do_imports_on_attach)

    def on_attach(self, fgraph):
        if hasattr(fgraph, "destroyers"):
            raise AlreadyThere("DestroyHandler already attached")
        self.destroyers_map = {}
        self.fgraph = fgraph
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
        self.fgraph = None

    def on_import(self, fgraph, node, reason):
        self._epoch += 1
        if node.op.destroy_map:
            for out_idx, in_idxs in node.op.destroy_map.items():
                for i in in_idxs:
                    self.destroyers_map.setdefault(node.inputs[i], []).append(node)

    def on_prune(self, fgraph, node, reason):
        self._epoch += 1
        if node.op.destroy_map:
            for out_idx, in_idxs in node.op.destroy_map.items():
                for i in in_idxs:
                    lst = self.destroyers_map.get(node.inputs[i], [])
                    if node in lst:
                        lst.remove(node)

    def on_change_input(self, fgraph, node, i, old_var, new_var, reason=None):
        self._epoch += 1
        if node == "output" or not getattr(node, "op", None):
            return
        if node.op.destroy_map:
            for out_idx, in_idxs in node.op.destroy_map.items():
                if i in in_idxs:
                    lst = self.destroyers_map.get(old_var, [])
                    if node in lst:
                        lst.remove(node)
                    self.destroyers_map.setdefault(new_var, []).append(node)

    def _refresh_cache(self, fgraph):
        """Recompute the derived maps once per graph state (epoch-keyed)."""
        key = (id(fgraph), self._epoch)
        if self._cache_key == key:
            return
        roots: Dict = {}
        for var, nodes in self.destroyers_map.items():
            live = None
            for n in nodes:
                if n in fgraph.apply_nodes:
                    if live is None:
                        live = roots.setdefault(droot(var), [])
                    # one Apply destroying two inputs with a shared root must
                    # appear once per root (advisor r3: duplicate entries)
                    if n not in live:
                        live.append(n)
        members: Dict = defaultdict(set)
        for var in fgraph.variables:
            members[droot(var)].add(var)
        self._cached_roots = roots
        self._cached_members = members
        self._cache_key = key

    def _live_destroyed_roots(self, fgraph) -> dict:
        """{view-chain root: [live destroyer nodes]} over the current graph."""
        self._refresh_cache(fgraph)
        return self._cached_roots

    def _alias_members(self, fgraph) -> dict:
        """{root: set of all live variables whose view chain ends at root}."""
        self._refresh_cache(fgraph)
        return self._cached_members

    def destroyers(self, var) -> list:
        """Nodes that destroy ``var`` directly or through a view alias
        (view-aware, matching the reference's droot/impact semantics)."""
        fgraph = getattr(self, "fgraph", None)
        if fgraph is None:
            return list(self.destroyers_map.get(var, []))
        if not self.destroyers_map:
            return []
        roots = self._live_destroyed_roots(fgraph)
        if not roots:
            return []
        return list(roots.get(droot(var), []))

    def has_destroyers(self, vars) -> bool:
        return any(self.destroyers(v) for v in vars)

    def validate(self, fgraph):
        from aesara_tpu.graph.ir import Constant

        roots = self._live_destroyed_roots(fgraph)
        if not roots:
            return
        # 1. no view-chain root destroyed twice (a race regardless of which
        # view each destroyer went through)
        for root, nodes in roots.items():
            if len(set(nodes)) > 1:
                raise InconsistencyError(
                    f"multiple in-place destroyers of {root}: {sorted(set(map(str, nodes)))}"
                )
        # 2. constants are immutable storage
        for root in roots:
            if isinstance(root, Constant):
                raise InconsistencyError(
                    f"in-place op destroys constant {root} (through a view)"
                )
        members = self._alias_members(fgraph)
        # 3. input aliasing (reference ``destroyhandler.py:783-806``): a
        # destroyer whose OTHER inputs alias the destroyed root would read a
        # buffer it clobbers in-place.  Ops may opt out per index pair via
        # ``destroyhandler_tolerate_same`` (identical variable is fine) or
        # ``destroyhandler_tolerate_aliased`` (any view of the same root).
        for root, nodes in roots.items():
            impact = members[root] | {root}
            for app in set(nodes):
                for destroyed_idx in {
                    i for idxs in app.op.destroy_map.values() for i in idxs
                }:
                    dv = app.inputs[destroyed_idx]
                    if droot(dv) is not root:
                        continue
                    tolerate_same = getattr(
                        app.op, "destroyhandler_tolerate_same", []
                    )
                    tolerated = {
                        j for i0, j in tolerate_same if i0 == destroyed_idx
                    }
                    tolerated.add(destroyed_idx)
                    tolerate_aliased = getattr(
                        app.op, "destroyhandler_tolerate_aliased", []
                    )
                    ignored = {
                        j for i0, j in tolerate_aliased if i0 == destroyed_idx
                    }
                    for i, inp in enumerate(app.inputs):
                        if i in ignored:
                            continue
                        if inp in impact and (
                            i not in tolerated or inp is not dv
                        ):
                            raise InconsistencyError(
                                f"Input aliasing: {app} ({destroyed_idx}, {i})"
                            )
        # 4. protected variables (fgraph inputs w/o mutable flag, outputs):
        # destroying ANY alias of a protected variable destroys it
        protected = set()
        for feature in fgraph._features:
            protected |= set(getattr(feature, "protected", ()))
        if protected:
            for root in roots:
                hit = (members[root] | {root}) & protected
                if hit:
                    raise InconsistencyError(
                        f"in-place op destroys protected {next(iter(hit))}"
                    )
        # 5. ordering feasibility: readers-before-destroyer constraints must
        # not create a cycle with the data dependencies (usage loops)
        order = self._orderings_impl(fgraph, roots, members)
        if order and _contains_cycle(fgraph, order):
            raise InconsistencyError(
                "in-place ordering constraints create a dependency cycle"
            )

    def orderings(self, fgraph) -> dict:
        """All readers of any alias of a destroyed root must run before the
        destroyer (reference ordering semantics, view-aware)."""
        roots = self._live_destroyed_roots(fgraph)
        if not roots:
            return {}
        return self._orderings_impl(fgraph, roots, self._alias_members(fgraph))

    def _orderings_impl(self, fgraph, roots, members) -> dict:
        if not roots:
            return {}
        order: Dict = {}
        for root, destroyers in roots.items():
            for destroyer in set(destroyers):
                readers = []
                for alias in members[root] | {root}:
                    for client, _idx in fgraph.clients.get(alias, []):
                        if (
                            client != "output"
                            and client is not destroyer
                            and client in fgraph.apply_nodes
                            and client not in readers
                        ):
                            readers.append(client)
                if readers:
                    prev = order.setdefault(destroyer, [])
                    prev.extend(r for r in readers if r not in prev)
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
