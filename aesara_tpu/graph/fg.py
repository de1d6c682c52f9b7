"""``FunctionGraph``: the mutable subgraph that rewrites operate on.

Re-design of the reference's ``aesara/graph/fg.py:37``: maintains a
``clients`` index (variable → [(Apply, input-index)]), supports
transactional ``replace``/``change_node_input`` with Feature event
callbacks, toposort honoring Feature-provided extra orderings, and
``check_integrity`` for debugging.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Iterable, List, Optional, Sequence, Tuple, Union

from aesara_tpu.graph.ir import (
    Apply,
    AtomicVariable,
    Constant,
    Variable,
    applys_between,
    clone_get_equiv,
    graph_inputs,
    io_toposort,
    vars_between,
)
from aesara_tpu.graph.features import AlreadyThere, Feature, ReplaceValidate


__all__ = ["FunctionGraph", "MissingInputError"]


class MissingInputError(Exception):
    """A needed graph input is not among fgraph.inputs."""


OUTPUT = "output"  # client marker, matching the reference's convention


class FunctionGraph:
    """A subgraph with explicit inputs/outputs plus bookkeeping for rewriting."""

    def __init__(
        self,
        inputs: Optional[Sequence[Variable]] = None,
        outputs: Optional[Sequence[Variable]] = None,
        features: Optional[Sequence[Feature]] = None,
        clone: bool = True,
        update_mapping: Optional[dict] = None,
        memo: Optional[dict] = None,
        copy_inputs: bool = True,
        copy_orphans: Optional[bool] = None,
    ):
        if outputs is None:
            raise ValueError("outputs must be provided")
        if inputs is None:
            inputs = [
                i for i in graph_inputs(outputs) if not isinstance(i, Constant)
            ]
        inputs = list(inputs)
        outputs = list(outputs)
        if clone:
            if copy_orphans is None:
                copy_orphans = copy_inputs
            memo = clone_get_equiv(
                inputs, outputs, copy_inputs=copy_inputs, copy_orphans=copy_orphans,
                memo=memo,
            )
            inputs = [memo[i] for i in inputs]
            outputs = [memo[o] for o in outputs]

        self.inputs: List[Variable] = []
        self.outputs: List[Variable] = list(outputs)
        self.clients: dict = {}
        self.apply_nodes: set = set()
        self.variables: set = set()
        self._features: List[Feature] = []
        self.profile = None
        self.update_mapping = update_mapping
        self.execute_callbacks_time: float = 0.0
        self.execute_callbacks_times: dict = {}

        for inp in inputs:
            if inp.owner is not None:
                raise ValueError(f"input {inp} has an owner; not a graph input")
            self.add_input(inp, check=False)

        for output in self.outputs:
            self.import_var(output, reason="init")
        for i, output in enumerate(self.outputs):
            self.clients[output].append((OUTPUT, i))

        for feature in features or []:
            self.attach_feature(feature)

    # --- basic structure ---------------------------------------------------

    def add_input(self, var: Variable, check: bool = True) -> None:
        if check and var in self.inputs:
            return
        self.inputs.append(var)
        self.variables.add(var)
        self.clients.setdefault(var, [])

    def add_client(self, var: Variable, client: Tuple) -> None:
        self.clients.setdefault(var, []).append(client)

    def remove_client(self, var: Variable, client: Tuple, reason=None) -> None:
        """Remove a client edge; prune the producing node if orphaned."""
        removal_stack = [(var, client)]
        while removal_stack:
            v, c = removal_stack.pop()
            clients = self.clients.get(v, [])
            try:
                clients.remove(c)
            except ValueError:
                pass
            if not clients:
                owner = v.owner
                if owner is not None and owner in self.apply_nodes:
                    if not any(self.clients.get(o) for o in owner.outputs):
                        # node fully dead: prune it
                        self.apply_nodes.remove(owner)
                        for o in owner.outputs:
                            self.variables.discard(o)
                            self.clients.pop(o, None)
                        self.execute_callbacks("on_prune", owner, reason)
                        for i, inp in enumerate(owner.inputs):
                            removal_stack.append((inp, (owner, i)))
                elif owner is None and v not in self.inputs and v not in self.outputs:
                    self.variables.discard(v)
                    self.clients.pop(v, None)

    def import_var(self, var: Variable, reason=None, import_missing: bool = False) -> None:
        """Pull ``var`` (and its ancestors) into the graph."""
        if var.owner is not None and var.owner not in self.apply_nodes:
            self.import_node(var.owner, reason=reason, import_missing=import_missing)
        elif var.owner is None and not isinstance(var, AtomicVariable) and var not in self.inputs:
            if import_missing:
                self.add_input(var)
            else:
                raise MissingInputError(f"Undeclared input: {var}")
        self.variables.add(var)
        self.clients.setdefault(var, [])

    def import_node(self, apply_node: Apply, check: bool = True, reason=None,
                    import_missing: bool = False) -> None:
        """Recursively add an Apply node and its ancestors (ref ``fg.py:334``)."""
        node = apply_node
        if check:
            for var in graph_inputs(node.outputs, blockers=self.variables):
                if (
                    var.owner is None
                    and not isinstance(var, AtomicVariable)
                    and var not in self.inputs
                ):
                    if import_missing:
                        self.add_input(var)
                    else:
                        raise MissingInputError(
                            f"Input {var} of node {node} is not in the inputs "
                            f"of the FunctionGraph; trace: "
                            f"{getattr(var.tag, 'trace', None)}"
                        )
        # discover new ancestor nodes (DFS post-order, stopping at nodes
        # already in the graph / variables already tracked)
        new_nodes: List[Apply] = []
        visited: set = set()
        work = [(node, False)]
        while work:
            n, processed = work.pop()
            if processed:
                new_nodes.append(n)
                continue
            if id(n) in visited or n in self.apply_nodes:
                continue
            visited.add(id(n))
            work.append((n, True))
            for inp in reversed(n.inputs):
                if inp.owner is not None and inp not in self.variables:
                    if id(inp.owner) not in visited and inp.owner not in self.apply_nodes:
                        work.append((inp.owner, False))
        for n in new_nodes:
            if n in self.apply_nodes:
                continue
            self.apply_nodes.add(n)
            if not hasattr(n.tag, "imported_by"):
                n.tag.imported_by = []
            n.tag.imported_by.append(str(reason))
            for out in n.outputs:
                self.variables.add(out)
                self.clients.setdefault(out, [])
            for i, inp in enumerate(n.inputs):
                if inp not in self.variables:
                    if inp.owner is None and not isinstance(inp, AtomicVariable) and inp not in self.inputs:
                        if import_missing:
                            self.add_input(inp)
                        else:
                            raise MissingInputError(f"Undeclared input {inp}")
                    self.variables.add(inp)
                self.add_client(inp, (n, i))
            self.execute_callbacks("on_import", n, reason)

    # --- mutation ------------------------------------------------------------

    def change_node_input(
        self,
        node: Union[Apply, str],
        i: int,
        new_var: Variable,
        reason=None,
        import_missing: bool = False,
        check: bool = True,
    ) -> None:
        """Set ``node.inputs[i] = new_var`` (or outputs[i] for OUTPUT),
        updating clients and firing callbacks (ref ``fg.py:398``)."""
        if node == OUTPUT:
            old_var = self.outputs[i]
            if check and not old_var.type.is_super(new_var.type):
                raise TypeError(
                    f"Cannot change output {i} from {old_var.type} to {new_var.type}"
                )
            if old_var is new_var:
                return
            self.import_var(new_var, reason=reason, import_missing=import_missing)
            self.outputs[i] = new_var
            self.add_client(new_var, (OUTPUT, i))
            self.remove_client(old_var, (OUTPUT, i), reason=reason)
        else:
            old_var = node.inputs[i]
            if check and not old_var.type.is_super(new_var.type):
                raise TypeError(
                    f"Cannot change input {i} of {node} from {old_var.type} "
                    f"to {new_var.type}"
                )
            if old_var is new_var:
                return
            self.import_var(new_var, reason=reason, import_missing=import_missing)
            node.inputs[i] = new_var
            self.add_client(new_var, (node, i))
            self.remove_client(old_var, (node, i), reason=reason)
        self.execute_callbacks("on_change_input", node, i, old_var, new_var, reason=reason)

    def replace(
        self,
        var: Variable,
        new_var: Variable,
        reason=None,
        verbose: Optional[bool] = None,
        import_missing: bool = False,
    ) -> None:
        """Replace all uses of ``var`` by ``new_var`` (ref ``fg.py:464``)."""
        from aesara_tpu.config import config

        if verbose is None:
            verbose = config.optimizer_verbose
        if verbose:
            print(f"rewriting: {reason} replaces {var} of {var.owner} with "
                  f"{new_var} of {new_var.owner}")
        new_var = var.type.filter_variable(new_var, allow_convert=True)
        if var not in self.variables:
            return
        for client, idx in list(self.clients.get(var, [])):
            self.change_node_input(
                client, idx, new_var, reason=reason, import_missing=import_missing
            )

    def replace_all(self, pairs: Iterable[Tuple[Variable, Variable]], **kwargs) -> None:
        for var, new_var in pairs:
            self.replace(var, new_var, **kwargs)

    def remove_node(self, node: Apply, reason=None) -> None:
        """Forcibly remove a node (used rarely; replace() is the normal path)."""
        if node not in self.apply_nodes:
            return
        self.apply_nodes.remove(node)
        for out in node.outputs:
            self.variables.discard(out)
            self.clients.pop(out, None)
        self.execute_callbacks("on_prune", node, reason)
        for i, inp in enumerate(node.inputs):
            self.remove_client(inp, (node, i), reason=reason)

    def attach_feature(self, feature: Feature) -> None:
        """Attach a Feature plugin (ref ``fg.py:696``)."""
        if feature in self._features:
            return
        attach = getattr(feature, "on_attach", None)
        if attach is not None:
            try:
                attach(self)
            except AlreadyThere:
                return
        self._features.append(feature)

    def remove_feature(self, feature: Feature) -> None:
        try:
            self._features.remove(feature)
        except ValueError:
            return
        detach = getattr(feature, "on_detach", None)
        if detach is not None:
            detach(self)

    def execute_callbacks(self, name: str, *args, **kwargs):
        """Invoke hook ``name`` on every attached feature."""
        t0 = time.perf_counter()
        for feature in self._features:
            fn = getattr(feature, name, None)
            if fn is None:
                continue
            tf0 = time.perf_counter()
            fn(self, *args, **kwargs)
            self.execute_callbacks_times[feature] = (
                self.execute_callbacks_times.get(feature, 0.0)
                + time.perf_counter() - tf0
            )
        self.execute_callbacks_time += time.perf_counter() - t0

    # --- queries ---------------------------------------------------------------

    def get_clients(self, var: Variable) -> list:
        return self.clients.get(var, [])

    def toposort(self) -> List[Apply]:
        """Apply nodes in dependency order, honoring feature orderings
        (ref ``fg.py:766``)."""
        order = self.orderings()
        return io_toposort(self.inputs, self.outputs, orderings=order or None)

    def orderings(self) -> dict:
        """Merge extra-dependency dicts from all features (ref ``fg.py:782``)."""
        merged: dict = {}
        for feature in self._features:
            fn = getattr(feature, "orderings", None)
            if fn is None:
                continue
            extra = fn(self)
            for node, prereqs in extra.items():
                merged.setdefault(node, []).extend(prereqs)
        return merged

    def clone(self, check_integrity: bool = True) -> "FunctionGraph":
        return self.clone_get_equiv(check_integrity=check_integrity)[0]

    def clone_get_equiv(
        self, check_integrity: bool = True, attach_feature: bool = True
    ) -> Tuple["FunctionGraph", dict]:
        equiv = clone_get_equiv(self.inputs, self.outputs, copy_inputs=True, copy_orphans=True)
        if check_integrity:
            self.check_integrity()
        new_fg = FunctionGraph(
            [equiv[i] for i in self.inputs],
            [equiv[o] for o in self.outputs],
            clone=False,
            update_mapping=self.update_mapping,
        )
        if attach_feature:
            for feature in self._features:
                new_fg.attach_feature(feature.clone())
        return new_fg, equiv

    def check_integrity(self) -> None:
        """Assert clients index and node sets are consistent (ref ``fg.py:832``)."""
        nodes = set(applys_between(self.inputs, self.outputs))
        if self.apply_nodes != nodes:
            missing = nodes - self.apply_nodes
            excess = self.apply_nodes - nodes
            raise Exception(f"apply_nodes inconsistent: missing={missing} excess={excess}")
        expected_vars = set(vars_between(self.inputs, self.outputs)) | set(self.inputs)
        missing_vars = expected_vars - self.variables
        if missing_vars:
            # a proper-subset test misses this whenever stale EXTRA
            # variables are present (review finding)
            raise Exception(f"variables missing: {missing_vars}")
        for var, clients in self.clients.items():
            for client, idx in clients:
                if client == OUTPUT:
                    if self.outputs[idx] is not var:
                        raise Exception(f"output client wrong: {var} at {idx}")
                elif client.inputs[idx] is not var:
                    raise Exception(f"client index wrong for {var} in {client}")
        # reverse direction: every actual use must be present in the index
        for node in self.apply_nodes:
            for i, inp in enumerate(node.inputs):
                if (node, i) not in self.clients.get(inp, ()):
                    raise Exception(
                        f"use of {inp} by {node} at {i} missing from clients"
                    )
        for i, out in enumerate(self.outputs):
            if (OUTPUT, i) not in self.clients.get(out, ()):
                raise Exception(f"output {i} ({out}) missing from clients")

    def __str__(self):
        from aesara_tpu.graph.ir import as_string

        return f"FunctionGraph({', '.join(as_string(self.inputs, self.outputs))})"

    def __repr__(self):
        return str(self)

    def __contains__(self, item) -> bool:
        if isinstance(item, Variable):
            return item in self.variables
        if isinstance(item, Apply):
            return item in self.apply_nodes
        return False

    def __getstate__(self):
        d = self.__dict__.copy()
        for feature in self._features:
            for attr in getattr(feature, "pickle_rm_attr", []):
                d.pop(attr, None)
        return d

    def __setstate__(self, state):
        self.__dict__.update(state)
        for feature in self._features:
            if hasattr(feature, "unpickle"):
                feature.unpickle(self)
