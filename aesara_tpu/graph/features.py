"""Feature plugins: event hooks on FunctionGraph mutation.

Re-design of the reference's ``aesara/graph/features.py`` (Feature:256,
History:378, Validator:436, ReplaceValidate:497, NodeFinder:636,
NoOutputFromInplace:720).
"""

from __future__ import annotations

from collections import OrderedDict
from functools import partial
from typing import Optional


class AlreadyThere(Exception):
    """Raised by on_attach when an equivalent feature is already attached."""


class BadOptimization(Exception):
    """A rewrite produced an invalid graph."""


class Feature:
    """Hook interface; all methods optional (reference ``features.py:256``)."""

    def on_attach(self, fgraph) -> None:
        ...

    def on_detach(self, fgraph) -> None:
        ...

    def on_import(self, fgraph, node, reason) -> None:
        ...

    def on_change_input(self, fgraph, node, i, old_var, new_var, reason=None) -> None:
        ...

    def on_prune(self, fgraph, node, reason) -> None:
        ...

    def orderings(self, fgraph) -> dict:
        """Extra dependencies {node: {nodes that must run first}}."""
        return {}

    def clone(self) -> "Feature":
        return self


class Bookkeeper(Feature):
    """Replays import events for pre-existing nodes on attach."""

    def on_attach(self, fgraph):
        for node in fgraph.toposort():
            self.on_import(fgraph, node, "on_attach")

    def on_detach(self, fgraph):
        for node in fgraph.toposort():
            self.on_prune(fgraph, node, "Bookkeeper.detach")


class History(Feature):
    """Checkpoint/revert of fgraph mutations (reference ``features.py:378``)."""

    pickle_rm_attr = ["checkpoint", "revert"]

    def __init__(self):
        self.history: dict = {}

    def on_attach(self, fgraph):
        if hasattr(fgraph, "checkpoint") or hasattr(fgraph, "revert"):
            raise AlreadyThere("History feature already present")
        self.history[fgraph] = []
        fgraph.checkpoint = lambda: len(self.history[fgraph])
        fgraph.revert = partial(self.revert, fgraph)

    def on_detach(self, fgraph):
        del fgraph.checkpoint
        del fgraph.revert
        del self.history[fgraph]

    def on_change_input(self, fgraph, node, i, old_var, new_var, reason=None):
        if self.history[fgraph] is None:
            return
        self.history[fgraph].append(
            partial(fgraph.change_node_input, node, i, old_var,
                    reason="Revert", check=False)
        )

    def revert(self, fgraph, checkpoint: int):
        h = self.history[fgraph]
        self.history[fgraph] = None  # don't record the undos themselves
        while len(h) > checkpoint:
            h.pop()()
        self.history[fgraph] = h


class Validator(Feature):
    """Adds fgraph.validate()/consistent() (reference ``features.py:436``)."""

    pickle_rm_attr = ["validate", "consistent"]

    def on_attach(self, fgraph):
        if hasattr(fgraph, "validate"):
            raise AlreadyThere("Validator feature already present")
        fgraph.validate = partial(self.validate_, fgraph)
        fgraph.consistent = partial(self.consistent_, fgraph)

    def on_detach(self, fgraph):
        del fgraph.validate
        del fgraph.consistent

    def validate_(self, fgraph):
        return fgraph.execute_callbacks("validate")

    def consistent_(self, fgraph) -> bool:
        try:
            fgraph.validate()
            return True
        except Exception:
            return False


class ReplaceValidate(History, Validator):
    """Transactional replace: apply, validate, auto-revert on failure
    (reference ``features.py:497``)."""

    pickle_rm_attr = ["replace_validate", "replace_all_validate",
                      "replace_all_validate_remove"] + History.pickle_rm_attr + Validator.pickle_rm_attr

    def on_attach(self, fgraph):
        for attr in ("replace_validate", "replace_all_validate"):
            if hasattr(fgraph, attr):
                raise AlreadyThere("ReplaceValidate feature already present")
        History.on_attach(self, fgraph)
        Validator.on_attach(self, fgraph)
        fgraph.replace_validate = partial(self.replace_validate_, fgraph)
        fgraph.replace_all_validate = partial(self.replace_all_validate_, fgraph)
        fgraph.replace_all_validate_remove = partial(
            self.replace_all_validate_remove_, fgraph
        )

    def on_detach(self, fgraph):
        History.on_detach(self, fgraph)
        Validator.on_detach(self, fgraph)
        del fgraph.replace_validate
        del fgraph.replace_all_validate
        del fgraph.replace_all_validate_remove

    def replace_validate_(self, fgraph, var, new_var, reason=None, **kwargs):
        return self.replace_all_validate_(fgraph, [(var, new_var)], reason=reason, **kwargs)

    def replace_all_validate_(self, fgraph, replacements, reason=None, verbose=None, **kwargs):
        chk = fgraph.checkpoint()
        from aesara_tpu.config import config

        if verbose is None:
            verbose = config.optimizer_verbose
        for var, new_var in replacements:
            try:
                fgraph.replace(var, new_var, reason=reason, verbose=False, **kwargs)
            except Exception:
                fgraph.revert(chk)
                raise
        try:
            fgraph.validate()
        except Exception:
            fgraph.revert(chk)
            raise
        if verbose:
            print(f"rewriting: {reason} replaces {replacements}")
        return chk

    def replace_all_validate_remove_(
        self, fgraph, replacements, remove, reason=None, warn=True, **kwargs
    ):
        """Also assert the nodes in ``remove`` left the graph."""
        chk = self.replace_all_validate_(fgraph, replacements, reason=reason, **kwargs)
        for rm in remove:
            if rm in fgraph.apply_nodes or rm in fgraph.variables:
                fgraph.revert(chk)
                if warn:
                    import warnings

                    warnings.warn(f"rewrite {reason} failed to remove {rm}")
                raise BadOptimization(f"{rm} still in graph after {reason}")


class NodeFinder(Bookkeeper):
    """Index of Apply nodes by Op (reference ``features.py:636``)."""

    def __init__(self):
        self.fgraph = None
        self.d: dict = {}

    def on_attach(self, fgraph):
        if self.fgraph is not None:
            raise Exception("NodeFinder is already attached to an fgraph")
        if hasattr(fgraph, "get_nodes"):
            raise AlreadyThere("NodeFinder already present")
        self.fgraph = fgraph
        fgraph.get_nodes = partial(self.query, fgraph)
        Bookkeeper.on_attach(self, fgraph)

    def on_detach(self, fgraph):
        del fgraph.get_nodes
        Bookkeeper.on_detach(self, fgraph)
        self.fgraph = None
        self.d = {}

    def on_import(self, fgraph, node, reason):
        self.d.setdefault(node.op, []).append(node)

    def on_prune(self, fgraph, node, reason):
        nodes = self.d.get(node.op, [])
        if node in nodes:
            nodes.remove(node)

    def query(self, fgraph, op):
        return list(self.d.get(op, []))


class NoOutputFromInplace(Feature):
    """Validation: protected outputs must not be produced by ops that
    destroy inputs (reference ``features.py:720``)."""

    def __init__(self, protected_out_ids):
        self.protected_out_ids = tuple(protected_out_ids)

    def validate(self, fgraph):
        for i in self.protected_out_ids:
            out = fgraph.outputs[i]
            if out.owner is None:
                continue
            node = out.owner
            if node.op.destroy_map and out.index in node.op.destroy_map:
                raise BadOptimization(f"protected output {out} produced in-place")


class LambdaExtract:
    """Pickle-friendly callable used by History for reverts."""

    def __init__(self, fgraph, node, i, r, reason=None):
        self.fgraph = fgraph
        self.node = node
        self.i = i
        self.r = r
        self.reason = reason

    def __call__(self):
        return self.fgraph.change_node_input(
            self.node, self.i, self.r, reason=("Revert", self.reason), check=False
        )


class ReplacementDidNotRemoveError(Exception):
    """(reference name) a NodeFinder replacement left the node behind."""


class PrintListener(Feature):
    """Print every fgraph event (reference ``PrintListener``)."""

    def __init__(self, active: bool = True):
        self.active = active

    def on_attach(self, fgraph):
        if self.active:
            print(f"-- attaching to {fgraph}")

    def on_detach(self, fgraph):
        if self.active:
            print(f"-- detaching from {fgraph}")

    def on_import(self, fgraph, node, reason):
        if self.active:
            print(f"-- importing: {node}, reason: {reason}")

    def on_prune(self, fgraph, node, reason):
        if self.active:
            print(f"-- pruning: {node}, reason: {reason}")

    def on_change_input(self, fgraph, node, i, r, new_r, reason=None):
        if self.active:
            print(f"-- changing ({node}.inputs[{i}]) from {r} to {new_r}")


class PreserveVariableAttributes(Feature):
    """Copy name/test_value tags onto replacement variables (reference
    ``PreserveVariableAttributes``)."""

    def on_change_input(self, fgraph, node, i, r, new_r, reason=None):
        if getattr(r, "name", None) and not getattr(new_r, "name", None):
            new_r.name = r.name
        tv = getattr(getattr(r, "tag", None), "test_value", None)
        if tv is not None and not hasattr(new_r.tag, "test_value"):
            new_r.tag.test_value = tv
