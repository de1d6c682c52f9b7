"""Graph rewriters: whole-graph and node-local rewrites plus the drivers
that apply them (sequential, walking, fixed-point).

Re-design of the reference's ``aesara/graph/rewriting/basic.py``
(GraphRewriter:92, NodeRewriter:154, SequentialGraphRewriter:237,
node_rewriter:1105, SequentialNodeRewriter:1208, SubstitutionNodeRewriter
:1405, RemovalNodeRewriter:1455, PatternNodeRewriter:1488,
NodeProcessingGraphRewriter:1737, WalkingGraphRewriter:2002,
OpKeyGraphRewriter:2148, EquilibriumGraphRewriter:2232, MergeOptimizer:678,
copy_stack_trace:2931).
"""

from __future__ import annotations

import functools
import logging
import time
import traceback
import warnings
from collections import Counter, defaultdict, deque
from typing import Callable, Iterable, Optional, Sequence, Union

from aesara_tpu.config import config
from aesara_tpu.graph.features import BadOptimization, Feature
from aesara_tpu.graph.fg import FunctionGraph, OUTPUT
from aesara_tpu.graph.ir import Apply, AtomicVariable, Constant, Variable, io_toposort
from aesara_tpu.graph.op import Op


_logger = logging.getLogger("aesara_tpu.graph.rewriting")


__all__ = [
    "GraphRewriter",
    "NodeRewriter",
    "FromFunctionGraphRewriter",
    "FromFunctionNodeRewriter",
    "graph_rewriter",
    "node_rewriter",
    "SequentialGraphRewriter",
    "SequentialNodeRewriter",
    "SubstitutionNodeRewriter",
    "RemovalNodeRewriter",
    "PatternNodeRewriter",
    "NodeProcessingGraphRewriter",
    "WalkingGraphRewriter",
    "OpKeyGraphRewriter",
    "EquilibriumGraphRewriter",
    "MergeOptimizer",
    "MergeFeature",
    "in2out",
    "copy_stack_trace",
    "pre_constant_merge",
    "pre_greedy_node_rewriter",
]


class Rewriter:
    name: Optional[str] = None

    def add_requirements(self, fgraph: FunctionGraph) -> None:
        ...

    def print_summary(self, stream=None, level=0, depth=-1):
        import sys

        print(" " * level + f"{self.__class__.__name__} {self.name}", file=stream or sys.stdout)


class GraphRewriter(Rewriter):
    """Whole-graph rewriter (ref ``rewriting/basic.py:92``)."""

    def apply(self, fgraph: FunctionGraph):
        raise NotImplementedError

    def rewrite(self, fgraph: FunctionGraph, *args, **kwargs):
        self.add_requirements(fgraph)
        return self.apply(fgraph, *args, **kwargs)

    def __call__(self, fgraph: FunctionGraph):
        return self.rewrite(fgraph)

    @staticmethod
    def print_profile(stream, prof, level=0):
        pass


class NodeRewriter(Rewriter):
    """Node-local rewriter: ``transform`` returns False/None (no match), a
    list of replacement outputs, or a {old: new} dict (ref ``:154``)."""

    def tracks(self) -> Optional[Sequence]:
        """Op types/instances this rewriter can fire on, or None for all."""
        return None

    def transform(self, fgraph: FunctionGraph, node: Apply):
        raise NotImplementedError

    def add_requirements(self, fgraph: FunctionGraph) -> None:
        ...


class FromFunctionGraphRewriter(GraphRewriter):
    def __init__(self, fn, requirements=()):
        self.fn = fn
        self.requirements = requirements
        self.name = getattr(fn, "__name__", None)

    def apply(self, fgraph, *args, **kwargs):
        return self.fn(fgraph, *args, **kwargs)

    def add_requirements(self, fgraph):
        for req in self.requirements:
            req(fgraph)

    def __str__(self):
        return self.name or repr(self.fn)


def graph_rewriter(fn) -> FromFunctionGraphRewriter:
    """Decorator: function(fgraph) → GraphRewriter."""
    rval = FromFunctionGraphRewriter(fn)
    rval.__name__ = getattr(fn, "__name__", None)
    return rval


class FromFunctionNodeRewriter(NodeRewriter):
    def __init__(self, fn, tracks=None, requirements=(), inplace=False):
        self.fn = fn
        self._tracks = tracks
        self.requirements = requirements
        self.name = getattr(fn, "__name__", None)
        if inplace:
            def add_destroy_handler(fg):
                from aesara_tpu.graph.destroyhandler import DestroyHandler

                if not hasattr(fg, "destroyers"):
                    fg.attach_feature(DestroyHandler())

            self.requirements = tuple(requirements) + (add_destroy_handler,)

    def tracks(self):
        return self._tracks

    def transform(self, fgraph, node):
        if self._tracks is not None and not any(
            (isinstance(t, Op) and node.op == t)
            or (isinstance(t, type) and isinstance(node.op, t))
            for t in self._tracks
        ):
            return False
        return self.fn(fgraph, node)

    def add_requirements(self, fgraph):
        for req in self.requirements:
            req(fgraph)

    def __str__(self):
        return self.name or repr(self.fn)


def node_rewriter(tracks, inplace: bool = False, requirements=()):
    """Decorator declaring a node rewriter and the ops it tracks
    (ref ``:1105``).  ``tracks`` is a list of Op instances/classes or None."""

    if tracks is not None:
        if not isinstance(tracks, (list, tuple)):
            raise TypeError("tracks must be a list/tuple of ops or None")
        for t in tracks:
            if not (isinstance(t, Op) or (isinstance(t, type) and issubclass(t, Op))):
                raise TypeError(f"tracks element {t} is not an Op or Op subclass")

    def deco(fn):
        rval = FromFunctionNodeRewriter(fn, tracks, requirements, inplace=inplace)
        rval.__name__ = fn.__name__
        return rval

    return deco


class OpToRewriterTracker:
    """Index node rewriters by the ops they track (ref ``:1156``)."""

    def __init__(self):
        self.tracked_instances: dict = defaultdict(list)
        self.tracked_types: dict = defaultdict(list)
        self.untracked_rewrites: list = []

    def add_tracker(self, rw: NodeRewriter) -> None:
        tracks = rw.tracks()
        if tracks is None:
            self.untracked_rewrites.append(rw)
        else:
            for t in tracks:
                if isinstance(t, type):
                    self.tracked_types[t].append(rw)
                else:
                    self.tracked_instances[t].append(rw)

    def get_trackers(self, op: Op) -> list:
        return (
            [rw for cls, rws in self.tracked_types.items() if isinstance(op, cls) for rw in rws]
            + self.tracked_instances.get(op, [])
            + self.untracked_rewrites
        )

    def get_rewriters(self):
        for rws in self.tracked_instances.values():
            yield from rws
        for rws in self.tracked_types.values():
            yield from rws
        yield from self.untracked_rewrites


# ---------------------------------------------------------------------------
# stack-trace propagation (ref :2931)
# ---------------------------------------------------------------------------

def copy_stack_trace(from_var, to_var):
    """Propagate user creation tracebacks across a rewrite (ref ``:2931``)."""
    tr = []
    if isinstance(from_var, Iterable) and not isinstance(from_var, Variable):
        for v in from_var:
            tr += getattr(v.tag, "trace", [])
    else:
        tr = getattr(from_var.tag, "trace", [])
    if isinstance(to_var, Iterable) and not isinstance(to_var, Variable):
        for v in to_var:
            v.tag.trace = list(getattr(v.tag, "trace", [])) + tr
    else:
        to_var.tag.trace = list(getattr(to_var.tag, "trace", [])) + tr
    return to_var


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------

class SequentialGraphRewriter(GraphRewriter, list):
    """Apply a list of rewriters in order (ref ``:237``)."""

    def __init__(self, *rewrites, failure_callback=None):
        if len(rewrites) == 1 and isinstance(rewrites[0], (list, tuple)):
            rewrites = rewrites[0]
        super().__init__()
        self.extend(rewrites)
        self.failure_callback = failure_callback

    def apply(self, fgraph):
        sub_profs = []
        stage_profile = []
        for rewriter in self:
            stage_name = str(
                getattr(rewriter, "name", None) or type(rewriter).__name__
            )
            n_before = len(fgraph.apply_nodes)
            t0 = time.perf_counter()
            try:
                sub_profs.append(rewriter.rewrite(fgraph))
            except AssertionError:
                raise
            except Exception as e:
                if self.failure_callback:
                    self.failure_callback(e, self, rewriter)
                    sub_profs.append(None)
                elif config.on_opt_error == "raise":
                    raise
                elif config.on_opt_error == "warn":
                    warnings.warn(f"rewrite {rewriter} failed: {e}")
                    sub_profs.append(None)
                else:
                    sub_profs.append(None)
            finally:
                stage_profile.append(
                    (
                        stage_name,
                        time.perf_counter() - t0,
                        n_before,
                        len(fgraph.apply_nodes),
                    )
                )
        # per-pass compile profile consumed by ProfileStats (reference
        # rewriter_profile, compile/profiling.py:185+)
        fgraph._rewrite_stage_profile = (
            getattr(fgraph, "_rewrite_stage_profile", []) + stage_profile
        )
        return sub_profs

    def add_requirements(self, fgraph):
        for rewriter in self:
            rewriter.add_requirements(fgraph)

    def print_summary(self, stream=None, level=0, depth=-1):
        import sys

        stream = stream or sys.stdout
        print(" " * level + f"{type(self).__name__} {self.name}", file=stream)
        if depth != 0:
            for rw in self:
                rw.print_summary(stream, level + 2, depth - 1)

    def __str__(self):
        return f"SeqRewriter({list.__repr__(self)})"


class NodeProcessingGraphRewriter(GraphRewriter):
    """Base for drivers applying one NodeRewriter across a graph
    (ref ``:1737``): owns the transform→replace plumbing."""

    def __init__(
        self,
        node_rewriter: Optional[NodeRewriter],
        ignore_newtrees: bool = False,
        failure_callback: Optional[Callable] = None,
    ):
        self.node_rewriter = node_rewriter
        self.ignore_newtrees = ignore_newtrees
        self.failure_callback = failure_callback

    @classmethod
    def warn(cls, exc, nav, repl_pairs, node_rewriter, node):
        """Failure callback: log the error, re-raise AssertionError
        (reference ``rewriting/basic.py`` warn)."""
        _logger.error(f"Rewrite failure due to: {node_rewriter}")
        _logger.error(f"node: {node}")
        _logger.error("TRACEBACK:", exc_info=exc)
        if isinstance(exc, AssertionError):
            raise exc

    @classmethod
    def warn_inplace(cls, exc, nav, repl_pairs, node_rewriter, node):
        """Failure callback for inplace passes: an InconsistencyError just
        means the in-place conversion is illegal here (e.g. it would
        destroy a protected input through a view) — the replacement was
        already reverted, so skip quietly (reference ``warn_inplace``)."""
        from aesara_tpu.graph.destroyhandler import InconsistencyError

        if isinstance(exc, InconsistencyError):
            return
        cls.warn(exc, nav, repl_pairs, node_rewriter, node)

    @classmethod
    def warn_ignore(cls, exc, nav, repl_pairs, node_rewriter, node):
        """Failure callback: ignore every failure, AssertionError included
        (reference ``warn_ignore`` semantics)."""

    def attach_updater(self, fgraph, importer, pruner=None, chin=None, name=None):
        if self.ignore_newtrees:
            importer = None
        if importer is None and pruner is None and chin is None:
            return None

        class Updater(Feature):
            def on_import(self, fg, node, reason):
                if importer:
                    importer(node)

            def on_prune(self, fg, node, reason):
                if pruner:
                    pruner(node)

            def on_change_input(self, fg, node, i, old, new, reason=None):
                if chin:
                    chin(node, i, old, new, reason)

        u = Updater()
        fgraph.attach_feature(u)
        return u

    def detach_updater(self, fgraph, updater):
        if updater is not None:
            fgraph.remove_feature(updater)

    def process_node(self, fgraph, node, node_rewriter=None):
        """Run the rewriter on one node and commit its replacements.
        Returns True if the graph changed."""
        node_rewriter = node_rewriter or self.node_rewriter
        if node not in fgraph.apply_nodes:
            return False
        try:
            replacements = node_rewriter.transform(fgraph, node)
        except Exception as e:
            if self.failure_callback is not None:
                self.failure_callback(e, self, [(x, None) for x in node.outputs],
                                      node_rewriter, node)
                return False
            raise
        if replacements is False or replacements is None:
            return False
        old_vars = node.outputs
        remove = []
        if isinstance(replacements, dict):
            if "remove" in replacements:
                remove = replacements.pop("remove")
            old_vars = list(replacements)
            replacements = list(replacements.values())
        elif not isinstance(replacements, (tuple, list)):
            raise TypeError(
                f"node rewriter {node_rewriter} gave wrong type: {replacements}"
            )
        if len(old_vars) != len(replacements):
            raise ValueError(f"{node_rewriter} gave wrong number of replacements")
        repl_pairs = [
            (old, new) for old, new in zip(old_vars, replacements)
            if new is not old and new is not None
        ]
        if not repl_pairs:
            return False
        try:
            fgraph.replace_all_validate_remove(
                repl_pairs, reason=node_rewriter, remove=remove
            )
            return True
        except Exception as e:
            if isinstance(e, AssertionError) or self.failure_callback is None:
                raise
            self.failure_callback(e, self, repl_pairs, node_rewriter, node)
            return False

    def add_requirements(self, fgraph):
        from aesara_tpu.graph.features import ReplaceValidate

        if not hasattr(fgraph, "replace_all_validate_remove"):
            fgraph.attach_feature(ReplaceValidate())
        if self.node_rewriter is not None:
            self.node_rewriter.add_requirements(fgraph)


class WalkingGraphRewriter(NodeProcessingGraphRewriter):
    """One pass over the graph in topological order (ref ``:2002``)."""

    def __init__(self, node_rewriter, order: str = "in_to_out", ignore_newtrees=False,
                 failure_callback=None):
        if order not in ("out_to_in", "in_to_out"):
            raise ValueError(f"invalid order {order!r}")
        self.order = order
        super().__init__(node_rewriter, ignore_newtrees, failure_callback)

    def apply(self, fgraph, start_from=None):
        changed = 0
        t0 = time.perf_counter()
        q = deque(io_toposort(fgraph.inputs, start_from or fgraph.outputs))
        if self.order == "out_to_in":
            # reversed queue + popleft = consumers before producers;
            # (reversing AND popping from the far end double-negated the
            # direction — review finding: local_useless at
            # compile/mode.py ran in-to-out)
            q.reverse()

        importer = None
        if not self.ignore_newtrees:
            def importer(node):
                if node is not current_node[0]:
                    q.appendleft(node)

        current_node = [None]
        u = self.attach_updater(fgraph, importer, None, name=str(self))
        try:
            while q:
                node = q.popleft()
                if node not in fgraph.apply_nodes:
                    continue
                current_node[0] = node
                changed += bool(self.process_node(fgraph, node))
        finally:
            self.detach_updater(fgraph, u)
        return changed, time.perf_counter() - t0

    def __str__(self):
        return f"WalkingGraphRewriter({self.node_rewriter})"


def in2out(*node_rewriters, ignore_newtrees=False, failure_callback=None, name=None):
    """Helper: wrap node rewriters into a single in→out walking pass."""
    if len(node_rewriters) > 1:
        nrw = SequentialNodeRewriter(*node_rewriters)
    else:
        nrw = node_rewriters[0]
    rw = WalkingGraphRewriter(
        nrw, order="in_to_out", ignore_newtrees=ignore_newtrees,
        failure_callback=failure_callback,
    )
    rw.name = name
    return rw


class OpKeyGraphRewriter(NodeProcessingGraphRewriter):
    """Driver using a NodeFinder index to visit only tracked ops
    (ref ``:2148``)."""

    def __init__(self, node_rewriter, ignore_newtrees=False, failure_callback=None):
        if node_rewriter.tracks() is None:
            raise ValueError("OpKeyGraphRewriter requires a tracked rewriter")
        super().__init__(node_rewriter, ignore_newtrees, failure_callback)

    def add_requirements(self, fgraph):
        from aesara_tpu.graph.features import NodeFinder

        super().add_requirements(fgraph)
        if not hasattr(fgraph, "get_nodes"):
            fgraph.attach_feature(NodeFinder())

    def apply(self, fgraph):
        ops = self.node_rewriter.tracks()
        nodes = []
        for op in ops:
            if isinstance(op, Op):
                nodes.extend(fgraph.get_nodes(op))
            else:
                nodes.extend(n for n in fgraph.apply_nodes if isinstance(n.op, op))
        for node in nodes:
            self.process_node(fgraph, node)


class SequentialNodeRewriter(NodeRewriter):
    """Try member node rewriters in order on one node (ref ``:1208``)."""

    def __init__(self, *rewriters, apply_all_rewrites: bool = False, profile=False):
        self.rewriters = list(rewriters)
        self.apply_all_rewrites = apply_all_rewrites
        self.tracker = OpToRewriterTracker()
        for rw in self.rewriters:
            self.tracker.add_tracker(rw)

    def tracks(self):
        all_tracks = []
        for rw in self.rewriters:
            t = rw.tracks()
            if t is None:
                return None
            all_tracks.extend(t)
        return all_tracks

    def transform(self, fgraph, node):
        repl = None
        for rw in self.tracker.get_trackers(node.op):
            result = rw.transform(fgraph, node)
            if not result:
                continue
            if not self.apply_all_rewrites:
                return result
            repl = result
            if isinstance(result, (list, tuple)) and len(result) == len(node.outputs):
                # keep rewriting on the new producer when possible
                new_node = result[0].owner
                if new_node is None:
                    return result
                node = new_node
        return repl

    def add_requirements(self, fgraph):
        for rw in self.rewriters:
            rw.add_requirements(fgraph)

    def __str__(self):
        return f"SequentialNodeRewriter({self.rewriters})"


class SubstitutionNodeRewriter(NodeRewriter):
    """op1(...) → op2(...) with same inputs (ref ``:1405``)."""

    def __init__(self, op1, op2, transfer_tags: bool = True):
        self.op1 = op1
        self.op2 = op2
        self.transfer_tags = transfer_tags

    def tracks(self):
        return [self.op1]

    def transform(self, fgraph, node):
        if node.op != self.op1:
            return False
        repl = self.op2.make_node(*node.inputs)
        if self.transfer_tags:
            for old, new in zip(node.outputs, repl.outputs):
                new.name = old.name
                copy_stack_trace(old, new)
        return repl.outputs

    def __str__(self):
        return f"{self.op1} -> {self.op2}"


class RemovalNodeRewriter(NodeRewriter):
    """op(x) → x (ref ``:1455``)."""

    def __init__(self, op):
        self.op = op

    def tracks(self):
        return [self.op]

    def transform(self, fgraph, node):
        if node.op != self.op:
            return False
        return [node.inputs[0]]

    def __str__(self):
        return f"remove({self.op})"


class PatternNodeRewriter(NodeRewriter):
    """S-expression in/out pattern rewriting (ref ``:1488``).

    Patterns are nested tuples ``(op, arg-pattern...)``, strings as
    pattern variables, and Constants/literals matched by value, e.g.::

        PatternNodeRewriter((add, 'x', (mul, 'y', 'z')),
                            (add, 'x', (mul, 'z', 'y')))

    Optional ``constraints``: dict pattern-var → predicate(var).
    """

    def __init__(
        self,
        in_pattern,
        out_pattern,
        allow_multiple_clients: bool = False,
        name: Optional[str] = None,
        constraints: Optional[dict] = None,
        get_nodes: Optional[Callable] = None,
        values_eq_approx=None,
        tracks=(),
    ):
        self.in_pattern = in_pattern
        self.out_pattern = out_pattern
        self.allow_multiple_clients = allow_multiple_clients
        self.name = name or str(self)
        self.constraints = constraints or {}
        self.get_nodes = get_nodes
        self.values_eq_approx = values_eq_approx
        self._tracks = tracks
        if not tracks and isinstance(in_pattern, (list, tuple)):
            op = in_pattern[0]
            if isinstance(op, Op) or (isinstance(op, type) and issubclass(op, Op)):
                self._tracks = [op]

    def tracks(self):
        return list(self._tracks) if self._tracks else None

    def transform(self, fgraph, node, get_nodes: bool = True):
        if get_nodes and self.get_nodes is not None:
            for real_node in self.get_nodes(fgraph, node):
                ret = self.transform(fgraph, real_node, get_nodes=False)
                if ret is not False and ret is not None:
                    return dict(zip(real_node.outputs, ret))
            return False
        if len(node.outputs) != 1:
            return False

        match = self._match(node.outputs[0], self.in_pattern, {}, fgraph, top=True)
        if match is None:
            return False
        ret = self._build(self.out_pattern, match, node)
        out = node.outputs[0]
        if ret.type != out.type:
            conv = out.type.convert_variable(ret)
            if conv is None:
                return False
            ret = conv
        if self.values_eq_approx:
            ret.tag.values_eq_approx = self.values_eq_approx
        copy_stack_trace(out, ret)
        return [ret]

    def _match(self, var, pattern, subst, fgraph, top=False):
        if isinstance(pattern, (list, tuple)):
            op = pattern[0]
            if var.owner is None:
                return None
            if not (
                (isinstance(op, Op) and var.owner.op == op)
                or (isinstance(op, type) and isinstance(var.owner.op, op))
            ):
                return None
            if len(var.owner.inputs) != len(pattern) - 1:
                return None
            if not top and not self.allow_multiple_clients:
                if len(fgraph.get_clients(var)) > 1:
                    return None
            for inp, sub_pat in zip(var.owner.inputs, pattern[1:]):
                subst = self._match(inp, sub_pat, subst, fgraph)
                if subst is None:
                    return None
            return subst
        elif isinstance(pattern, str):
            constraint = self.constraints.get(pattern)
            if constraint is not None and not constraint(var):
                return None
            if pattern in subst:
                return subst if subst[pattern] is var else None
            subst = dict(subst)
            subst[pattern] = var
            return subst
        elif isinstance(pattern, dict):
            # {"pattern": ..., "constraint": fn}
            sub_pat = pattern["pattern"]
            constraint = pattern.get("constraint")
            if constraint is not None and not constraint(var):
                return None
            return self._match(var, sub_pat, subst, fgraph)
        elif isinstance(pattern, Constant):
            if (
                isinstance(var, Constant)
                and pattern.type.is_super(var.type)
                and pattern.type.values_eq(pattern.data, var.data)
            ):
                return subst
            return None
        else:
            # literal number: match constant by value
            import numpy as np

            if isinstance(var, Constant):
                try:
                    if np.all(np.asarray(var.data) == pattern):
                        return subst
                except Exception:
                    pass
            return None

    def _build(self, pattern, subst, node):
        if isinstance(pattern, (list, tuple)):
            args = [self._build(p, subst, node) for p in pattern[1:]]
            return pattern[0](*args)
        elif isinstance(pattern, str):
            return subst[pattern]
        elif isinstance(pattern, Variable):
            return pattern
        else:
            import numpy as np

            from aesara_tpu.tensor.basic import constant

            return constant(pattern)

    def __str__(self):
        def fmt(p):
            if isinstance(p, (list, tuple)):
                return f"({fmt(p[0])} {' '.join(fmt(x) for x in p[1:])})"
            return str(p)

        return f"{fmt(self.in_pattern)} -> {fmt(self.out_pattern)}"


class EquilibriumGraphRewriter(NodeProcessingGraphRewriter):
    """Apply global + node rewriters repeatedly until fixed point
    (ref ``:2232``), with a max-use-ratio guard against ping-pong loops."""

    def __init__(
        self,
        rewriters: Sequence[Rewriter],
        failure_callback=None,
        ignore_newtrees: bool = True,
        tracks_on_change_inputs: bool = False,
        max_use_ratio: float = 10.0,
        final_rewriters=None,
        cleanup_rewriters=None,
    ):
        super().__init__(None, ignore_newtrees, failure_callback)
        self.global_rewriters = [r for r in rewriters if isinstance(r, GraphRewriter)]
        self.node_tracker = OpToRewriterTracker()
        for r in rewriters:
            if not isinstance(r, GraphRewriter):
                self.node_tracker.add_tracker(r)
        self.max_use_ratio = max_use_ratio
        self.tracks_on_change_inputs = tracks_on_change_inputs
        self.final_rewriters = list(final_rewriters or [])
        self.cleanup_rewriters = list(cleanup_rewriters or [])

    def get_node_rewriters(self):
        yield from self.node_tracker.get_rewriters()

    def add_requirements(self, fgraph):
        super().add_requirements(fgraph)
        for rw in self.global_rewriters + self.final_rewriters + self.cleanup_rewriters:
            rw.add_requirements(fgraph)
        for rw in self.get_node_rewriters():
            rw.add_requirements(fgraph)

    def apply(self, fgraph, start_from=None):
        max_use = max(
            1, int(self.max_use_ratio * (len(fgraph.apply_nodes) + 10))
        )
        process_count: Counter = Counter()
        rewriter_time: Counter = Counter()
        changed = True
        iters = 0
        while changed and iters < 100:
            iters += 1
            changed = False

            for grw in self.global_rewriters:
                try:
                    before_nodes = set(fgraph.apply_nodes)
                    grw.apply(fgraph)
                    if set(fgraph.apply_nodes) != before_nodes:
                        # a structural change by a global rewriter must
                        # keep the equilibrium iterating (review finding:
                        # it could exit before the fixed point)
                        changed = True
                except Exception as e:
                    if self.failure_callback is not None:
                        self.failure_callback(e, self, [], grw, None)
                    else:
                        raise

            q = deque(io_toposort(fgraph.inputs, start_from or fgraph.outputs))
            current_node = [None]

            def importer(new_node):
                if new_node is not current_node[0]:
                    q.append(new_node)

            def chin(node, i, old, new, reason):
                if node is not OUTPUT and node is not current_node[0]:
                    q.append(node)

            u = self.attach_updater(
                fgraph, importer, None,
                chin=chin if self.tracks_on_change_inputs else None,
            )
            try:
                while q:
                    node = q.pop()
                    if node not in fgraph.apply_nodes:
                        continue
                    current_node[0] = node
                    for rw in self.node_tracker.get_trackers(node.op):
                        if process_count[rw] > max_use:
                            continue
                        t_rw = time.perf_counter()
                        node_changed = self.process_node(fgraph, node, rw)
                        rewriter_time[rw] += time.perf_counter() - t_rw
                        if node_changed:
                            process_count[rw] += 1
                            changed = True
                            if process_count[rw] == max_use:
                                warnings.warn(
                                    f"EquilibriumGraphRewriter: max-use ratio "
                                    f"exceeded for {rw}"
                                )
                            break  # node replaced; move on
            finally:
                self.detach_updater(fgraph, u)

        for frw in self.final_rewriters:
            frw.apply(fgraph)
        for crw in self.cleanup_rewriters:
            crw.apply(fgraph)

        def _rw_name(rw):
            return str(getattr(rw, "name", None) or getattr(rw, "__name__", rw))

        # per-equilibrium-stage detail for the compile profile
        detail = {
            "passes": iters,
            "applications": {
                _rw_name(rw): n for rw, n in process_count.items() if n
            },
            "rewriter_time": {
                _rw_name(rw): t
                for rw, t in sorted(
                    rewriter_time.items(), key=lambda kv: -kv[1]
                )[:20]
            },
        }
        profs = getattr(fgraph, "_rewrite_equilibrium_profile", {})
        profs[str(getattr(self, "name", None) or "equilibrium")] = detail
        fgraph._rewrite_equilibrium_profile = profs
        return iters

    def __str__(self):
        return f"EquilibriumGraphRewriter({list(self.get_node_rewriters())})"


# ---------------------------------------------------------------------------
# Merge / CSE (ref :517-900)
# ---------------------------------------------------------------------------

class MergeFeature(Feature):
    """Incremental hash-consing index of nodes by (op, input ids)
    (ref ``:517``).  Keeps a queue of merge candidates."""

    def on_attach(self, fgraph):
        if hasattr(fgraph, "merge_feature"):
            from aesara_tpu.graph.features import AlreadyThere

            raise AlreadyThere("MergeFeature already attached")
        fgraph.merge_feature = self
        self.seen_constants: set = set()
        self.const_sig_inv: dict = {}
        self.nodes_seen: dict = {}
        self.scheduled: list = []
        for node in fgraph.toposort():
            self.on_import(fgraph, node, "on_attach")

    def on_detach(self, fgraph):
        del fgraph.merge_feature

    def on_change_input(self, fgraph, node, i, old, new, reason=None):
        if node is OUTPUT or node == OUTPUT:
            return
        if isinstance(new, Constant):
            self.process_constant(fgraph, new)
        self.process_node(fgraph, node)

    def on_import(self, fgraph, node, reason):
        for c in node.inputs:
            if isinstance(c, Constant):
                self.process_constant(fgraph, c)
        self.process_node(fgraph, node)

    def on_prune(self, fgraph, node, reason):
        self.nodes_seen.pop(id(node), None)

    def process_constant(self, fgraph, c):
        if id(c) in self.seen_constants:
            return
        sig = c.merge_signature()
        other = self.const_sig_inv.get(sig)
        if other is not None and other is not c:
            self.scheduled.append([[(c, other)]])
        else:
            self.const_sig_inv[sig] = c
        self.seen_constants.add(id(c))

    def process_node(self, fgraph, node):
        key = (node.op, tuple(map(id, node.inputs)))
        self.nodes_seen[id(node)] = key

    def candidates(self, fgraph):
        """Group fgraph nodes into mergeable sets (same op, same inputs)."""
        by_key: dict = defaultdict(list)
        for node in fgraph.apply_nodes:
            if node.op.destroy_map:
                continue  # never merge destructive ops
            by_key[(node.op, tuple(map(id, node.inputs)))].append(node)
        return [nodes for nodes in by_key.values() if len(nodes) > 1]


class MergeOptimizer(GraphRewriter):
    """CSE: merge identical constants and identical Apply nodes
    (ref ``:678``)."""

    def add_requirements(self, fgraph):
        from aesara_tpu.graph.features import ReplaceValidate

        if not hasattr(fgraph, "replace_all_validate"):
            fgraph.attach_feature(ReplaceValidate())

    def apply(self, fgraph):
        n_merged = 0
        # 0. incremental fast path: constants the attached MergeFeature
        # queued since the last pass (review finding: the queue was
        # produced but never consumed)
        feature = getattr(fgraph, "merge_feature", None)
        if feature is not None and feature.scheduled:
            for group in feature.scheduled:
                for pairs in group:
                    for c, other in pairs:
                        if c in fgraph.variables and other in fgraph.variables:
                            try:
                                fgraph.replace_all_validate(
                                    [(c, other)], reason="MergeOptimizer"
                                )
                                n_merged += 1
                            except Exception:
                                pass
            feature.scheduled.clear()
        # 1. constants
        sig_map: dict = {}
        for var in list(fgraph.variables):
            if isinstance(var, Constant):
                try:
                    sig = var.merge_signature()
                except NotImplementedError:
                    continue
                first = sig_map.get(sig)
                if first is None:
                    sig_map[sig] = var
                elif first is not var:
                    fgraph.replace_all_validate([(var, first)], reason="MergeOptimizer")
                    n_merged += 1
        # 2. apply nodes, to fixed point (merging one level enables the next)
        changed = True
        while changed:
            changed = False
            by_key: dict = {}
            for node in fgraph.toposort():
                if node.op.destroy_map:
                    continue
                key = (node.op, tuple(map(id, node.inputs)))
                first = by_key.get(key)
                if first is None:
                    by_key[key] = node
                else:
                    pairs = list(zip(node.outputs, first.outputs))
                    try:
                        fgraph.replace_all_validate(pairs, reason="MergeOptimizer")
                        for old, new in pairs:
                            copy_stack_trace(old, new)
                        n_merged += 1
                        changed = True
                    except Exception:
                        pass
        return n_merged

    def __str__(self):
        return "MergeOptimizer"


def pre_constant_merge(fgraph, variables):
    """Merge Constants in a standalone (not-yet-fgraph) graph (ref ``:879``)."""
    seen: dict = {}

    def process(var):
        if isinstance(var, Constant):
            try:
                sig = var.merge_signature()
            except NotImplementedError:
                return var
            return seen.setdefault(sig, var)
        return var

    from aesara_tpu.graph.ir import io_toposort, graph_inputs

    for node in io_toposort(graph_inputs(variables), variables):
        for i, inp in enumerate(node.inputs):
            merged = process(inp)
            if merged is not inp:
                node.inputs[i] = merged
    return variables


def pre_greedy_node_rewriter(fgraph, rewrites, out):
    """Apply node rewrites greedily to a graph not yet in ``fgraph``
    (used when rewrites build sub-graphs; ref ``:2882``)."""

    def local_recursive(out, memo):
        if out in memo:
            return memo[out]
        orig_node = out.owner
        if orig_node is None:
            memo[out] = out
            return out
        node = orig_node
        new_inputs = [local_recursive(i, memo) for i in node.inputs]
        if any(n is not o for n, o in zip(new_inputs, node.inputs)):
            node = node.clone_with_new_inputs(new_inputs, strict=False)
        results = node.outputs
        for rw in rewrites:
            ret = rw.transform(fgraph, node)
            if ret is not False and ret is not None:
                if isinstance(ret, dict):
                    ret = [ret.get(o, o) for o in node.outputs]
                results = ret
                break
        for old, new in zip(orig_node.outputs, results):
            memo[old] = new
        return memo[out]

    return local_recursive(out, {})


class MetaNodeRewriter(NodeRewriter):
    """Try several candidate rewriters, time each result on test values,
    keep the fastest (reference ``rewriting/basic.py:945``)."""

    def __init__(self, verbose=False):
        self.verbose = verbose
        self.track_dict = defaultdict(list)
        self.tag_dict = defaultdict(list)

    def register(self, rewriter, tag_list=()):
        for t in rewriter.tracks() or []:
            self.track_dict[t].append(rewriter)
        for tag in tag_list:
            self.tag_dict[tag].append(rewriter)

    def tracks(self):
        return list(self.track_dict) or None

    def transform(self, fgraph, node):
        import time as _time

        from aesara_tpu.graph.op import get_test_values

        candidates = list(self.track_dict.get(node.op, []))
        for cls, rws in self.track_dict.items():
            if not isinstance(cls, type):
                continue
            if isinstance(node.op, cls):
                candidates.extend(rws)
        if not candidates:
            return False
        # time each candidate on the node's test values when available
        inputs_vals = []
        for i in node.inputs:
            try:
                from aesara_tpu.graph.op import get_test_value

                inputs_vals.append(get_test_value(i))
            except Exception:
                inputs_vals = None
                break
        best, best_time = None, None
        for rw in candidates:
            res = rw.transform(fgraph, node)
            if not res:
                continue
            if inputs_vals is None:
                return res  # no way to time: first hit wins
            # benchmark the replacement by compiling it standalone
            try:
                from aesara_tpu.compile.function import function
                from aesara_tpu.graph.ir import graph_inputs

                outs = list(res.values()) if isinstance(res, dict) else list(res)
                ins = [v for v in graph_inputs(outs) if v.owner is None
                       and not isinstance(v, Constant)]
                f = function(ins, outs, on_unused_input="ignore", mode="PY")
                vals = [get_test_value(v) for v in ins]
                t0 = _time.perf_counter()
                f(*vals)
                dt = _time.perf_counter() - t0
            except Exception:
                dt = float("inf")
            if best is None or dt < best_time:
                best, best_time = res, dt
        return best if best is not None else False


def check_stack_trace(f_or_fgraph, ops_to_check="last", bug_print="raise"):
    """Assert that rewritten nodes carry creation stack traces — the
    testing aid guarding ``copy_stack_trace`` discipline (reference
    ``rewriting/basic.py:2979``).  Returns True/False (or raises when
    ``bug_print='raise'``)."""
    fgraph = getattr(getattr(f_or_fgraph, "maker", None), "fgraph", f_or_fgraph)
    order = fgraph.toposort()
    if not order:
        return True
    if ops_to_check == "last":
        nodes = [n for n in order if any(
            o in fgraph.outputs for o in n.outputs)]
    elif ops_to_check == "all":
        nodes = order
    elif isinstance(ops_to_check, (tuple, list)):
        classes = tuple(o for o in ops_to_check if isinstance(o, type))
        instances = [o for o in ops_to_check if not isinstance(o, type)]
        nodes = [n for n in order
                 if (classes and isinstance(n.op, classes))
                 or n.op in instances]
    elif callable(ops_to_check):
        nodes = [n for n in order if ops_to_check(n)]
    else:
        raise ValueError(f"unknown ops_to_check: {ops_to_check}")
    bad = [n for n in nodes
           if not any(getattr(o.tag, "trace", None) for o in n.outputs)]
    if bad and bug_print == "raise":
        raise AssertionError(f"nodes missing stack traces: {bad}")
    return not bad


# --- reference long-tail names -------------------------------------------

walking_rewriter = in2out  # reference factory alias (WalkingGraphRewriter)


class MetaNodeRewriterSkip(AssertionError):
    """A MetaNodeRewriter candidate asked to be skipped (reference)."""


def check_chain(r, *chain):
    """Does variable ``r``'s producer chain match the given op sequence?
    The chain is outermost-first, descending through ``inputs[0]``
    BETWEEN elements only (never past the last match); a ``None``
    element asserts the variable has no owner (reference
    ``check_chain`` / ``_check_chain`` semantics)."""
    if isinstance(r, Apply):
        r = r.outputs[0]
    remaining = list(chain)
    while remaining:
        op = remaining.pop(0)
        node = getattr(r, "owner", None)
        if op is None:
            if node is not None:
                return False
        else:
            if node is None:
                return False
            this_op = node.op
            matches = this_op == op or (
                isinstance(op, type) and isinstance(this_op, op)
            )
            if not matches:
                return False
        if remaining:
            if node is None or not node.inputs:
                return False
            r = node.inputs[0]
    return r is not None


def merge_dict(d1: dict, d2: dict) -> dict:
    out = dict(d1)
    out.update(d2)
    return out


class ChangeTracker(Feature):
    """Feature flagging whether any change happened (reference
    ``ChangeTracker``)."""

    def __init__(self):
        self.changed = False
        self.nb_imported = 0

    def on_import(self, fgraph, node, reason):
        self.changed = True
        self.nb_imported += 1

    def on_change_input(self, fgraph, node, i, r, new_r, reason=None):
        self.changed = True

    def reset(self):
        self.changed = False


class DispatchingFeature(Feature):
    """Feature routing events to user callbacks (reference name)."""

    def __init__(self, attach=None, prune=None, import_=None, change=None):
        self._attach = attach
        self._prune = prune
        self._import = import_
        self._change = change

    def on_attach(self, fgraph):
        if self._attach:
            self._attach(fgraph)

    def on_prune(self, fgraph, node, reason):
        if self._prune:
            self._prune(fgraph, node, reason)

    def on_import(self, fgraph, node, reason):
        if self._import:
            self._import(fgraph, node, reason)

    def on_change_input(self, fgraph, node, i, r, new_r, reason=None):
        if self._change:
            self._change(fgraph, node, i, r, new_r, reason)


class CheckStackTraceFeature(Feature):
    """Record rewrites that drop stack traces (reference)."""

    def on_import(self, fgraph, node, reason):
        if not hasattr(fgraph, "_check_stacktrace_nodes"):
            fgraph._check_stacktrace_nodes = []
        fgraph._check_stacktrace_nodes.append((node, reason))


class CheckStackTraceRewriter(GraphRewriter):
    """Pass verifying stack-trace discipline (reference)."""

    def apply(self, fgraph):
        return check_stack_trace(fgraph, ops_to_check="all",
                                 bug_print="ignore")


def inplace_graph_rewriter(fn):
    """Decorator for rewrites that require a DestroyHandler (reference
    factory name)."""
    rval = FromFunctionGraphRewriter(fn)

    def add_dh(fgraph):
        from aesara_tpu.graph.destroyhandler import DestroyHandler

        if not hasattr(fgraph, "destroyers"):
            fgraph.attach_feature(DestroyHandler())

    rval.requirements = (add_dh,)
    return rval
