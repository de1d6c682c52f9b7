"""DebugMode: the self-checking meta-backend.

Re-design of the reference's ``aesara/compile/debugmode.py:2148``
(2,300 LoC): where the reference re-runs every node with both ``perform``
and ``c_code`` and compares (``BadThunkOutput``), the TPU analogue runs
every node with both the NumPy oracle (``perform``) and its XLA lowering
(eagerly, unjitted) and compares with ``values_eq_approx`` —
the per-node py-vs-device differential runner of SURVEY §5.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from aesara_tpu.compile.mode import Mode, OPT_FAST_COMPILE, OPT_NONE
from aesara_tpu.config import config
from aesara_tpu.link.basic import (
    Container,
    Linker,
    LocalLinker,
    map_storage,
    raise_with_op,
)


__all__ = ["DebugMode", "DebugModeError", "BadThunkOutput", "InvalidValueError",
           "DebugLinker", "DualLinker", "CompareMode", "BadJitProgramOutput",
           "RewriteCulpritReport", "find_bad_optimizations", "find_bad_rewrite"]


class DebugModeError(Exception):
    pass


class BadThunkOutput(DebugModeError):
    """py (`perform`) and XLA lowering disagree on a node's output
    (reference ``debugmode.py`` BadThunkOutput)."""

    def __init__(self, node, output_idx, py_val, jax_val):
        self.node = node
        self.output_idx = output_idx
        self.py_val = py_val
        self.jax_val = jax_val
        super().__init__(
            f"BadThunkOutput: node {node} output {output_idx}: NumPy oracle "
            f"and XLA lowering disagree.\n  py : {_brief(py_val)}\n"
            f"  xla: {_brief(jax_val)}"
        )


class InvalidValueError(DebugModeError):
    """A node produced a value its output Type rejects."""


def _brief(v):
    a = np.asarray(v)
    return f"shape={a.shape} dtype={a.dtype} values={np.array2string(a, threshold=8)}"


class DebugLinker(LocalLinker):
    """Runs each node through perform AND the jax lowering, validates
    output types, compares results.  With ``check_aliasing`` it also
    validates each op's view_map/destroy_map claims at runtime
    (reference ``_check_viewmap``/BadDestroyMap, debugmode.py:151,233)
    and with ``check_preallocated`` re-runs each thunk against poisoned
    output storage (reference ``_get_preallocated_maps:738``) — the
    donation-safety net of SURVEY §7(c)."""

    def __init__(self, check_finite: bool = False,
                 check_aliasing: bool = True,
                 check_preallocated: bool = True):
        super().__init__(allow_gc=False)
        self.check_finite = check_finite
        self.check_aliasing = check_aliasing
        self.check_preallocated = check_preallocated

    def make_all(self, input_storage=None, output_storage=None, storage_map=None):
        from aesara_tpu.link.jax.dispatch import jax_funcify

        fgraph = self.fgraph
        order = fgraph.toposort()
        input_storage, output_storage, storage_map = map_storage(
            fgraph, order, input_storage, output_storage, storage_map
        )
        compute_map = {v: [False] for v in storage_map}

        thunks = []
        for node in order:
            py_thunk = node.op.make_py_thunk(node, storage_map, compute_map, [])
            try:
                jax_fn = jax_funcify(node.op, node=node)
            except NotImplementedError:
                jax_fn = None
            thunks.append((node, py_thunk, jax_fn))

        input_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.inputs, input_storage)
        ]
        output_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.outputs, output_storage)
        ]

        check_finite = self.check_finite
        check_aliasing = self.check_aliasing
        check_preallocated = self.check_preallocated

        def _snapshot(v):
            return np.array(v, copy=True) if isinstance(v, np.ndarray) else None

        def _same(a, snap):
            if not isinstance(a, np.ndarray) or a.shape != snap.shape:
                return False
            try:
                return np.array_equal(a, snap, equal_nan=True)
            except TypeError:  # non-float dtypes reject equal_nan
                return np.array_equal(a, snap)

        def _check_alias_and_destroy(node):
            vm = getattr(node.op, "view_map", {}) or {}
            dm = getattr(node.op, "destroy_map", {}) or {}
            destroyed = {j for idxs in dm.values() for j in idxs}
            # (a) undeclared writes to inputs
            for j, inp in enumerate(node.inputs):
                snap = node._dbg_snapshots[j]
                if snap is None or j in destroyed:
                    continue
                cur = storage_map[inp][0]
                if not _same(cur, snap):
                    raise BadDestroyMap(
                        f"node {node} modified input {j} ({inp}) without "
                        f"declaring it in destroy_map={dm}"
                    )
            # (b) undeclared output<->input aliasing
            for i, out in enumerate(node.outputs):
                oval = storage_map[out][0]
                if not isinstance(oval, np.ndarray) or oval.size == 0:
                    continue
                allowed = set(vm.get(i, [])) | set(dm.get(i, []))
                for j, inp in enumerate(node.inputs):
                    ival = storage_map[inp][0]
                    if (
                        isinstance(ival, np.ndarray)
                        and ival.size
                        and j not in allowed
                        and np.may_share_memory(oval, ival)
                    ):
                        raise BadViewMap(
                            f"node {node} output {i} aliases input {j} "
                            f"({inp}) but view_map={vm} destroy_map={dm} "
                            "don't declare it"
                        )
                # (c) output-output aliasing is never legal
                for k in range(i + 1, len(node.outputs)):
                    other = storage_map[node.outputs[k]][0]
                    if (
                        isinstance(other, np.ndarray)
                        and other.size
                        and np.may_share_memory(oval, other)
                    ):
                        raise BadViewMap(
                            f"node {node}: outputs {i} and {k} alias each "
                            "other"
                        )

        def _poison_like(a):
            if a.dtype.kind == "f":
                return np.full_like(a, np.nan)
            if a.dtype.kind in "iu":
                return np.full_like(a, 1234567)
            if a.dtype.kind == "b":
                return np.ones_like(a)
            return None

        def _check_preallocated(node, py_thunk):
            """Re-run with inputs restored and outputs poisoned: an op
            that reads or accumulates into its output storage diverges."""
            saved = [
                _snapshot(storage_map[o][0]) for o in node.outputs
            ]
            if any(s is None for s in saved):
                return
            for j, inp in enumerate(node.inputs):
                snap = node._dbg_snapshots[j]
                if snap is not None:
                    storage_map[inp][0] = np.array(snap, copy=True)
            poisons = [_poison_like(s) for s in saved]
            if any(p is None for p in poisons):
                # can't poison every output: restore and skip the check —
                # returning after poisoning SOME outputs would leave NaN
                # garbage in live storage (review finding)
                for o, s in zip(node.outputs, saved):
                    storage_map[o][0] = s
                return
            for o, p_ in zip(node.outputs, poisons):
                storage_map[o][0] = p_
            py_thunk()
            for i, (o, s) in enumerate(zip(node.outputs, saved)):
                if not check_eq(o, storage_map[o][0], s):
                    raise BadThunkOutput(node, i, s, storage_map[o][0])

        def run():
            for node, py_thunk, jax_fn in thunks:
                ins = [storage_map[i][0] for i in node.inputs]
                if check_aliasing or check_preallocated:
                    node._dbg_snapshots = [_snapshot(v) for v in ins]
                try:
                    py_thunk()
                except Exception:
                    raise_with_op(fgraph, node, py_thunk)
                if check_aliasing:
                    _check_alias_and_destroy(node)
                for i, out in enumerate(node.outputs):
                    val = storage_map[out][0]
                    # type admission check
                    try:
                        out.type.filter(val, strict=False)
                    except Exception as e:
                        raise InvalidValueError(
                            f"node {node} output {i} value rejected by "
                            f"{out.type}: {e}"
                        )
                    if check_finite and np.issubdtype(
                        np.asarray(val).dtype, np.floating
                    ):
                        if not np.all(np.isfinite(np.asarray(val))):
                            raise InvalidValueError(
                                f"node {node} output {i} has non-finite values"
                            )
                if jax_fn is not None:
                    try:
                        jax_vals = jax_fn(*ins)
                    except NotImplementedError:
                        continue
                    except Exception:
                        continue  # lowering-only failure paths (e.g. traced sizes)
                    if not isinstance(jax_vals, (tuple, list)):
                        jax_vals = (jax_vals,)
                    for i, (out, jv) in enumerate(zip(node.outputs, jax_vals)):
                        pv = storage_map[out][0]
                        eq = getattr(out.type, "values_eq_approx", out.type.values_eq)
                        try:
                            jv_host = np.asarray(jv)
                            ok = eq(np.asarray(pv), jv_host.astype(np.asarray(pv).dtype))
                        except Exception:
                            continue
                        if not ok:
                            raise BadThunkOutput(node, i, pv, jv)
                if check_preallocated:
                    _check_preallocated(node, py_thunk)

        return run, input_containers, output_containers, thunks, order


class _RewriteEventRecorder:
    """Feature recording a canonical trace of fgraph mutations, so two
    rewrite runs over clones of the same graph can be compared (reference
    ``_VariableEquivalenceTracker`` event list, debugmode.py:1172)."""

    def __init__(self):
        self.events = []

    def on_attach(self, fgraph):
        pass

    def on_import(self, fgraph, node, reason):
        self.events.append(f"import {node.op} [{reason}]")

    def on_prune(self, fgraph, node, reason):
        self.events.append(f"prune {node.op} [{reason}]")

    def on_change_input(self, fgraph, node, i, old_var, new_var, reason=None):
        op = node.op if node != "output" else "output"
        self.events.append(f"change {op}.{i} [{reason}]")


class StochasticOrder(DebugModeError):
    """Non-deterministic rewrite ordering detected: the same graph
    rewritten twice produced different event traces (reference)."""


def check_rewrite_stability(make_fgraph_and_rewrite, patience: int):
    """Run the rewrite pipeline ``patience`` times over fresh clones and
    compare event traces (reference ``stability_patience`` loop,
    debugmode.py:2015).  ``make_fgraph_and_rewrite(recorder)`` must build
    a fresh clone, attach the recorder, run the pipeline, and return the
    fgraph.  Returns the first fgraph; raises StochasticOrder on drift."""
    first = None
    trace0 = None
    for i in range(max(1, patience)):
        rec = _RewriteEventRecorder()
        fg = make_fgraph_and_rewrite(rec)
        if i == 0:
            first, trace0 = fg, rec.events
        elif rec.events != trace0:
            lines = ["Optimization process is unstable...",
                     "(event index)  (run 0)  (run %d)" % i]
            for j in range(max(len(trace0), len(rec.events))):
                a = trace0[j] if j < len(trace0) else "<missing>"
                b = rec.events[j] if j < len(rec.events) else "<missing>"
                if a != b:
                    lines.append(f"  {j}: {a}  !=  {b}")
            raise StochasticOrder("\n".join(lines))
    return first


class DebugMode(Mode):
    """(reference ``debugmode.py:2148``).  ``stability_patience`` > 1 makes
    the compile driver re-run the rewrite pipeline that many times on
    fresh clones and verify the event traces agree."""

    def __init__(self, optimizer="fast_run", check_finite=False,
                 stability_patience=None, check_aliasing=True,
                 check_preallocated=True, bisect=False):
        super().__init__(
            DebugLinker(
                check_finite=check_finite,
                check_aliasing=check_aliasing,
                check_preallocated=check_preallocated,
            ),
            optimizer,
        )
        if stability_patience is None:
            stability_patience = config.DebugMode__patience
        self.stability_patience = stability_patience
        #: with bisect=True every call is also checked against the py oracle
        #: of the UNREWRITTEN graph; on divergence the culprit rewrite is
        #: found by find_bad_optimizations and named in the BadOptimization
        #: (reference _find_bad_optimizations, debugmode.py:699)
        self.bisect = bisect


class BadJitProgramOutput(DebugModeError):
    """The whole JITTED program and the per-node py oracle disagree on a
    function output — a bug introduced BY the jit path itself (fusion,
    reassociation, buffer donation), invisible to per-node checkers."""

    def __init__(self, fgraph, output_idx, py_val, jax_val):
        self.output_idx = output_idx
        self.py_val = py_val
        self.jax_val = jax_val
        kind = ("an update expression"
                if output_idx in (fgraph.update_mapping or {})
                else "a user output")
        super().__init__(
            f"BadJitProgramOutput: output {output_idx} ({kind}): the jitted "
            f"XLA program and the py oracle disagree.\n"
            f"  py : {_brief(py_val)}\n  jit: {_brief(jax_val)}\n"
            + str_diagnostic(py_val, jax_val)
        )


class DualLinker(Linker):
    """Run the WHOLE jitted XLA program AND the per-node py oracle on
    every call; compare every function output (user outputs and shared
    updates) with the type's approximate equality.

    The reference's DualLinker (``link/c/basic.py:1934``) pairs the C
    and py implementations per node; here the unit under test is the
    single post-rewrite XLA executable — the program users actually
    ship — so bugs introduced only by whole-program compilation
    (XLA fusion, reassociation, donated-buffer aliasing) are caught.
    The eager per-node checker (`DebugLinker`) cannot see those.

    The jitted results are published to the caller, so behavior
    (donation included) is exactly FAST_RUN plus the comparison.
    """

    def __init__(self, allow_gc=None):
        super().__init__(allow_gc)

    def make_thunk(self, input_storage=None, output_storage=None, storage_map=None):
        from aesara_tpu.link.basic import PerformLinker
        from aesara_tpu.link.jax.linker import JAXLinker

        fgraph = self.fgraph
        jax_linker = JAXLinker(allow_gc=self.allow_gc)
        jax_linker.fgraph = fgraph
        jax_thunk, input_containers, output_containers = jax_linker.make_thunk(
            input_storage=input_storage, output_storage=output_storage
        )
        # the oracle runs the SAME optimized fgraph per-node with its own
        # storage (the jit path device_puts/donates the primary cells)
        py_linker = PerformLinker(allow_gc=False)
        py_linker.fgraph = fgraph
        py_in = [[None] for _ in fgraph.inputs]
        py_out = [[None] for _ in fgraph.outputs]
        py_thunk, _, _ = py_linker.make_thunk(
            input_storage=py_in, output_storage=py_out
        )
        jit_in = jax_thunk.inputs
        jit_out = jax_thunk.outputs

        def thunk():
            # snapshot inputs BEFORE the jit run: donation may consume
            # the primary buffers (that consumption is itself under test)
            for jc, pc in zip(jit_in, py_in):
                pc[0] = None if jc[0] is None else np.asarray(jc[0])
            jax_thunk()
            py_thunk()
            for i, (var, jc, pc) in enumerate(
                zip(fgraph.outputs, jit_out, py_out)
            ):
                jv, pv = jc[0], pc[0]
                if getattr(var.type, "dtype", None) is None:
                    continue
                if not check_eq(var, pv, np.asarray(jv)):
                    raise BadJitProgramOutput(fgraph, i, pv, jv)

        thunk.inputs = jax_thunk.inputs
        thunk.outputs = jax_thunk.outputs
        thunk.jit_fn = getattr(jax_thunk, "jit_fn", None)
        return thunk, input_containers, output_containers


class CompareMode(Mode):
    """``Mode`` wrapper over :class:`DualLinker`: the full FAST_RUN
    rewrite pipeline, with every call cross-checked jit-vs-py."""

    def __init__(self, optimizer="fast_run"):
        super().__init__(DualLinker(), optimizer)


# --- bad-rewrite attribution (reference _find_bad_optimizations:699 +
# _VariableEquivalenceTracker:1172) --------------------------------------------
#
# The reference tracks variable equivalences across every rewrite and, on a
# numeric mismatch, indicts the specific rewrite.  Here the same capability is
# an explicit culprit-finder: given a way to build fresh unrewritten clones
# and the rewrite pipeline, it (1) runs the py oracle on the UNREWRITTEN
# graph, (2) scans the pipeline stage by stage (the optdb float-position
# prefix order — each stage is a position_cutoff increment) re-running the
# oracle after each, and (3) replays the guilty stage transaction-by-
# transaction by probing ``replace_all_validate`` — every rewrite application
# commits through it with its ``reason`` — reporting the first rewrite whose
# application flips the comparison.


class RewriteCulpritReport:
    """Names the rewrite that changed a program's results."""

    def __init__(self, stage, rewrite, output_idx, ref_val, bad_val):
        self.stage = stage          # stage name (optdb position entry)
        self.rewrite = rewrite      # the NodeRewriter/reason that flipped, or None
        self.output_idx = output_idx
        self.ref_val = ref_val
        self.bad_val = bad_val

    @property
    def culprit_name(self) -> str:
        r = self.rewrite if self.rewrite is not None else self.stage
        return str(getattr(r, "name", None) or r)

    def __str__(self):
        lines = [f"BadOptimization culprit: {self.culprit_name}",
                 f"  pipeline stage: {self.stage}"]
        if self.rewrite is not None:
            lines.append(f"  rewrite: {self.rewrite}")
        else:
            lines.append(
                "  (no single replace-transaction flipped the comparison; "
                "the stage itself — a whole-graph rewriter — is the culprit)"
            )
        lines.append(f"  first diverging output: {self.output_idx}")
        lines.append(str_diagnostic(self.ref_val, self.bad_val))
        return "\n".join(lines)


def _run_py_fgraph(fgraph, input_values):
    """Run ``fgraph`` per-node with the NumPy oracle on copies of
    ``input_values``; returns the output values."""
    from aesara_tpu.link.basic import PerformLinker

    linker = PerformLinker(allow_gc=False)
    linker.fgraph = fgraph
    in_st = [[None] for _ in fgraph.inputs]
    out_st = [[None] for _ in fgraph.outputs]
    thunk, _, _ = linker.make_thunk(input_storage=in_st, output_storage=out_st)
    for cell, var, val in zip(in_st, fgraph.inputs, input_values):
        if isinstance(val, np.ndarray):
            val = val.copy()
        cell[0] = var.type.filter(val, strict=False)
    thunk()
    return [c[0] for c in out_st]


def _first_divergence(fgraph, vals, ref_vals):
    """Index of the first output where ``vals`` disagrees with ``ref_vals``
    under the type's approximate equality, or None."""
    for i, (var, v, r) in enumerate(zip(fgraph.outputs, vals, ref_vals)):
        if getattr(var.type, "dtype", None) is None:
            continue
        try:
            ok = check_eq(var, r, v)
        except Exception:
            continue
        if not ok:
            return i
    return None


def find_bad_optimizations(build_fgraph, rewriter, input_values):
    """Attribute a rewrite-introduced numeric divergence to one rewrite.

    ``build_fgraph()`` must return a fresh UNREWRITTEN clone each call
    (with ReplaceValidate attached); ``rewriter`` is the full pipeline
    (typically ``optdb.query(...)`` — a SequentialGraphRewriter whose
    members are the float-position stages); ``input_values`` triggers the
    divergence.  Returns a :class:`RewriteCulpritReport`, or None when the
    rewritten program agrees with the unrewritten oracle on these inputs.
    """
    ref_fg = build_fgraph()
    ref_vals = _run_py_fgraph(ref_fg, input_values)

    from aesara_tpu.graph.rewriting.basic import SequentialGraphRewriter

    stages = (list(rewriter) if isinstance(rewriter, SequentialGraphRewriter)
              else [rewriter])

    # 1) prefix scan over the stage pipeline (cumulative application — the
    # position_cutoff order), comparing the py oracle after each stage
    fg = build_fgraph()
    guilty_idx = None
    divergence = None
    for si, stage in enumerate(stages):
        stage.rewrite(fg)
        vals = _run_py_fgraph(fg, input_values)
        bad = _first_divergence(fg, vals, ref_vals)
        if bad is not None:
            guilty_idx = si
            divergence = (bad, ref_vals[bad], vals[bad])
            break
    if guilty_idx is None:
        return None
    stage = stages[guilty_idx]
    stage_name = str(getattr(stage, "name", None) or type(stage).__name__)

    # 2) replay: fresh clone, apply the innocent prefix, then run the guilty
    # stage with every replace-transaction probed.  ``replace_all_validate``
    # (and its _remove variant) is the single commit point every node
    # rewrite goes through, carrying the rewrite as ``reason``.
    fg2 = build_fgraph()
    for s in stages[:guilty_idx]:
        s.rewrite(fg2)
    found = {"rewrite": None, "output_idx": None, "ref": None, "bad": None}

    def _probe_after_commit(reason):
        if found["rewrite"] is not None:
            return
        try:
            vals = _run_py_fgraph(fg2, input_values)
        except Exception:
            return  # mid-pipeline graph not runnable: skip this probe point
        bad = _first_divergence(fg2, vals, ref_vals)
        if bad is not None:
            found.update(rewrite=reason, output_idx=bad,
                         ref=ref_vals[bad], bad=vals[bad])

    orig_rav = fg2.replace_all_validate
    orig_ravr = fg2.replace_all_validate_remove

    def probed_rav(replacements, reason=None, **kwargs):
        out = orig_rav(replacements, reason=reason, **kwargs)
        _probe_after_commit(reason)
        return out

    def probed_ravr(replacements, remove, reason=None, **kwargs):
        out = orig_ravr(replacements, remove, reason=reason, **kwargs)
        _probe_after_commit(reason)
        return out

    fg2.replace_all_validate = probed_rav
    fg2.replace_all_validate_remove = probed_ravr
    try:
        stage.rewrite(fg2)
    finally:
        fg2.replace_all_validate = orig_rav
        fg2.replace_all_validate_remove = orig_ravr

    if found["rewrite"] is not None:
        return RewriteCulpritReport(
            stage_name, found["rewrite"], found["output_idx"],
            found["ref"], found["bad"],
        )
    # no single transaction flipped (whole-graph rewriter mutating without
    # replace_all_validate, or an interaction): indict the stage
    bad, ref_v, bad_v = divergence
    return RewriteCulpritReport(stage_name, None, bad, ref_v, bad_v)


def find_bad_rewrite(inputs, outputs, input_values, optimizer="fast_run"):
    """User-level culprit finder: symbolic ``inputs``/``outputs`` plus the
    concrete ``input_values`` that expose the wrong result.  ``optimizer``
    is a predefined-optimizer name or a RewriteDatabaseQuery."""
    from aesara_tpu.compile.mode import optdb, predefined_optimizers
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.graph.features import ReplaceValidate
    from aesara_tpu.graph.ir import clone_get_equiv

    if isinstance(optimizer, str) or optimizer is None:
        optimizer = predefined_optimizers[optimizer]
    rewriter = optdb.query(optimizer)

    def build_fgraph():
        memo = clone_get_equiv(
            inputs, outputs, copy_inputs=True, copy_orphans=True
        )
        fg = FunctionGraph(
            [memo[v] for v in inputs], [memo[v] for v in outputs], clone=False
        )
        fg.attach_feature(ReplaceValidate())
        return fg

    return find_bad_optimizations(build_fgraph, rewriter, input_values)


# --- reference error taxonomy + diagnostics (debugmode.py) -------------------

class BadViewMap(DebugModeError):
    """An op's view_map claim doesn't hold at runtime (reference)."""


class BadDestroyMap(DebugModeError):
    """An op destroyed an input it didn't declare (reference) — under
    donation semantics this is an aliasing bug in a lowering."""


class BadOptimization(DebugModeError):
    """A rewrite changed results (reference; also raised by History/
    ReplaceValidate as graph.features.BadOptimization)."""


class DataDestroyed(DebugModeError):
    """Storage read after being destroyed (reference)."""


def check_eq(var, val1, val2) -> bool:
    """Type-aware value comparison (reference ``check_eq``)."""
    eq = getattr(var.type, "values_eq_approx", None) or var.type.values_eq
    return bool(eq(val1, val2))


def str_diagnostic(expected, value, rtol=None, atol=None) -> str:
    """Human-readable mismatch report (reference ``str_diagnostic``)."""
    import numpy as np

    e = np.asarray(expected)
    v = np.asarray(value)
    lines = [f"  shapes: expected {e.shape}, got {v.shape}",
             f"  dtypes: expected {e.dtype}, got {v.dtype}"]
    if e.shape == v.shape and e.size:
        diff = np.abs(e.astype("float64") - v.astype("float64"))
        lines.append(f"  max abs err: {diff.max():.6g}")
        denom = np.maximum(np.abs(e), 1e-8)
        lines.append(f"  max rel err: {(diff / denom).max():.6g}")
    if rtol is not None or atol is not None:
        lines.append(f"  tolerances: rtol={rtol} atol={atol}")
    return "\n".join(lines)


def validity_hint(t, value) -> str:
    """Why a value is invalid for a type, or 'valid' (reference)."""
    try:
        t.filter(value, strict=True)
        return "valid"
    except Exception as e:
        return str(e)
