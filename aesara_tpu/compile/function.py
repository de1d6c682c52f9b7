"""``aesara_tpu.function``: compile symbolic graphs into callables.

Re-design of the reference's driver stack (SURVEY §3.1):
``function`` (``compile/function/__init__.py:86``) → ``pfunc``
(``pfunc.py:267``, expands shared vars/updates/givens via
``rebuild_collect_shared``) → ``orig_function``/``FunctionMaker``
(``types.py:1741/1271``, rewrites + linker) → ``Function``
(``types.py:275``).  The default linker compiles the WHOLE rewritten
graph into one jitted XLA program; shared variables ride along as leading
arguments whose buffers are donated when updated.
"""

from __future__ import annotations

import time
import warnings
from typing import Any, Callable, Dict, List, Optional, Sequence, Union

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.compile.io import In, Out, SymbolicInput, SymbolicOutput
from aesara_tpu.compile.mode import Mode, get_mode
from aesara_tpu.compile.sharedvalue import SharedVariable
from aesara_tpu.graph.features import ReplaceValidate
from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import (
    Constant,
    Variable,
    ancestors,
    clone_get_equiv,
    graph_inputs,
)


__all__ = ["function", "pfunc", "orig_function", "Function", "function_dump",
           "UnusedInputError", "rebuild_collect_shared"]


class UnusedInputError(Exception):
    pass


def _check_duplicate_updates(updates):
    """Reject two updates for one target in list form — dict() would
    silently keep only the LAST pair (reference pfunc
    test_duplicate_updates)."""
    if isinstance(updates, (list, tuple)):
        keys = [k for k, _ in updates]
        if len({id(k) for k in keys}) != len(keys):
            dupes = [k for k in keys if keys.count(k) > 1]
            raise ValueError(f"duplicate update targets: {dupes[:2]}")


def function(
    inputs: Sequence,
    outputs=None,
    mode=None,
    updates=None,
    givens=None,
    no_default_updates: bool = False,
    accept_inplace: bool = False,
    name: Optional[str] = None,
    rebuild_strict: bool = True,
    allow_input_downcast: Optional[bool] = None,
    profile=None,
    on_unused_input: Optional[str] = None,
    steps_per_call: int = 1,
) -> "Function":
    """Compile a callable from symbolic inputs/outputs
    (reference ``compile/function/__init__.py:86``).

    ``steps_per_call=k`` compiles the k-step update-only loop as ONE
    XLA program: each call applies the updates k times (bit-equal to k
    sequential calls, including RNG state threading) and returns the
    per-step outputs stacked on a new leading (k,) axis — one device
    dispatch and one host readback per k steps.  This is the measured
    production pattern on TPU, where a per-call dispatch pays the
    ~0.8 ms tunnel floor (benchmarks/README.md round-3/5 fused-loop
    tables); the hand-written ``scan`` training loop it replaces is the
    reference's hot-loop contract
    (``/root/reference/aesara/compile/function/types.py:791``).
    """
    if isinstance(inputs, (Variable, In)):
        raise TypeError("inputs must be a list/tuple")
    # checked here (not only in rebuild_collect_shared) because the
    # steps_per_call path below returns before reaching it
    _check_duplicate_updates(updates)
    if steps_per_call != 1:
        return _pfunc_ksteps(
            params=list(inputs), outputs=outputs, mode=mode,
            updates=updates, givens=givens,
            no_default_updates=no_default_updates, name=name,
            allow_input_downcast=allow_input_downcast, profile=profile,
            on_unused_input=on_unused_input, k=int(steps_per_call),
        )
    return pfunc(
        params=list(inputs),
        outputs=outputs,
        mode=mode,
        updates=updates,
        givens=givens,
        no_default_updates=no_default_updates,
        accept_inplace=accept_inplace,
        name=name,
        allow_input_downcast=allow_input_downcast,
        profile=profile,
        on_unused_input=on_unused_input,
    )


def _pfunc_ksteps(params, outputs, mode, updates, givens,
                  no_default_updates, name, allow_input_downcast,
                  profile, on_unused_input, k):
    """``function(..., steps_per_call=k)``: wrap the user's step in a
    k-step Scan.  Explicit update targets AND default updates (RNG state
    rotation) become sit-sot carries, so step t+1 reads step t's state —
    exactly k sequential calls.  Explicit inputs are loop-invariant
    (each of the k steps sees the same values, as k identical calls
    would).  Per-step outputs stack as nit-sots: one (k, ...) readback.
    """
    if k < 1:
        raise ValueError(f"steps_per_call must be >= 1, got {k}")
    from aesara_tpu.graph.ir import clone_replace
    from aesara_tpu.scan import scan

    in_specs = []
    for p in params:
        if isinstance(p, In):
            if p.update is not None:
                raise NotImplementedError(
                    "steps_per_call>1 does not support In(update=...) "
                    "inputs; use a shared variable for the looped state"
                )
            in_specs.append(p)
        elif isinstance(p, Variable):
            if isinstance(p, SharedVariable):
                raise TypeError(
                    "shared variables do not belong in `inputs`: they are "
                    "implicit; pass updates={shared: expr} instead"
                )
            in_specs.append(In(p, allow_downcast=allow_input_downcast))
        else:
            raise TypeError(f"invalid function input {p!r}")

    # stage 1: resolve givens + collect explicit AND default updates on
    # the single-step graph (the same path a k=1 function takes)
    out_vars, _shared, update_pairs, single = rebuild_collect_shared(
        outputs, inputs=[s.variable for s in in_specs], replace=givens,
        updates=dict(updates or {}), no_default_updates=no_default_updates,
    )
    from aesara_tpu.tensor.type import TensorType

    user_target_ids = {id(t) for t in (dict(updates or {}))}
    targets, exprs = [], []
    for tgt, expr in update_pairs:
        if not isinstance(tgt, SharedVariable):
            raise NotImplementedError(
                "steps_per_call>1 requires all update targets to be "
                "shared variables"
            )
        if isinstance(tgt.type, TensorType):
            targets.append(tgt)
            exprs.append(expr)
        elif id(tgt) in user_target_ids:
            raise NotImplementedError(
                "steps_per_call>1 cannot carry a non-tensor explicit "
                f"update target ({tgt}); only default updates (RNG state "
                "rotation) thread automatically"
            )
        # non-tensor DEFAULT updates (RNG state rotation): the body clone
        # recreates the draw applies fresh, so scan's own shared-update
        # threading rotates the state per step (scan/basic.py epoch
        # discriminator) — exactly k sequential calls' worth of draws

    def body(*carries):
        repl = dict(zip(targets, carries))
        new = clone_replace(exprs + out_vars, replace=repl)
        new = list(new) if isinstance(new, (list, tuple)) else [new]
        return new if len(new) > 1 else new[0]

    outputs_info = list(targets) + [None] * len(out_vars)
    if not outputs_info:
        raise ValueError(
            "steps_per_call>1 needs at least one output or update"
        )
    res, scan_updates = scan(body, outputs_info=outputs_info, n_steps=k)
    res = list(res) if isinstance(res, (list, tuple)) else [res]

    # state after k steps = last carried value (scan_save_mem turns the
    # [-1] reads into final-only carries: no (k, ...) state stacks);
    # scan_updates carries the threaded RNG finals
    new_updates = {t: res[i][-1] for i, t in enumerate(targets)}
    new_updates.update(scan_updates or {})
    stacked = res[len(targets):]

    # re-apply the caller's Out specs (borrow flags) to the stacks
    new_outputs = None
    if outputs is not None:
        raw = [outputs] if isinstance(outputs, (Variable, Out)) else list(outputs)
        new_outputs = [
            Out(s, borrow=o.borrow) if isinstance(o, Out) else s
            for o, s in zip(raw, stacked)
        ]
        if single:
            new_outputs = new_outputs[0]

    fn = pfunc(
        params=in_specs, outputs=new_outputs, mode=mode,
        updates=new_updates, givens=None,
        no_default_updates=True,  # stage 1 already collected them
        name=name, allow_input_downcast=allow_input_downcast,
        profile=profile, on_unused_input=on_unused_input,
    )
    fn.steps_per_call = k
    return fn


def rebuild_collect_shared(
    outputs,
    inputs=(),
    replace=None,
    updates=None,
    rebuild_strict=True,
    copy_inputs_over=True,
    no_default_updates=False,
):
    """Clone the graph, apply ``replace`` (givens), lift SharedVariables
    into explicit inputs, and collect update pairs
    (reference ``pfunc.py:18``)."""
    from aesara_tpu.graph.ir import clone_replace

    single = isinstance(outputs, (Variable, Out))
    if outputs is None:
        output_list = []
    elif single:
        output_list = [outputs]
    else:
        output_list = list(outputs)
    out_vars = [o.variable if isinstance(o, Out) else o for o in output_list]

    _check_duplicate_updates(updates)
    updates = dict(updates or {})
    update_pairs = []
    input_ids = {id(v) for v in inputs}
    for k, v in updates.items():
        # non-shared targets are only legal for explicit inputs carrying
        # an In(update=...) spec (reference io.py:108)
        if not isinstance(k, SharedVariable) and id(k) not in input_ids:
            raise TypeError(f"update target {k} is not a SharedVariable")
        v = k.type.filter_variable(v, allow_convert=True)
        update_pairs.append((k, v))

    if isinstance(replace, (list, tuple)):
        replace_items = list(replace)
        sequential = True   # reference pfunc: list-form givens apply IN
        # ORDER, so a later pair substitutes into an earlier pair's
        # replacement expression (chained givens)
    else:
        replace_items = list((replace or {}).items())
        sequential = False
    replace_pairs = [
        (k, k.type.filter_variable(v, allow_convert=True))
        for k, v in replace_items
    ]

    # substitute givens
    if replace_pairs:
        all_roots = out_vars + [v for _, v in update_pairs]
        if sequential:
            for k, v in replace_pairs:
                all_roots = clone_replace(all_roots, replace={k: v})
        else:
            memo = {k: v for k, v in replace_pairs}
            all_roots = clone_replace(all_roots, replace=memo)
        out_vars = all_roots[: len(out_vars)]
        update_exprs = all_roots[len(out_vars):]
        update_pairs = [(k, e) for (k, _), e in zip(update_pairs, update_exprs)]

    # collect shared variables reachable from outputs and update exprs
    roots = out_vars + [v for _, v in update_pairs]
    shared_vars: List[SharedVariable] = []
    seen = set()
    for v in graph_inputs(roots) if roots else []:
        if isinstance(v, SharedVariable) and id(v) not in seen:
            seen.add(id(v))
            shared_vars.append(v)
    # update TARGETS are function state even when the graph never reads
    # them (write-only updates, e.g. logging a statistic into a shared)
    for k, _ in update_pairs:
        if isinstance(k, SharedVariable) and id(k) not in seen:
            seen.add(id(k))
            shared_vars.append(k)

    # default updates (RandomStream state rotation etc.).
    # no_default_updates: True = drop ALL, a list = drop only those
    # (reference pfunc contract) — a non-empty list is truthy, so test
    # identity with True, not truthiness
    explicit_targets = {id(k) for k, _ in update_pairs}
    if no_default_updates is not True:
        changed = True
        while changed:
            changed = False
            for sv in list(shared_vars):
                du = getattr(sv, "default_update", None)
                if du is None or id(sv) in explicit_targets:
                    continue
                if isinstance(no_default_updates, list) and sv in no_default_updates:
                    continue
                update_pairs.append((sv, sv.type.filter_variable(du, allow_convert=True)))
                explicit_targets.add(id(sv))
                # the update expr may pull in more shared vars
                for v in graph_inputs([update_pairs[-1][1]]):
                    if isinstance(v, SharedVariable) and id(v) not in seen:
                        seen.add(id(v))
                        shared_vars.append(v)
                        changed = True

    return out_vars, shared_vars, update_pairs, single


def pfunc(
    params,
    outputs=None,
    mode=None,
    updates=None,
    givens=None,
    no_default_updates=False,
    accept_inplace=False,
    name=None,
    rebuild_strict=True,
    allow_input_downcast=None,
    profile=None,
    on_unused_input=None,
) -> "Function":
    """Expand shared/updates/givens then compile (reference ``pfunc.py:267``)."""
    # normalize inputs to In specs
    in_specs: List[In] = []
    for p in params:
        if isinstance(p, In):
            in_specs.append(p)
        elif isinstance(p, Variable):
            if isinstance(p, SharedVariable):
                raise TypeError(
                    "shared variables do not belong in `inputs`: they are "
                    "implicit; pass updates={shared: expr} instead"
                )
            if isinstance(p, Constant):
                raise TypeError("constants cannot be function inputs")
            in_specs.append(In(p, allow_downcast=allow_input_downcast))
        else:
            raise TypeError(f"invalid function input {p!r}")

    # updates supplied as list of pairs or dict
    if updates is not None and not isinstance(updates, dict):
        updates = dict(updates)

    # In(x, update=expr): stateful explicit inputs (reference io.py:108) —
    # merged into the updates dict so the exprs ride the same givens
    # substitution + shared collection path
    if any(s.update is not None for s in in_specs):
        updates = dict(updates or {})
        for s in in_specs:
            if s.update is None:
                continue
            if any(k is s.variable for k in updates):
                raise ValueError(
                    f"input {s.variable} has both In(update=...) and an "
                    "entry in `updates`"
                )
            updates[s.variable] = s.update

    out_vars, shared_vars, update_pairs, single = rebuild_collect_shared(
        outputs, inputs=[s.variable for s in in_specs], replace=givens,
        updates=updates, no_default_updates=no_default_updates,
    )

    # keep Out specs (borrow flags) aligned
    out_specs = None
    if outputs is not None:
        raw = [outputs] if isinstance(outputs, (Variable, Out)) else list(outputs)
        out_specs = [o if isinstance(o, Out) else Out(o) for o in raw]

    return orig_function(
        in_specs, out_vars, shared_vars, update_pairs, single,
        mode=mode, name=name, profile=profile, on_unused_input=on_unused_input,
        accept_inplace=accept_inplace, out_specs=out_specs,
    )


def orig_function(
    in_specs: List[In],
    out_vars: List[Variable],
    shared_vars: List[SharedVariable],
    update_pairs,
    single_output: bool,
    mode=None,
    name=None,
    profile=None,
    on_unused_input=None,
    accept_inplace=False,
    out_specs=None,
) -> "Function":
    """FunctionMaker equivalent (reference ``types.py:1741/1271``)."""
    t0 = time.perf_counter()
    mode = get_mode(mode)

    explicit_inputs = [s.variable for s in in_specs]
    n_explicit = len(explicit_inputs)
    all_inputs = explicit_inputs + list(shared_vars)
    # split shared updates (written into containers) from explicit-input
    # updates (In(update=...): persistent per-function input state)
    input_update_pairs = [
        (k, e) for k, e in update_pairs if not isinstance(k, SharedVariable)
    ]
    update_pairs = [
        (k, e) for k, e in update_pairs if isinstance(k, SharedVariable)
    ]
    update_exprs = [e for _, e in update_pairs]
    all_outputs = (list(out_vars) + update_exprs
                   + [e for _, e in input_update_pairs])
    input_update_info = []
    for j, (k, _) in enumerate(input_update_pairs):
        pos = next(i for i, v in enumerate(explicit_inputs) if v is k)
        input_update_info.append(
            (pos, len(out_vars) + len(update_exprs) + j)
        )

    # unused-input check
    policy = on_unused_input or config.on_unused_input
    if policy != "ignore" and all_outputs:
        used = set(ancestors(all_outputs))
        for spec, var in zip(in_specs, explicit_inputs):
            if var not in used:
                msg = (
                    f"function input {var} is unused; pass "
                    f"on_unused_input='ignore' or 'warn' to silence"
                )
                if policy == "raise":
                    raise UnusedInputError(msg)
                warnings.warn(msg)

    # update mapping: output index -> input index (for donation)
    update_mapping = {}
    for ui, (shared, _) in enumerate(update_pairs):
        out_idx = len(out_vars) + ui
        in_idx = all_inputs.index(shared)
        update_mapping[out_idx] = in_idx

    from aesara_tpu.graph.destroyhandler import Supervisor

    updated_idx = set(update_mapping.values())

    def _build_fgraph():
        # clone into an isolated FunctionGraph
        memo = clone_get_equiv(
            all_inputs, all_outputs, copy_inputs=True, copy_orphans=True
        )
        fg_inputs = [memo[v] for v in all_inputs]
        fg_outputs = [memo[v] for v in all_outputs]
        fg = FunctionGraph(
            fg_inputs, fg_outputs, clone=False, update_mapping=update_mapping
        )
        fg.attach_feature(ReplaceValidate())
        # protect non-mutable explicit inputs and non-updated shareds from
        # destructive rewrites (reference Supervisor, types.py:136)
        protected = [
            fg_inputs[i]
            for i, spec in enumerate(in_specs)
            if not getattr(spec, "mutable", False)
        ] + [
            fg_inputs[n_explicit + j]
            for j in range(len(shared_vars))
            if (n_explicit + j) not in updated_idx
        ]
        fg.attach_feature(Supervisor(protected))
        return fg

    # run the rewrite pipeline; DebugMode reruns it over fresh clones to
    # catch nondeterministic rewrite orderings (reference stability_patience
    # loop, debugmode.py:2015)
    rewriter = mode.optimizer
    patience = getattr(mode, "stability_patience", 1)
    rewrite_time = None
    if rewriter is not None:
        rt0 = time.perf_counter()
        with config.change_flags(compute_test_value="off"):
            if patience > 1:
                from aesara_tpu.compile.debugmode import check_rewrite_stability

                def _make(recorder):
                    fg = _build_fgraph()
                    fg.attach_feature(recorder)
                    rewriter.rewrite(fg)
                    return fg

                fgraph = check_rewrite_stability(_make, patience)
            else:
                fgraph = _build_fgraph()
                rewriter.rewrite(fgraph)
        rewrite_time = time.perf_counter() - rt0
    else:
        fgraph = _build_fgraph()

    # aliasing protection for the py path: outputs that are literally graph
    # inputs/constants must be copied (insert_deepcopy, types.py:1172)
    from aesara_tpu.compile.ops import deep_copy_op
    from aesara_tpu.link.basic import PerformLinker

    for i, out in enumerate(fgraph.outputs):
        if i in update_mapping:
            continue
        if out in fgraph.inputs or isinstance(out, Constant):
            fgraph.change_node_input(
                "output", i, deep_copy_op(out), reason="insert_deepcopy",
                check=False,
            )

    profile_stats = None
    if profile:
        from aesara_tpu.compile.profiling import ProfileLinker, ProfileStats

        profile_stats = (profile if isinstance(profile, ProfileStats)
                         else ProfileStats(name=name))

    if profile_stats is not None and isinstance(mode.linker, PerformLinker):
        # per-Apply timing rides the py path (reference: the VM times
        # thunks when profile=True); device modes get whole-program
        # timing + xla_cost_analysis instead
        from aesara_tpu.compile.profiling import ProfileLinker

        linker = ProfileLinker(profile_stats)
    else:
        linker = mode.linker.clone()
    linker.accept(fgraph)

    # wire shared containers straight into the input storage
    input_storage = []
    for spec in in_specs:
        cell = [None]
        if spec.value is not None and not isinstance(spec.value, Variable):
            cell[0] = spec.variable.type.filter(spec.value)
        input_storage.append(cell)
    for sv in shared_vars:
        input_storage.append(sv.container.storage)

    thunk, input_containers, output_containers = linker.make_thunk(
        input_storage=input_storage
    )

    if getattr(mode, "bisect", False) and rewriter is not None:
        # DebugMode(bisect=True): cross-check every call against the py
        # oracle of the UNREWRITTEN graph; on divergence run the culprit
        # finder and name the rewrite (reference _find_bad_optimizations)
        import numpy as _np

        from aesara_tpu.compile.debugmode import (
            BadOptimization,
            _first_divergence,
            _run_py_fgraph,
            find_bad_optimizations,
        )

        inner_thunk = thunk
        out_cells = [c.storage for c in output_containers]

        def _bisect_thunk():
            snap = [
                None if cell[0] is None
                else (_np.asarray(cell[0]).copy()
                      if isinstance(cell[0], _np.ndarray)
                      or _np.isscalar(cell[0]) else cell[0])
                for cell in input_storage
            ]
            inner_thunk()
            ref_vals = _run_py_fgraph(_build_fgraph(), snap)
            got_vals = [
                None if c[0] is None else _np.asarray(c[0]) for c in out_cells
            ]
            bad = _first_divergence(fgraph, got_vals, ref_vals)
            if bad is not None:
                report = find_bad_optimizations(_build_fgraph, rewriter, snap)
                if report is None:
                    raise BadOptimization(
                        f"output {bad} diverges from the unrewritten py "
                        "oracle, but no pipeline prefix reproduces it "
                        "(jit-path bug? try CompareMode)"
                    )
                raise BadOptimization(str(report))

        _bisect_thunk.__dict__.update(inner_thunk.__dict__)
        thunk = _bisect_thunk

    fn = Function(
        thunk=thunk,
        input_storage=input_storage,
        output_storage=[c.storage for c in output_containers],
        in_specs=in_specs,
        shared_vars=list(shared_vars),
        update_pairs=list(update_pairs),
        n_user_outputs=len(out_vars),
        single_output=single_output,
        fgraph=fgraph,
        mode=mode,
        name=name,
        maker_time=time.perf_counter() - t0,
        rewrite_time=rewrite_time,
        out_specs=out_specs,
        input_update_info=input_update_info,
    )
    if profile:
        stats = profile_stats
        stats.compile_time = fn.maker_time or 0.0
        stats.rewrite_time = rewrite_time or 0.0
        stats.rewriter_profile = getattr(fgraph, "_rewrite_stage_profile", None)
        stats.equilibrium_profile = getattr(
            fgraph, "_rewrite_equilibrium_profile", None
        )
        # device modes: per-Apply attribution through HLO op_metadata
        # (link/jax/profile_attr; summary reads it lazily so it reflects
        # the program as ACTUALLY compiled, after the first call)
        import weakref

        stats._function_ref = weakref.ref(fn)
        fn.profile = stats
    else:
        fn.profile = None
    fn._recipe = {
        "in_specs": in_specs,
        "out_vars": list(out_vars),
        "shared_vars": list(shared_vars),
        # include In(update=...) pairs so copy()/pickle rebuilds keep the
        # stateful-input semantics (orig_function re-splits them)
        "update_pairs": list(update_pairs) + list(input_update_pairs),
        "single_output": single_output,
        "mode": mode,
        "name": name,
    }
    return fn


class Function:
    """A compiled callable (reference ``compile/function/types.py:275``)."""

    def __init__(
        self, thunk, input_storage, output_storage, in_specs, shared_vars,
        update_pairs, n_user_outputs, single_output, fgraph, mode, name,
        maker_time=None, rewrite_time=None, out_specs=None,
        input_update_info=None,
    ):
        self.out_specs = out_specs
        #: [(input_pos, output_storage_idx)] for In(update=...) inputs;
        #: the updated value becomes the input's default on the next call
        self.input_update_info = list(input_update_info or [])
        self._in_state = {}
        self.fn = thunk
        self.input_storage = input_storage
        self.output_storage = output_storage
        self.in_specs = in_specs
        self.shared_vars = shared_vars
        self.update_pairs = update_pairs
        self.n_user_outputs = n_user_outputs
        self.single_output = single_output
        self.fgraph = fgraph
        self.maker = self  # minimal parity for fn.maker.fgraph
        self.mode = mode
        self.name = name
        self.trust_input = False
        self.maker_time = maker_time
        self.rewrite_time = rewrite_time
        self.call_time = 0.0
        self.n_calls = 0
        self._name_to_pos = {}
        for i, spec in enumerate(in_specs):
            if spec.name:
                self._name_to_pos[spec.name] = i
        # dynamic-shape bucketing (compile/bucketing.py): if any input is
        # explicitly marked In(batched=True), exactly those participate;
        # otherwise every input whose leading dim is typed None does
        # (mark exceptions with In(var, batched=False))
        explicit = [i for i, s in enumerate(in_specs)
                    if getattr(s, "batched", None) is True]
        if explicit:
            self._bucket_positions = explicit
        else:
            self._bucket_positions = [
                i for i, spec in enumerate(in_specs)
                if getattr(spec, "batched", None) is not False
                and getattr(spec, "seq_bucketed", None) is None
                and (getattr(spec.variable.type, "ndim", 0) or 0) >= 1
                and getattr(spec.variable.type, "shape", (1,))[0] is None
            ]
        # second bucketed dim: sequence length, declared per input as
        # In(seq_bucketed=<axis>) and ZERO-padded (compile/bucketing.py);
        # the declaration asserts pad-tolerant (masked) graph semantics
        self._bucket_seq_positions = [
            (i, int(s.seq_bucketed)) for i, s in enumerate(in_specs)
            if getattr(s, "seq_bucketed", None) is not None
        ]
        #: memoized batch_axis_safety verdict (None = safe / not yet run)
        self._bucket_safety_reason = None
        self._bucket_safety_done = False

    @property
    def xla_compile_count(self):
        """Number of distinct XLA programs compiled for this function
        (one per traced input-shape signature); None off the jit path."""
        jit_fn = getattr(self.fn, "jit_fn", None)
        if jit_fn is None or not hasattr(jit_fn, "_cache_size"):
            return None
        return jit_fn._cache_size()

    def _pad_to_bucket(self, policy):
        """Pad None-leading-dim inputs up to the policy's bucket.  Returns
        (true_len, bucket) when padding happened, else (None, None)."""
        from aesara_tpu.compile.bucketing import bucket_for, pad_leading

        lengths = set()
        for pos in self._bucket_positions:
            v = self.input_storage[pos][0]
            if not isinstance(v, np.ndarray) or v.ndim == 0:
                # non-ndarray storage (sparse containers etc.) is outside
                # the padding contract
                return None, None
            lengths.add(int(v.shape[0]))
        if len(lengths) != 1:
            # inputs disagree on the batch length: not the batch-dim
            # pattern this policy covers — run unbucketed
            return None, None
        n = lengths.pop()
        b = bucket_for(n, policy)
        if b == n or n == 0:
            return None, None
        # padding WILL happen on this call: gate on the safety analysis
        # (raise / warn-and-skip / trust per config.shape_buckets_check)
        if not self._check_bucket_safety():
            return None, None
        for pos in self._bucket_positions:
            cell = self.input_storage[pos]
            cell[0] = pad_leading(np.asarray(cell[0]), b)
        return n, b

    def _check_bucket_safety(self):
        """Run the batch-axis safety analysis once per Function (VERDICT
        r3 item 3a): raise/warn when the compiled graph folds replicate-
        pad rows into real results.  Policy: config.shape_buckets_check."""
        if not self._bucket_safety_done:
            from aesara_tpu.compile.bucketing import batch_axis_safety

            tainted = [
                self.fgraph.inputs[pos] for pos in self._bucket_positions
                if pos < len(self.fgraph.inputs)
            ]
            try:
                self._bucket_safety_reason = batch_axis_safety(
                    self.fgraph, tainted
                )
            except Exception:
                self._bucket_safety_reason = (
                    "bucketing safety analysis failed on this graph; "
                    "treating as unsafe"
                )
            self._bucket_safety_done = True
        reason = self._bucket_safety_reason
        if reason is None:
            return True
        policy = config.shape_buckets_check
        if policy == "raise":
            from aesara_tpu.compile.bucketing import BucketingError

            raise BucketingError(reason)
        if policy == "warn":
            if not getattr(self, "_bucket_safety_warned", False):
                warnings.warn(reason + " — running unbucketed")
                self._bucket_safety_warned = True
            return False
        return True  # "off": user asserted safety

    def _pad_seq_to_bucket(self, policy):
        """Zero-pad each declared sequence axis up to the policy's bucket.
        Returns (true_len, bucket) when padding happened, else (None, None)."""
        from aesara_tpu.compile.bucketing import bucket_for, pad_axis_zero

        lengths = set()
        for pos, axis in self._bucket_seq_positions:
            v = self.input_storage[pos][0]
            if not isinstance(v, np.ndarray) or v.ndim <= axis:
                return None, None
            lengths.add(int(v.shape[axis]))
        if len(lengths) != 1:
            return None, None
        n = lengths.pop()
        b = bucket_for(n, policy)
        if b == n or n == 0:
            return None, None
        for pos, axis in self._bucket_seq_positions:
            cell = self.input_storage[pos]
            cell[0] = pad_axis_zero(cell[0], axis, b)
        return n, b

    def _seq_output_axes(self):
        """Per-output seq axis (or None), tracked through the graph by the
        same dataflow the safety analysis uses (compile/bucketing.py
        axis_taint) — never guessed from runtime sizes, so a batch axis
        that coincidentally equals the seq bucket is never mis-sliced."""
        if not hasattr(self, "_seq_out_axes"):
            from aesara_tpu.compile.bucketing import axis_taint

            seeds = {
                self.fgraph.inputs[pos]: axis
                for pos, axis in self._bucket_seq_positions
                if pos < len(self.fgraph.inputs)
            }
            try:
                taint = axis_taint(self.fgraph, seeds)
            except Exception:
                taint = {}
            axes = []
            for out in self.fgraph.outputs:
                ot = taint.get(out, frozenset())
                axes.append(next(iter(ot)) if len(ot) == 1 else None)
            self._seq_out_axes = axes
        return self._seq_out_axes

    @staticmethod
    def _slice_seq_axis(val, axis, n, b):
        """Slice the tracked sequence axis back to the true length."""
        if (
            val is None or axis is None or not hasattr(val, "shape")
            or len(val.shape) <= axis or int(val.shape[axis]) != b
        ):
            return val
        sl = [slice(None)] * len(val.shape)
        sl[axis] = slice(0, n)
        return val[tuple(sl)]

    @staticmethod
    def _slice_bucketed(val, var, n, b):
        """Slice a padded result back to the true batch length when its
        leading dim is dynamic and came back at the bucket size."""
        if (
            val is not None
            and getattr(var.type, "shape", (1,))[:1] == (None,)
            and hasattr(val, "shape")
            and len(val.shape) >= 1
            and int(val.shape[0]) == b
        ):
            return val[:n]
        return val

    def __call__(self, *args, output_subset=None, **kwargs):
        t0 = time.perf_counter()
        n_explicit = len(self.in_specs)
        if len(args) > n_explicit:
            raise TypeError(
                f"{self} takes {n_explicit} positional inputs, got {len(args)}"
            )
        # place positional args
        filled = [False] * n_explicit
        for i, a in enumerate(args):
            self._set_input(i, a)
            filled[i] = True
        for k, v in kwargs.items():
            if k not in self._name_to_pos:
                raise TypeError(f"unknown input name {k!r}")
            pos = self._name_to_pos[k]
            if filled[pos]:
                raise TypeError(f"input {k!r} given twice")
            self._set_input(pos, v)
            filled[pos] = True
        for i, done in enumerate(filled):
            if not done:
                spec = self.in_specs[i]
                if i in self._in_state:
                    # In(update=...): carried state from the last call
                    self._set_input(i, self._in_state[i])
                elif spec.value is not None:
                    self._set_input(i, spec.value)
                else:
                    raise TypeError(f"missing input {spec.variable}")

        bkt_n = bkt_b = None
        seq_n = seq_b = None
        # bucketing exists to bound XLA recompiles; per-node py/cvm paths
        # run any shape natively and must see the true arrays
        if (
            (self._bucket_positions or self._bucket_seq_positions)
            and getattr(self.fn, "jit_fn", None) is not None
        ):
            from aesara_tpu.compile.bucketing import parse_buckets

            policy = parse_buckets(config.shape_buckets)
            if policy is not None:
                if self._bucket_positions:
                    bkt_n, bkt_b = self._pad_to_bucket(policy)
                if self._bucket_seq_positions:
                    seq_n, seq_b = self._pad_seq_to_bucket(policy)

        ran_subset = False
        if output_subset is not None:
            ran_subset = self._run_output_subset(output_subset)
        if not ran_subset:
            self.fn()

        # write updates back into shared containers
        for ui, (shared, _) in enumerate(self.update_pairs):
            new_val = self.output_storage[self.n_user_outputs + ui][0]
            shared.container.storage[0] = new_val
        # In(update=...): the new value feeds the input on the next call
        for pos, sidx in self.input_update_info:
            sval = self.output_storage[sidx][0]
            if bkt_n is not None:
                sval = self._slice_bucketed(
                    sval, self.fgraph.outputs[sidx], bkt_n, bkt_b)
            self._in_state[pos] = sval

        wanted = (set(output_subset) if output_subset is not None
                  else set(range(self.n_user_outputs)))
        outs = [cell[0] for cell in self.output_storage[: self.n_user_outputs]]
        if bkt_n is not None:
            outs = [
                self._slice_bucketed(o, var, bkt_n, bkt_b)
                for o, var in zip(outs, self.fgraph.outputs)
            ]
        if seq_n is not None:
            outs = [
                self._slice_seq_axis(o, ax, seq_n, seq_b)
                for o, ax in zip(outs, self._seq_output_axes())
            ]
        specs = self.out_specs or [None] * len(outs)
        outs = [
            (o if (sp is not None and getattr(sp, "borrow", False))
             else self._to_host(o)) if i in wanted else None
            for i, (o, sp) in enumerate(zip(outs, specs))
        ]
        self.call_time += time.perf_counter() - t0
        self.n_calls += 1
        if self.profile is not None:
            # ProfileLinker.run already counts calls on the per-node py
            # path; only count here when some other linker ran
            if self.profile.fct_callcount < self.n_calls:
                self.profile.fct_callcount += 1
            self.profile.fct_call_time = self.call_time
        if output_subset is not None:
            # reference semantics: return only the requested outputs
            return [outs[i] for i in output_subset]
        if self.n_user_outputs == 0:
            return [] if not self.single_output else None
        if self.single_output:
            return outs[0]
        return outs

    def _run_output_subset(self, output_subset) -> bool:
        """Demand-driven evaluation of only the requested outputs through
        the C++ VM's run_subset (reference Stack VM partial eval,
        ``link/vm.py:423``).  Update expressions always run.  Returns
        False when this Function's thunk has no lazy VM (whole-graph
        XLA/py paths just run everything)."""
        vm = getattr(self.fn, "vm", None)
        order = getattr(self.fn, "order", None)
        if vm is None or order is None or not hasattr(vm, "run_subset"):
            return False
        pos = {id(n): i for i, n in enumerate(order)}
        targets = []
        outs = self.fgraph.outputs
        wanted = list(output_subset) + list(
            range(self.n_user_outputs, len(outs))
        )  # updates always run
        for i in wanted:
            owner = outs[i].owner
            if owner is not None:
                idx = pos.get(id(owner))
                if idx is None:
                    return False  # replaced graph: fall back to full run
                targets.append(idx)
        vm.run_subset(tuple(targets))
        return True

    @staticmethod
    def _to_host(o):
        # results come back as jax Arrays on the XLA path; expose ndarray
        # semantics to the caller (the reference returns ndarrays)
        if o is None or isinstance(o, (np.ndarray, np.generic)):
            return o
        import scipy.sparse as _sp

        if _sp.issparse(o):
            return o  # sparse outputs stay scipy containers (reference)
        try:
            return np.asarray(o)
        except Exception:
            return o

    def _set_input(self, pos, value):
        spec = self.in_specs[pos]
        cell = self.input_storage[pos]
        if self.trust_input:
            cell[0] = value
            return
        cell[0] = spec.variable.type.filter(
            value, strict=spec.strict, allow_downcast=spec.allow_downcast
        )

    def copy(self, share_memory=False, swap=None, delete_updates=False, name=None):
        """Recompile this function, optionally swapping shared variables
        (reference ``types.py`` Function.copy)."""
        from aesara_tpu.graph.ir import clone_replace

        r = self._recipe
        swap = dict(swap or {})
        shared_vars = []
        replace = {}
        for sv in r["shared_vars"]:
            if sv in swap:
                new_sv = swap[sv]
            elif share_memory:
                new_sv = sv
            else:
                # deep-copy the value: sharing the buffer would let one
                # function's donated update delete the other's state
                val = sv.container.storage[0]
                val = np.asarray(val).copy() if val is not None else None
                new_sv = sv.clone()
                new_sv.container = type(sv.container)(
                    sv.container.type, [val], name=sv.name
                )
            shared_vars.append(new_sv)
            if new_sv is not sv:
                replace[sv] = new_sv
        out_vars = r["out_vars"]
        update_pairs = [] if delete_updates else list(r["update_pairs"])
        if replace:
            n_out = len(out_vars)
            roots = list(out_vars) + [e for _, e in update_pairs]
            cloned = clone_replace(roots, replace=replace) if roots else []
            out_vars = cloned[:n_out]
            update_pairs = [
                (replace.get(k, k), e)
                for (k, _), e in zip(update_pairs, cloned[n_out:])
            ]
        return orig_function(
            r["in_specs"], out_vars, shared_vars, update_pairs,
            r["single_output"], mode=r["mode"], name=name or r["name"],
        )

    def __reduce__(self):
        """Pickle by recipe: the symbolic graph + shared values travel;
        the jitted executable is rebuilt on load (reference
        ``types.py:1111`` _pickle_Function; rewrites re-run on unpickle,
        config.reoptimize_unpickled_function semantics)."""
        from aesara_tpu.config import config

        if not config.unpickle_function:
            raise RuntimeError("Function pickling disabled by config")
        r = self._recipe
        return (
            _rebuild_function,
            (
                r["in_specs"], r["out_vars"], r["shared_vars"],
                r["update_pairs"], r["single_output"],
                getattr(r["mode"], "provided_linker", "jax"),
                getattr(r["mode"], "provided_optimizer", "fast_run"),
                r["name"],
            ),
        )

    def dprint(self, **kwargs):
        from aesara_tpu.printing import debugprint

        return debugprint(self, **kwargs)

    @property
    def outputs(self):
        return self.fgraph.outputs[: self.n_user_outputs]

    @property
    def inputs(self):
        return self.fgraph.inputs

    def get_shared(self):
        return list(self.shared_vars)

    def __str__(self):
        return f"Function({self.name or 'unnamed'})"


def function_dump(filename, *args, **kwargs):
    """Serialize the arguments of a ``function`` call for bug reports
    (reference ``compile/function/__init__.py:15``)."""
    import pickle

    with open(filename, "wb") as f:
        pickle.dump({"args": args, "kwargs": kwargs}, f)


def _rebuild_function(in_specs, out_vars, shared_vars, update_pairs,
                      single_output, linker, optimizer, name):
    mode = Mode(linker, optimizer)
    return orig_function(
        in_specs, out_vars, shared_vars, update_pairs, single_output,
        mode=mode, name=name,
    )


# Reference layout parity: the reference splits this module into the
# package ``compile/function/{__init__,types,pfunc}.py``; register the
# ``...compile.function.types`` path so
# ``from aesara_tpu.compile.function.types import Function`` resolves.
# (The ``pfunc`` path is NOT aliased: the import machinery would rebind
# this module's ``pfunc`` attribute — the function — to a module.)
import sys as _sys

_sys.modules[__name__ + ".types"] = _sys.modules[__name__]
types = _sys.modules[__name__]
