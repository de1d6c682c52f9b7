"""The XLA backend: lower a whole FunctionGraph to ONE jitted program.

This replaces the reference's per-node C thunks + host VM
(``lazylinker_c.c``) with the JITLinker pattern (``link/basic.py:580`` +
``link/jax/linker.py:10``): the graph becomes a single Python closure
emitting jax ops per node, wrapped in ``jax.jit``.  Shared variables are
passed as leading arguments and (when updated) donated, giving the
reference's in-place update semantics without aliasing hazards
(SURVEY §7 stage 4).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.graph.ir import Constant, Variable
from aesara_tpu.link.basic import Container, Linker, raise_with_op

import re as _re

_SCOPE_BAD = _re.compile(r"[^A-Za-z0-9_.-]+")


def _scope_name(node_idx: int, node) -> str:
    """HLO-safe scope carrying the toposort index + op identity; the
    ``n<idx>.`` prefix is what ``profile_attr`` greps back out of
    ``op_name`` metadata."""
    label = type(node.op).__name__
    sub = getattr(node.op, "scalar_op", None)
    if sub is not None:
        label += "_" + type(sub).__name__
    return f"n{node_idx}.{_SCOPE_BAD.sub('_', label)[:48]}"


def fgraph_to_jax(fgraph, guard=None, for_jit=True) -> Callable:
    """Compose per-node ``jax_funcify`` callables into one function over
    the fgraph inputs (the reference's ``fgraph_to_python``
    ``link/utils.py:673``, without source-string generation).

    ``guard=(nan, inf, big)`` threads a NaN/Inf/big-value check through
    the SINGLE jitted program at every node boundary (SURVEY §7 stage 8:
    the jit-path NanGuard): the returned function then yields two extra
    trailing outputs — an int32 violation code (0 ok, 1 NaN, 2 Inf,
    3 big) and the toposort index of the FIRST offending node.  Unlike
    the eager per-node ``NanGuardLinker``, this sees the program the
    user actually ships: post-rewrite, fused, donated."""
    import jax
    import jax.numpy as jnp

    from aesara_tpu.link.jax.dispatch import NoLoweringError, _jax_dtype, jax_funcify, jax_typify
    from aesara_tpu.utils import MethodNotDefined

    order = fgraph.toposort()
    # for_jit=False (the eager JAXLinker path) relaxes trace-time-only
    # constraints: a data-dependent Scan n_steps is CONCRETE when the
    # program is not jitted, so the funcify must not reject it there
    node_fns = [jax_funcify(node.op, node=node, for_jit=for_jit)
                for node in order]

    def _violation(val):
        """int32 code for one node output (0 ok / 1 nan / 2 inf / 3 big)."""
        nan_e, inf_e, big_e = guard
        if type(val).__name__ == "BCOO":
            # sparse value: check the stored data leaf
            val = val.data
        a = jnp.asarray(val)
        if not (jnp.issubdtype(a.dtype, jnp.floating)
                or jnp.issubdtype(a.dtype, jnp.complexfloating)):
            return None
        code = jnp.int32(0)
        af = a.astype("float32") if a.dtype == jnp.bfloat16 else a
        if big_e:
            finite_big = jnp.any(
                jnp.where(jnp.isfinite(af), jnp.abs(af), 0.0) > 1e10)
            code = jnp.where(finite_big, jnp.int32(3), code)
        if inf_e:
            code = jnp.where(jnp.any(jnp.isinf(af)), jnp.int32(2), code)
        if nan_e:
            code = jnp.where(jnp.any(jnp.isnan(af)), jnp.int32(1), code)
        return code

    # trace-time constant folding: a node whose inputs are all concrete
    # (no jax Tracer) is evaluated eagerly with its NumPy ``perform``.
    # This keeps shape arithmetic (Shape → MakeVector → Reshape chains)
    # concrete under jit, which XLA's static-shape model requires
    # (SURVEY §7 "hard parts" (a)).
    def can_fold(node):
        try:
            if not node.op.do_constant_folding(fgraph, node):
                return False
        except Exception:
            pass
        return not getattr(node.op, "jax_never_fold", False)

    fold_ok = [can_fold(node) for node in order]

    constant_cache = {}

    def const_val(var):
        if var not in constant_cache:
            constant_cache[var] = var.data
        return constant_cache[var]

    def _np_violation(val):
        """Host-side check for trace-time-folded constants."""
        nan_e, inf_e, big_e = guard
        a = np.asarray(val)
        if a.dtype.kind not in "fc":
            return 0
        if nan_e and np.isnan(a).any():
            return 1
        if inf_e and np.isinf(a).any():
            return 2
        if big_e and a.size:
            finite = a[np.isfinite(a)]
            if finite.size and np.max(np.abs(finite)) > 1e10:
                return 3
        return 0

    def run(*args):
        env = {}
        err_code = err_node = None
        if guard is not None:
            err_code = jnp.int32(0)
            err_node = jnp.int32(-2)  # -2 = none; -1 = a graph input

        def note(code, idx):
            nonlocal err_code, err_node
            if code is None:
                return
            hit = (err_code == 0) & (code > 0)
            err_node = jnp.where(hit, jnp.int32(idx), err_node)
            err_code = jnp.where(hit, code, err_code)

        for var, val in zip(fgraph.inputs, args):
            env[var] = val
            if guard is not None and getattr(var.type, "dtype", None) is not None:
                note(_violation(val), -1)

        def value_of(var):
            if var in env:
                return env[var]
            if isinstance(var, Constant):
                return const_val(var)
            raise ValueError(f"uncomputed variable {var}")

        def _is_concrete(a):
            # a BCOO (or any pytree container) wrapping Tracers is not a
            # Tracer instance itself — check the leaves
            return not any(
                isinstance(leaf, jax.core.Tracer)
                for leaf in jax.tree_util.tree_leaves(a)
            )

        for node_idx, (node, fn, foldable) in enumerate(
            zip(order, node_fns, fold_ok)
        ):
            ins = [value_of(i) for i in node.inputs]
            vals = None
            if foldable and all(_is_concrete(a) for a in ins):
                storage = [[None] for _ in node.outputs]
                try:
                    node.op.perform(node, [np.asarray(a) for a in ins], storage)
                    vals = tuple(s[0] for s in storage)
                except (MethodNotDefined, NotImplementedError, TypeError,
                        ValueError, AttributeError):
                    vals = None
                if vals is not None and guard is not None:
                    for v in vals:
                        code = _np_violation(v)
                        if code:
                            note(jnp.int32(code), node_idx)
            if vals is None:
                # thread the Apply identity into HLO op_metadata so a
                # device profile maps back to graph nodes (reference
                # per-Apply ProfileStats, compile/profiling.py:185; the
                # attribution reader is link/jax/profile_attr.py)
                with jax.named_scope(_scope_name(node_idx, node)):
                    vals = fn(*ins)
                if not isinstance(vals, (tuple, list)):
                    vals = (vals,)
                if guard is not None:
                    for o, v in zip(node.outputs, vals):
                        if getattr(o.type, "dtype", None) is not None:
                            note(_violation(v), node_idx)
            for o, v in zip(node.outputs, vals):
                dt = getattr(o.type, "dtype", None)
                if dt is not None and hasattr(v, "astype"):
                    # without x64 (TPU), 64-bit dtypes canonicalize to 32
                    want = jax.dtypes.canonicalize_dtype(_jax_dtype(dt))
                    if v.dtype != want:
                        v = v.astype(want)
                env[o] = v
        def _as_result(o):
            v = value_of(o)
            if type(v).__name__ == "BCOO":
                return v  # sparse output: leave as BCOO (thunk converts)
            if getattr(o.type, "dtype", None) is not None:
                return jnp.asarray(v)
            return v

        results = tuple(_as_result(o) for o in fgraph.outputs)
        if guard is not None:
            return results + (err_code, err_node)
        return results

    return run


class JAXLinker(Linker):
    """Whole-graph XLA linker.

    make_thunk returns (fn, input_containers, output_containers) where fn
    moves inputs device-side, runs the jitted program and fills output
    storage with host-accessible results (device arrays; converted lazily).
    """

    def __init__(self, allow_gc=None, use_jit: Optional[bool] = None,
                 donate_updated: Optional[bool] = None,
                 nan_guard: Optional[tuple] = None):
        super().__init__(allow_gc)
        self.use_jit = use_jit
        self.donate_updated = donate_updated
        #: (nan_is_error, inf_is_error, big_is_error) or None — when set,
        #: every node boundary inside the jitted program is checked
        self.nan_guard = nan_guard

    #: process-wide memo: canonical graph key → jitted callable
    _compiled_cache: dict = {}

    def _py_fallback(self, input_storage, output_storage, storage_map, why):
        """Degrade this graph to the py path (reference boundary: the
        JAX backend cannot take scipy sparse containers across jit).
        A nan-guarded linker degrades to the eager per-node guard so the
        checking contract survives the fallback."""
        import warnings

        from aesara_tpu.link.basic import PerformLinker

        warnings.warn(
            f"graph runs on the py path instead of XLA: {why}",
            stacklevel=2,
        )
        if self.nan_guard is not None:
            from aesara_tpu.compile.nanguardmode import NanGuardLinker

            sub = NanGuardLinker(*self.nan_guard)
        else:
            sub = PerformLinker(allow_gc=self.allow_gc)
        sub.fgraph = self.fgraph
        return sub.make_thunk(input_storage, output_storage, storage_map)

    def make_thunk(self, input_storage=None, output_storage=None, storage_map=None):
        import jax

        from aesara_tpu.link.jax.dispatch import NoLoweringError

        fgraph = self.fgraph

        # sparse function inputs/outputs are scipy containers — not jax
        # types.  The thunk bridges them: scipy → BCOO (device-resident,
        # memoized per container object) on the way in, BCOO → scipy on
        # the way out, so sparse-data graphs still run as ONE jitted XLA
        # program (the reference's JAX backend py-falls-back here; doing
        # so costs ~170x on the sparse-GLM BASELINE config)
        from aesara_tpu.sparse.basic import SparseTensorType

        sparse_in_flags = [
            isinstance(v.type, SparseTensorType) for v in fgraph.inputs
        ]
        sparse_out_fmts = [
            getattr(v.type, "format", "csr")
            if isinstance(v.type, SparseTensorType) else None
            for v in fgraph.outputs
        ]
        any_sparse_in = any(sparse_in_flags)
        any_sparse_out = any(f is not None for f in sparse_out_fmts)

        # densify plan: a sparse input whose whole sparse cone tolerates
        # dense values bridges as ONE host-side densify + MXU compute
        # instead of per-call BCOO scatter work (slow on TPU); the size
        # gate is applied per call in _sparse_to_device
        densify_ok = [False] * len(fgraph.inputs)
        if any_sparse_in and config.sparse_densify == "auto":
            from aesara_tpu.link.jax.sparse_dispatch import densifiable_inputs

            densify_ok = densifiable_inputs(fgraph)

        # BSS plan: a sparse input whose cone is pure structured_dot/
        # usmm/transpose work bridges in the blocked-segment-slot layout
        # and runs the Pallas SpMV kernel (8.7x the densified matvec at
        # density 0.01 — link/jax/bss.py); the value-side occupancy gate
        # is applied per call in _sparse_to_device
        bss_plan = [None] * len(fgraph.inputs)
        if any_sparse_in and config.sparse_bss == "auto":
            from aesara_tpu.link.jax.sparse_dispatch import bss_inputs

            bss_plan = bss_inputs(fgraph)

        use_jit = self.use_jit if self.use_jit is not None else config.jax_jit
        donate = (
            self.donate_updated
            if self.donate_updated is not None
            else config.jax_donate_shared
        )

        donate_argnums = ()
        update_map = fgraph.update_mapping or {}
        if use_jit and donate and update_map:
            # donate inputs that are overwritten by an update output,
            # giving in-place semantics for shared buffers on device
            # (sparse inputs excluded: BCOO buffer shapes can change
            # between calls, so donation gives no stable aliasing)
            donate_argnums = tuple(
                i for i in sorted(set(update_map.values()))
                if not sparse_in_flags[i]
            )

        guard = self.nan_guard
        fn = None
        cache_key = None
        if use_jit:
            # reuse compiled programs across identical graphs (the
            # cmodule_key role, link/c/basic.py:1208)
            try:
                from aesara_tpu.link.cache import fgraph_key

                cache_key = (fgraph_key(fgraph), donate_argnums, guard)
            except Exception:
                cache_key = None
            if cache_key is not None and cache_key in self._compiled_cache:
                compiled = self._compiled_cache[cache_key]
            else:
                try:
                    fn = fgraph_to_jax(fgraph, guard=guard)
                except NoLoweringError as e:
                    return self._py_fallback(
                        input_storage, output_storage, storage_map, str(e)
                    )
                compiled = jax.jit(fn, donate_argnums=donate_argnums)
                if cache_key is not None:
                    self._compiled_cache[cache_key] = compiled
        else:
            try:
                fn = fgraph_to_jax(fgraph, guard=guard, for_jit=False)
            except NoLoweringError as e:
                return self._py_fallback(
                    input_storage, output_storage, storage_map, str(e)
                )
            compiled = fn

        if input_storage is None:
            input_storage = [[None] for _ in fgraph.inputs]
        if output_storage is None:
            output_storage = [[None] for _ in fgraph.outputs]

        input_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.inputs, input_storage)
        ]
        output_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.outputs, output_storage)
        ]

        guard_order = fgraph.toposort() if guard is not None else None

        # scipy→BCOO conversions are memoized on the container object so
        # the device copy persists across calls (the dense analogue keeps
        # the jax array in the cell; sparse cells keep the scipy object —
        # user-visible via get_value — and the BCOO twin lives here)
        bcoo_memo: dict = {}

        def _sparse_to_device(pos, v):
            import scipy.sparse as sps

            if not sps.issparse(v):
                return v
            hit = bcoo_memo.get(pos)
            if hit is not None and hit[0] is v:
                return hit[1]
            if bss_plan[pos] is not None:
                from aesara_tpu.link.jax.bss import bss_eligible, csr_to_bss

                if bss_eligible(v):
                    b = csr_to_bss(
                        v, with_transpose=bss_plan[pos]["transpose"]
                    )
                    bcoo_memo[pos] = (v, b)
                    return b
            if (
                densify_ok[pos]
                and (v.shape[0] * v.shape[1] * v.dtype.itemsize)
                <= config.sparse_densify_max_mb * 2**20
            ):
                b = jax.device_put(v.toarray())
                bcoo_memo[pos] = (v, b)
                return b
            from jax.experimental import sparse as jsparse

            coo = v.tocoo()
            indices = jnp_stack_indices(coo)
            b = jsparse.BCOO(
                (jax.device_put(coo.data), indices), shape=v.shape
            )
            bcoo_memo[pos] = (v, b)
            return b

        def jnp_stack_indices(coo):
            import jax.numpy as jnp

            return jnp.stack(
                [jnp.asarray(coo.row, jnp.int32), jnp.asarray(coo.col, jnp.int32)],
                axis=1,
            )

        def _bcoo_to_scipy(res, fmt):
            import scipy.sparse as sps

            if type(res).__name__ != "BCOO":
                return res
            ind = np.asarray(res.indices)
            mat = sps.coo_matrix(
                (np.asarray(res.data), (ind[:, 0], ind[:, 1])),
                shape=tuple(int(s) for s in res.shape),
            )
            return mat.asformat(fmt or "csr")

        def thunk():
            # move host arrays onto the device once and keep the resident
            # buffer in the storage cell: shared variables then live in HBM
            # across calls instead of re-transferring every step
            args = []
            for pos, (flag, cell) in enumerate(zip(sparse_in_flags, input_storage)):
                v = cell[0]
                if flag:
                    v = _sparse_to_device(pos, v)
                elif isinstance(v, (np.ndarray, np.generic)):
                    v = jax.device_put(v)
                    cell[0] = v
                args.append(v)
            # kept for post-hoc HLO attribution (profile_attr.attribute
            # re-lowers the jitted program with these example args)
            thunk.last_args = args
            results = compiled(*args)
            if guard is not None:
                *results, err_code, err_node = results
                code = int(err_code)  # host sync: the guard's cost
                if code:
                    from aesara_tpu.compile.nanguardmode import NanGuardError

                    kind = {1: "NaN", 2: "Inf", 3: "big value (>1e10)"}[code]
                    idx = int(err_node)
                    where = (
                        "a function input" if idx == -1
                        else f"an output of node {guard_order[idx]} "
                             f"(toposort index {idx})"
                    )
                    raise NanGuardError(
                        f"NanGuardMode (jit path) found {kind} in {where}\n"
                        "The check ran INSIDE the single rewritten+fused "
                        "XLA program (post-donation), at every node "
                        "boundary of the optimized graph."
                    )
            for fmt, cell, res in zip(sparse_out_fmts, output_storage, results):
                cell[0] = _bcoo_to_scipy(res, fmt) if fmt is not None else res

        thunk.inputs = input_storage
        thunk.outputs = output_storage
        thunk.jit_fn = compiled
        thunk.raw_fn = fn
        thunk.sparse_plan = tuple(
            ("bss" if bss_plan[i] is not None
             else "dense" if densify_ok[i] else "bcoo") if f else None
            for i, f in enumerate(sparse_in_flags)
        )
        return thunk, input_containers, output_containers


class JAXNoJitLinker(JAXLinker):
    """Eager op-by-op jax execution (debugging aid)."""

    def __init__(self, allow_gc=None):
        super().__init__(allow_gc, use_jit=False)
