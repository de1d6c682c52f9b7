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


def fgraph_to_jax(fgraph) -> Callable:
    """Compose per-node ``jax_funcify`` callables into one function over
    the fgraph inputs (the reference's ``fgraph_to_python``
    ``link/utils.py:673``, without source-string generation)."""
    import jax
    import jax.numpy as jnp

    from aesara_tpu.link.jax.dispatch import NoLoweringError, _jax_dtype, jax_funcify, jax_typify
    from aesara_tpu.utils import MethodNotDefined

    order = fgraph.toposort()
    node_fns = [jax_funcify(node.op, node=node) for node in order]

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

    def run(*args):
        env = {}
        for var, val in zip(fgraph.inputs, args):
            env[var] = val

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

        for node, fn, foldable in zip(order, node_fns, fold_ok):
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
            if vals is None:
                vals = fn(*ins)
                if not isinstance(vals, (tuple, list)):
                    vals = (vals,)
            for o, v in zip(node.outputs, vals):
                dt = getattr(o.type, "dtype", None)
                if dt is not None and hasattr(v, "astype"):
                    # without x64 (TPU), 64-bit dtypes canonicalize to 32
                    want = jax.dtypes.canonicalize_dtype(_jax_dtype(dt))
                    if v.dtype != want:
                        v = v.astype(want)
                env[o] = v
        return tuple(
            jnp.asarray(value_of(o))
            if getattr(o.type, "dtype", None) is not None
            else value_of(o)
            for o in fgraph.outputs
        )

    return run


class JAXLinker(Linker):
    """Whole-graph XLA linker.

    make_thunk returns (fn, input_containers, output_containers) where fn
    moves inputs device-side, runs the jitted program and fills output
    storage with host-accessible results (device arrays; converted lazily).
    """

    def __init__(self, allow_gc=None, use_jit: Optional[bool] = None,
                 donate_updated: Optional[bool] = None):
        super().__init__(allow_gc)
        self.use_jit = use_jit
        self.donate_updated = donate_updated

    #: process-wide memo: canonical graph key → jitted callable
    _compiled_cache: dict = {}

    def _py_fallback(self, input_storage, output_storage, storage_map, why):
        """Degrade this graph to the py path (reference boundary: the
        JAX backend cannot take scipy sparse containers across jit)."""
        import warnings

        from aesara_tpu.link.basic import PerformLinker

        warnings.warn(
            f"graph runs on the py path instead of XLA: {why}",
            stacklevel=2,
        )
        sub = PerformLinker(allow_gc=self.allow_gc)
        sub.fgraph = self.fgraph
        return sub.make_thunk(input_storage, output_storage, storage_map)

    def make_thunk(self, input_storage=None, output_storage=None, storage_map=None):
        import jax

        from aesara_tpu.link.jax.dispatch import NoLoweringError

        fgraph = self.fgraph

        # sparse function inputs/outputs are scipy containers — not jax
        # types; those graphs execute per-node in python (the reference's
        # JAX backend has the same boundary)
        from aesara_tpu.sparse.basic import SparseTensorType

        sparse_io = [
            v for v in list(fgraph.inputs) + list(fgraph.outputs)
            if isinstance(v.type, SparseTensorType)
        ]
        if sparse_io:
            return self._py_fallback(
                input_storage, output_storage, storage_map,
                f"sparse function inputs/outputs {[str(v) for v in sparse_io[:3]]}",
            )

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
            donate_argnums = tuple(sorted(set(update_map.values())))

        fn = None
        cache_key = None
        if use_jit:
            # reuse compiled programs across identical graphs (the
            # cmodule_key role, link/c/basic.py:1208)
            try:
                from aesara_tpu.link.cache import fgraph_key

                cache_key = (fgraph_key(fgraph), donate_argnums)
            except Exception:
                cache_key = None
            if cache_key is not None and cache_key in self._compiled_cache:
                compiled = self._compiled_cache[cache_key]
            else:
                try:
                    fn = fgraph_to_jax(fgraph)
                except NoLoweringError as e:
                    return self._py_fallback(
                        input_storage, output_storage, storage_map, str(e)
                    )
                compiled = jax.jit(fn, donate_argnums=donate_argnums)
                if cache_key is not None:
                    self._compiled_cache[cache_key] = compiled
        else:
            try:
                fn = fgraph_to_jax(fgraph)
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

        def thunk():
            # move host arrays onto the device once and keep the resident
            # buffer in the storage cell: shared variables then live in HBM
            # across calls instead of re-transferring every step
            args = []
            for cell in input_storage:
                v = cell[0]
                if isinstance(v, (np.ndarray, np.generic)):
                    v = jax.device_put(v)
                    cell[0] = v
                args.append(v)
            results = compiled(*args)
            for cell, res in zip(output_storage, results):
                cell[0] = res

        thunk.inputs = input_storage
        thunk.outputs = output_storage
        thunk.jit_fn = compiled
        thunk.raw_fn = fn
        return thunk, input_containers, output_containers


class JAXNoJitLinker(JAXLinker):
    """Eager op-by-op jax execution (debugging aid)."""

    def __init__(self, allow_gc=None):
        super().__init__(allow_gc, use_jit=False)
