"""Linker contracts and the Python (oracle) linker.

Re-design of the reference's ``aesara/link/basic.py`` (Container:39,
Linker:153, LocalLinker:240, PerformLinker:285) and ``link/utils.py``
(map_storage:46, streamline:150, raise_with_op:270).  The whole-graph JIT
path (the reference's ``JITLinker`` ``link/basic.py:580``) lives in
``aesara_tpu.link.jax.linker``.
"""

from __future__ import annotations

import sys
import traceback
from typing import Any, Callable, List, Optional, Sequence, Tuple

from aesara_tpu.config import config
from aesara_tpu.graph.ir import Constant, Variable
from aesara_tpu.utils import MethodNotDefined


__all__ = ["Container", "Linker", "LocalLinker", "PerformLinker", "WrapLinker", "raise_with_op"]


class Container:
    """A typed storage cell (reference ``link/basic.py:39``).  On the XLA
    path, shared-variable containers hold device buffers between calls."""

    def __init__(self, type, storage: list, readonly: bool = False, strict: bool = False,
                 allow_downcast=None, name: Optional[str] = None):
        self.type = type
        self.storage = storage
        self.readonly = readonly
        self.strict = strict
        self.allow_downcast = allow_downcast
        self.name = name

    @property
    def data(self):
        return self.storage[0]

    @data.setter
    def data(self, value):
        if self.readonly:
            raise Exception(f"Container {self.name} is readonly")
        if value is None:
            self.storage[0] = None
            return
        self.storage[0] = self.type.filter(
            value, strict=self.strict, allow_downcast=self.allow_downcast
        )

    value = data

    def __str__(self):
        return f"<Container {self.storage[0]!r}>"

    def __repr__(self):
        return str(self)

    def __getstate__(self):
        # device buffers serialize as host arrays (donation-safe)
        d = self.__dict__.copy()
        val = self.storage[0]
        if val is not None and not isinstance(val, (int, float, list, dict, str)):
            try:
                import numpy as _np

                val = _np.asarray(val).copy()
            except Exception:
                pass
        d["storage"] = [val]
        return d


def raise_with_op(fgraph, node, thunk=None, exc_info=None):
    """Re-raise the current exception annotated with the failing node and
    the user traceback of its outputs (reference ``link/utils.py:270``)."""
    exc_type, exc_value, exc_trace = exc_info or sys.exc_info()
    if exc_value is None:
        raise RuntimeError("raise_with_op called without an active exception")
    detail = [f"\nApply node that caused the error: {node}"]
    try:
        idx = fgraph.toposort().index(node)
        detail.append(f"Toposort index: {idx}")
    except Exception:
        pass
    detail.append(f"Inputs types: {[getattr(i, 'type', None) for i in node.inputs]}")
    trace = getattr(node.outputs[0].tag, "trace", None)
    if trace:
        detail.append("Variable created at (use exception_verbosity=high for more):")
        for frames in trace[-1:]:
            for f in frames:
                fname, lineno, name = (
                    (f.filename, f.lineno, f.name) if hasattr(f, "filename") else f
                )
                detail.append(f"  {fname}:{lineno} in {name}")
    exc_value.args = exc_value.args + tuple(["\n".join(detail)])
    raise exc_value.with_traceback(exc_trace)


class Linker:
    """Backend contract (reference ``link/basic.py:153``)."""

    def __init__(self, allow_gc: Optional[bool] = None):
        self._allow_gc = allow_gc
        self.fgraph = None

    @property
    def allow_gc(self):
        if self._allow_gc is None:
            return config.allow_gc
        return self._allow_gc

    def accept(self, fgraph, no_recycling=None, profile=None):
        self.fgraph = fgraph
        self.no_recycling = no_recycling or []
        self.profile = profile
        return self

    def make_thunk(self, input_storage=None, output_storage=None, storage_map=None):
        """Return (callable, input_containers, output_containers)."""
        raise NotImplementedError

    def clone(self, allow_gc=None):
        import copy

        new = copy.copy(self)
        new.fgraph = None
        if allow_gc is not None:
            new._allow_gc = allow_gc
        return new


def map_storage(fgraph, order, input_storage=None, output_storage=None, storage_map=None):
    """Build the variable → storage-cell map (reference ``link/utils.py:46``)."""
    if storage_map is None:
        storage_map = {}
    if input_storage is None:
        input_storage = [storage_map.setdefault(v, [None]) for v in fgraph.inputs]
    else:
        for v, s in zip(fgraph.inputs, input_storage):
            storage_map[v] = s
    for var in fgraph.variables:
        if isinstance(var, Constant):
            storage_map.setdefault(var, [var.data])
        else:
            storage_map.setdefault(var, [None])
    if output_storage is None:
        output_storage = [storage_map[v] for v in fgraph.outputs]
    else:
        for v, s in zip(fgraph.outputs, output_storage):
            storage_map[v] = s
    return input_storage, output_storage, storage_map


class LocalLinker(Linker):
    """Linker producing per-node thunks (reference ``link/basic.py:240``)."""

    def make_thunk(self, input_storage=None, output_storage=None, storage_map=None):
        return self.make_all(input_storage, output_storage, storage_map)[:3]

    def make_all(self, input_storage=None, output_storage=None, storage_map=None):
        raise NotImplementedError


class PerformLinker(LocalLinker):
    """Pure-Python oracle backend: one ``Op.perform`` thunk per node
    (reference ``link/basic.py:285``).  This is the differential-testing
    reference implementation, never the production path.

    ``schedule``: optional ``fgraph -> [Apply]`` refining the toposort
    (reference linkers' scheduler hook) — e.g.
    ``graph.sched.sort_schedule_fn(*tensor.io.mpi_cmps)`` orders MPI
    sends/recvs early and waits late, the cross-rank deadlock-avoidance
    pattern."""

    def __init__(self, allow_gc=None, schedule=None):
        super().__init__(allow_gc=allow_gc)
        self.schedule = schedule

    def make_all(self, input_storage=None, output_storage=None, storage_map=None):
        fgraph = self.fgraph
        order = self.schedule(fgraph) if self.schedule else fgraph.toposort()
        input_storage, output_storage, storage_map = map_storage(
            fgraph, order, input_storage, output_storage, storage_map
        )
        compute_map = {v: [False] for v in storage_map}

        thunks = []
        for node in order:
            thunk = node.op.make_py_thunk(node, storage_map, compute_map, [])
            thunk.node = node
            thunks.append(thunk)

        # gc bookkeeping: last use of each intermediate
        dependencies = {}
        if self.allow_gc:
            last_user = {}
            for i, node in enumerate(order):
                for inp in node.inputs:
                    last_user[inp] = i
            post_thunk_clear = []
            protected = set(fgraph.inputs) | set(fgraph.outputs)
            for i, node in enumerate(order):
                clear = [
                    storage_map[inp]
                    for inp in node.inputs
                    if inp not in protected
                    and not isinstance(inp, Constant)
                    and last_user.get(inp) == i
                ]
                post_thunk_clear.append(clear)
        else:
            post_thunk_clear = [[] for _ in order]

        input_containers = [
            Container(v.type, s, name=v.name) for v, s in zip(fgraph.inputs, input_storage)
        ]
        output_containers = [
            Container(v.type, s, name=v.name) for v, s in zip(fgraph.outputs, output_storage)
        ]

        def run():
            for thunk, clears in zip(thunks, post_thunk_clear):
                try:
                    thunk()
                except Exception:
                    raise_with_op(fgraph, thunk.node, thunk)
                for cell in clears:
                    cell[0] = None

        run.thunks = thunks
        run.order = order
        run.storage_map = storage_map
        run.allow_gc = self.allow_gc
        return (run, input_containers, output_containers, thunks, order)


class WrapLinker(Linker):
    """Wrap another linker's thunks for instrumentation (reference
    ``link/basic.py:408``; used by MonitorMode)."""

    def __init__(self, linkers, wrapper: Callable):
        super().__init__()
        self.linkers = linkers
        self.wrapper = wrapper

    def accept(self, fgraph, no_recycling=None, profile=None):
        self.fgraph = fgraph
        self.no_recycling = no_recycling or []
        self.linkers = [lk.accept(fgraph, no_recycling) for lk in self.linkers]
        return self

    def make_thunk(self, input_storage=None, output_storage=None, storage_map=None):
        # only meaningful for LocalLinkers (py path)
        all_res = [
            lk.make_all(input_storage, output_storage, storage_map)
            for lk in self.linkers
        ]
        fns, input_cs, output_cs, thunk_lists, orders = zip(*all_res)
        order = orders[0]
        wrapper = self.wrapper
        fgraph = self.fgraph

        def run():
            for i, node in enumerate(order):
                th = [tl[i] for tl in thunk_lists]
                try:
                    wrapper(fgraph, i, node, *th)
                except Exception:
                    raise_with_op(fgraph, node, th[0])

        return run, input_cs[0], output_cs[0]


# --- reference linker-surface aliases -----------------------------------------

class WrapLinkerMany(WrapLinker):
    """WrapLinker with multiple wrap functions composed (reference)."""

    def __init__(self, linkers, wrappers):
        def composed(*args, **kwargs):
            for w in wrappers:
                w(*args, **kwargs)

        super().__init__(list(linkers), composed)


def gc_helper(node_list):
    """(last-use map, dependencies) for storage GC (reference
    ``link/utils.py gc_helper``)."""
    dependencies = {}
    last_user = {}
    for node in node_list:
        dependencies[node] = list(node.inputs)
        for inp in node.inputs:
            last_user[inp] = node
    return last_user, dependencies


def streamline(fgraph, thunks, order, post_thunk_old_storage=None,
               no_recycling=None, nice_errors=True):
    """Compose per-node thunks into one callable with last-use clearing
    (reference ``link/utils.py streamline``)."""
    post = post_thunk_old_storage or [[] for _ in order]

    def streamlined():
        for thunk, node, old_storage in zip(thunks, order, post):
            try:
                thunk()
            except Exception:
                if nice_errors:
                    raise_with_op(getattr(thunk, "fgraph", fgraph), node, thunk)
                raise
            for cell in old_storage:
                cell[0] = None

    return streamlined


def get_destroy_dependencies(fgraph):
    """Extra inputs each apply's destroy-ordering must wait on (reference
    ``link/utils.py get_destroy_dependencies``)."""
    order = fgraph.orderings()
    deps = {}
    for node in fgraph.apply_nodes:
        deps[node] = list(node.inputs)
        for prereq in order.get(node, []):
            deps[node].extend(prereq.outputs)
    return deps


def unique_name_generator(external_names=None, suffix_sep="_"):
    """Fresh-name factory avoiding clashes (reference
    ``link/utils.py unique_name_generator``)."""
    taken = set(external_names or [])
    counts = {}
    memo = {}  # obj -> assigned name (reference: same obj, same name)

    def unique_name(obj, force_unique=False, name=None):
        try:
            if not force_unique and obj in memo:
                return memo[obj]
            memoizable = True
        except TypeError:
            memoizable = False
        base = name or getattr(obj, "name", None) or "tmp"
        base = "".join(c if c.isalnum() or c == "_" else "_" for c in str(base))
        if base not in taken and not force_unique:
            taken.add(base)
            if memoizable:
                memo[obj] = base
            return base
        k = counts.get(base, 0) + 1
        counts[base] = k
        fresh = f"{base}{suffix_sep}{k}"
        while fresh in taken:
            k += 1
            fresh = f"{base}{suffix_sep}{k}"
        taken.add(fresh)
        if memoizable:
            # the latest assigned name wins, including forced ones, matching
            # the reference's objs_to_names overwrite (advisor r3)
            memo[obj] = fresh
        return fresh

    return unique_name


def get_name_for_object(obj) -> str:
    """Best-effort identifier for codegen naming (reference)."""
    name = getattr(obj, "name", None) or getattr(obj, "__name__", None)
    if name:
        return "".join(c if c.isalnum() or c == "_" else "_" for c in str(name))
    return type(obj).__name__


def compile_function_src(src: str, function_name: str, global_env=None,
                         local_env=None):
    """exec() a generated-source function and return it (reference
    ``link/utils.py compile_function_src`` — used by fgraph_to_python)."""
    global_env = {} if global_env is None else dict(global_env)
    local_env = {} if local_env is None else local_env
    exec(compile(src, f"<generated:{function_name}>", "exec"),
         global_env, local_env)
    fn = local_env.get(function_name) or global_env.get(function_name)
    fn.__source__ = src
    return fn


def register_thunk_trace_excepthook(hook=None):
    """No-op parity hook: our raise_with_op already injects the stored
    creation trace into every node error."""


def fgraph_to_python(fgraph, op_conversion_fn, **kwargs):
    """Emit a python callable evaluating ``fgraph`` with each op
    converted by ``op_conversion_fn`` (reference ``link/utils.py
    fgraph_to_python`` — the JITLinker workhorse; our jax path uses
    ``link.jax.linker.fgraph_to_jax`` which composes closures instead of
    source text, so this generic version interprets directly)."""
    order = fgraph.toposort()
    converted = [op_conversion_fn(n.op, node=n, **kwargs) for n in order]

    def python_fn(*values):
        env = dict(zip(fgraph.inputs, values))
        from aesara_tpu.graph.ir import Constant

        for node, fn in zip(order, converted):
            ins = [env[i] if i in env else i.data for i in node.inputs]
            res = fn(*ins)
            if not isinstance(res, (tuple, list)):
                res = (res,)
            for o, r in zip(node.outputs, res):
                env[o] = r
        return tuple(env[o] if o in env else o.data for o in fgraph.outputs)

    return python_fn


class JITLinker(JAXLinkerBase := object):
    """Name anchor: the reference's JITLinker base is realized by
    ``aesara_tpu.link.jax.linker.JAXLinker`` (whole-fgraph jit)."""

    def __new__(cls, *a, **kw):
        from aesara_tpu.link.jax.linker import JAXLinker

        return JAXLinker(*a, **kw)
