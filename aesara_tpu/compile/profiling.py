"""ProfileStats: compile-time and runtime accounting
(reference ``aesara/compile/profiling.py:185``).

py path: per-Apply wall times and call counts (the reference's
``time_thunks`` VM accounting).  XLA path: whole-program wall time plus
the compiler's own cost model (FLOPs / bytes accessed from
``compiled.cost_analysis()``) — per-node host timing is meaningless when
the graph runs as one fused device program.
"""

from __future__ import annotations

import atexit
import sys
import time
from collections import defaultdict
from typing import Optional

from aesara_tpu.config import config

import numpy as np

from aesara_tpu.compile.mode import Mode
from aesara_tpu.link.basic import Container, LocalLinker, map_storage, raise_with_op


__all__ = ["ProfileStats", "ProfileMode", "profile_printer"]

_all_profiles = []


class ProfileStats:
    def __init__(self, name=None, atexit_print=True):
        self.name = name
        self.fct_callcount = 0
        self.fct_call_time = 0.0
        self.compile_time = 0.0
        self.rewrite_time = 0.0
        self.linker_time = 0.0
        self.apply_time = defaultdict(float)   # node -> seconds
        self.apply_callcount = defaultdict(int)
        self.variable_shape = {}               # var -> shape (memory profile)
        self.variable_mem = {}                 # var -> nbytes
        self.xla_cost = None  # dict from compiled.cost_analysis()
        #: per-optdb-stage compile profile: [(name, seconds, nodes_in,
        #: nodes_out)] (reference rewriter_profile, profiling.py:185+)
        self.rewriter_profile = None
        #: per-equilibrium-stage detail: {stage: {passes, applications,
        #: rewriter_time}}
        self.equilibrium_profile = None
        if atexit_print:
            _all_profiles.append(self)

    def xla_attribution(self):
        """Per-Apply HLO attribution (jax linker only; needs >= 1 call
        so the thunk holds example args).  Returns the
        ``link/jax/profile_attr.attribute`` report dict, or None when
        the function is gone / never called / not on the jax path."""
        fn = getattr(self, "_function_ref", lambda: None)()
        if fn is None:
            return None
        try:
            from aesara_tpu.link.jax.profile_attr import attribute

            return attribute(fn)
        except (TypeError, AttributeError):
            return None

    # --- aggregation ----------------------------------------------------------
    def op_time(self):
        agg = defaultdict(float)
        for node, t in self.apply_time.items():
            agg[str(node.op)] += t
        return agg

    def class_time(self):
        agg = defaultdict(float)
        for node, t in self.apply_time.items():
            agg[type(node.op).__name__] += t
        return agg

    def summary(self, file=None, n_ops_to_print: Optional[int] = None):
        if n_ops_to_print is None:
            n_ops_to_print = config.profiling__n_ops
        file = file or sys.stdout
        print(f"== ProfileStats {self.name or ''} ==", file=file)
        print(f"  function calls : {self.fct_callcount}", file=file)
        print(f"  total call time: {self.fct_call_time:.6f}s", file=file)
        print(f"  compile time   : {self.compile_time:.6f}s "
              f"(rewrites {self.rewrite_time:.6f}s)", file=file)
        if self.apply_time:
            print("  per-op time:", file=file)
            total = sum(self.apply_time.values()) or 1.0
            rows = sorted(self.op_time().items(), key=lambda kv: -kv[1])
            for opname, t in rows[:n_ops_to_print]:
                print(f"    {t:10.6f}s {100 * t / total:5.1f}%  {opname}",
                      file=file)
        if self.rewriter_profile:
            print("  rewrite pipeline (per optdb stage):", file=file)
            for stage, dt, n_in, n_out in self.rewriter_profile:
                delta = f"{n_in}->{n_out}" if n_in != n_out else f"{n_in}"
                print(f"    {dt:10.6f}s  nodes {delta:>9}  {stage}",
                      file=file)
        if self.equilibrium_profile:
            for stage, det in self.equilibrium_profile.items():
                print(f"  equilibrium stage {stage!r}: "
                      f"{det['passes']} passes", file=file)
                top = sorted(det["rewriter_time"].items(),
                             key=lambda kv: -kv[1])[:n_ops_to_print]
                for rname, t in top:
                    napp = det["applications"].get(rname, 0)
                    print(f"    {t:10.6f}s  {napp:4d}x  {rname}", file=file)
        if self.variable_mem:
            total = sum(self.variable_mem.values())
            print(f"  memory profile: {total / 1e6:.3f} MB across "
                  f"{len(self.variable_mem)} intermediates; largest:",
                  file=file)
            rows = sorted(self.variable_mem.items(), key=lambda kv: -kv[1])
            for var, nbytes in rows[:n_ops_to_print]:
                shp = self.variable_shape.get(var)
                print(f"    {nbytes / 1e6:10.3f} MB  shape={shp}  {var}",
                      file=file)
        if self.xla_cost:
            print("  XLA cost analysis:", file=file)
            for k in ("flops", "bytes accessed", "transcendentals"):
                if k in self.xla_cost:
                    print(f"    {k}: {self.xla_cost[k]:.3e}", file=file)
        rep = self.xla_attribution()
        if rep is not None:
            from aesara_tpu.link.jax.profile_attr import print_report

            print_report(rep, file=file, top=n_ops_to_print)
        for printer in _profiler_printers:
            printer(self, file)

    summary_ops = summary


def profile_printer(*args, **kwargs):  # atexit hook (reference _atexit_print_fn)
    from aesara_tpu.config import config

    if not config.profile:
        return
    for p in _all_profiles:
        if p.fct_callcount:
            p.summary()


atexit.register(profile_printer)


class ProfileLinker(LocalLinker):
    """py linker with per-thunk timing into a ProfileStats."""

    def __init__(self, stats: ProfileStats):
        super().__init__(allow_gc=False)
        self.stats = stats

    def make_all(self, input_storage=None, output_storage=None, storage_map=None):
        fgraph = self.fgraph
        order = fgraph.toposort()
        input_storage, output_storage, storage_map = map_storage(
            fgraph, order, input_storage, output_storage, storage_map
        )
        compute_map = {v: [False] for v in storage_map}
        thunks = [
            (node, node.op.make_py_thunk(node, storage_map, compute_map, []))
            for node in order
        ]
        input_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.inputs, input_storage)
        ]
        output_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.outputs, output_storage)
        ]
        stats = self.stats

        def run():
            t_fn = time.perf_counter()
            for node, thunk in thunks:
                t0 = time.perf_counter()
                try:
                    thunk()
                except Exception:
                    raise_with_op(fgraph, node, thunk)
                stats.apply_time[node] += time.perf_counter() - t0
                stats.apply_callcount[node] += 1
                # memory/shape accounting (reference profiling.py:249-259)
                for out in node.outputs:
                    val = storage_map[out][0]
                    if isinstance(val, np.ndarray):
                        stats.variable_shape[out] = val.shape
                        stats.variable_mem[out] = val.nbytes
            stats.fct_call_time += time.perf_counter() - t_fn
            stats.fct_callcount += 1

        return run, input_containers, output_containers, thunks, order


class ProfileMode(Mode):
    """Mode collecting ProfileStats through the py linker (per-node) —
    use ``xla_cost_analysis`` below for device-side cost accounting."""

    def __init__(self, optimizer="fast_run", stats: Optional[ProfileStats] = None):
        self.profile_stats = stats or ProfileStats()
        super().__init__(ProfileLinker(self.profile_stats), optimizer)


def xla_cost_analysis(fn) -> dict:
    """FLOPs/bytes estimates from XLA for a compiled Function on the jax
    path (the device-side replacement for per-node host timing).  Also
    accepts an already-compiled jax callable."""
    cost_fn = getattr(fn, "cost_analysis", None)
    if cost_fn is not None:  # a jax Compiled object directly
        cost = cost_fn()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        return dict(cost)
    thunk = fn.fn
    jit_fn = getattr(thunk, "jit_fn", None)
    if jit_fn is None:
        raise TypeError("xla_cost_analysis needs a jax-linker Function")
    args = [cell[0] for cell in fn.input_storage]
    lowered = jit_fn.lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    return dict(cost)


import contextlib


@contextlib.contextmanager
def extended_open(filename, mode="r"):
    """open() that also understands '<stdout>'/'<stderr>' (reference)."""
    import sys

    if filename == "<stdout>":
        yield sys.stdout
    elif filename == "<stderr>":
        yield sys.stderr
    else:
        with open(filename, mode) as fh:
            yield fh


_profiler_printers: list = []


def register_profiler_printer(fct):
    """Extra sections for the atexit profile dump (reference)."""
    _profiler_printers.append(fct)
    return fct


@register_profiler_printer
def _scan_profile_printer(stats, file=None):
    """Per-Scan breakdown (reference ``scan/op.py:3344 profile_printer``):
    loop totals and the inner graph's op census."""
    from aesara_tpu.scan.op import Scan

    file = file or sys.stdout
    scan_nodes = [
        (node, t) for node, t in stats.apply_time.items()
        if isinstance(node.op, Scan)
    ]
    if not scan_nodes:
        return
    print("  scan loops:", file=file)
    for node, t in sorted(scan_nodes, key=lambda kv: -kv[1]):
        op = node.op
        inner_census = defaultdict(int)
        for n in op.fgraph.apply_nodes:
            inner_census[type(n.op).__name__] += 1
        census = ", ".join(
            f"{k}x{v}" for k, v in sorted(inner_census.items())
        )
        print(
            f"    {t:10.6f}s {stats.apply_callcount[node]:4d} calls  "
            f"{op} (inner: {census})",
            file=file,
        )


def print_global_stats():
    """Aggregate stats across all ProfileStats instances (reference)."""
    import sys

    total_time = sum(getattr(p, "fct_call_time", 0.0) for p in _all_profiles)
    total_calls = sum(getattr(p, "fct_callcount", 0) for p in _all_profiles)
    print(f"Global profiling stats: {len(_all_profiles)} profiled functions, "
          f"{total_calls} calls, {total_time:.4f}s total", file=sys.stderr)


# ---------------------------------------------------------------------------
# device profiler hooks (SURVEY §7-8: "XLA cost analysis + device
# profiler hooks"): thin wrappers over jax.profiler so users can capture
# a TensorBoard-readable device trace around compiled-function calls
# without importing jax themselves.
# ---------------------------------------------------------------------------

def start_device_trace(logdir: str):
    """Begin capturing a device trace (XLA ops, HBM transfers) into
    ``logdir`` — view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir)


def stop_device_trace():
    import jax

    jax.profiler.stop_trace()


class device_trace:
    """Context manager: ``with device_trace("/tmp/tb"): f(x)``."""

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        start_device_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        stop_device_trace()
        return False
