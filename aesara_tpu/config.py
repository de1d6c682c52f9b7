"""Typed configuration/flag system.

TPU-native equivalent of the reference's ``aesara/configparser.py`` +
``aesara/configdefaults.py`` (L0 in SURVEY §1): typed params with override
control, merged from defaults < ``~/.aesara_tpu_rc`` ini file <
``AESARA_TPU_FLAGS`` env var (also honors ``AESARA_FLAGS`` for drop-in
compatibility), plus a ``config.change_flags`` context manager
(reference ``configparser.py:33``).
"""

from __future__ import annotations

import configparser as _ini
import os
from contextlib import contextmanager
from functools import wraps
from typing import Any, Callable, Optional, Sequence


class ConfigParam:
    """One typed flag: default value, validator, mutability."""

    def __init__(
        self,
        default: Any,
        apply: Optional[Callable[[Any], Any]] = None,
        mutable: bool = True,
        doc: str = "",
    ):
        self.default = default
        self.apply = apply or (lambda v: v)
        self.mutable = mutable
        self.doc = doc

    def validate(self, value: Any) -> Any:
        return self.apply(value)


def EnumStr(default: str, options: Sequence[str], mutable=True, doc="") -> ConfigParam:
    allowed = (default, *options)

    def apply(v):
        if v not in allowed:
            raise ValueError(f"invalid value {v!r}; allowed: {allowed}")
        return v

    return ConfigParam(default, apply, mutable, doc)


def BoolParam(default: bool, mutable=True, doc="") -> ConfigParam:
    def apply(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, int) and v in (0, 1):  # reference accepts 0/1
            return bool(v)
        if isinstance(v, str):
            if v.lower() in ("1", "true", "yes", "on"):
                return True
            if v.lower() in ("0", "false", "no", "off"):
                return False
        raise ValueError(f"invalid bool {v!r}")

    return ConfigParam(default, apply, mutable, doc)


def IntParam(default: int, mutable=True, doc="") -> ConfigParam:
    return ConfigParam(default, lambda v: int(v), mutable, doc)


def FloatParam(default: float, mutable=True, doc="") -> ConfigParam:
    return ConfigParam(default, lambda v: float(v), mutable, doc)


def StrParam(default: str, mutable=True, doc="") -> ConfigParam:
    return ConfigParam(default, lambda v: str(v), mutable, doc)


class _Config:
    """Attribute-style access to flags.  ``config.<flag>`` reads,
    assignment validates + writes (if mutable)."""

    def __init__(self):
        object.__setattr__(self, "_params", {})
        object.__setattr__(self, "_values", {})
        object.__setattr__(self, "_set_by_user", set())

    def add(self, name: str, param: ConfigParam) -> None:
        self._params[name] = param
        if name not in self._values:
            self._values[name] = param.default

    def __getattr__(self, name: str) -> Any:
        try:
            return object.__getattribute__(self, "_values")[name]
        except KeyError:
            raise AttributeError(f"unknown config flag {name!r}") from None

    def __setattr__(self, name: str, value: Any) -> None:
        params = object.__getattribute__(self, "_params")
        if name not in params:
            raise AttributeError(f"unknown config flag {name!r}")
        p = params[name]
        if not p.mutable:
            raise RuntimeError(f"config flag {name!r} is immutable")
        self._values[name] = p.validate(value)
        self._set_by_user.add(name)

    def _set_unchecked(self, name: str, value: Any) -> None:
        self._values[name] = self._params[name].validate(value)

    @contextmanager
    def change_flags(self, **kwargs):
        """Temporarily override flags (reference ``configparser.py:33``).
        Usable as context manager or decorator via ``.change_flags(...)``."""
        for k in kwargs:
            if k not in self._params:
                raise AttributeError(f"unknown config flag {k!r}")
        old = {k: self._values[k] for k in kwargs}
        try:
            for k, v in kwargs.items():
                self._set_unchecked(k, v)
            yield
        finally:
            for k, v in old.items():
                self._values[k] = v

    def get_config_string(self, print_doc: bool = True) -> str:
        lines = []
        for name, p in sorted(self._params.items()):
            if print_doc and p.doc:
                lines.append(f"# {p.doc}")
            lines.append(f"{name} = {self._values[name]!r}")
        return "\n".join(lines)

    def warn_unused_flags(self, unknown: dict) -> None:
        if unknown:
            import warnings

            warnings.warn(f"unknown AESARA_TPU_FLAGS: {sorted(unknown)}")


def change_flags(**kwargs):
    """Decorator form: run the wrapped function under temporary flags."""

    def deco(fn):
        @wraps(fn)
        def inner(*a, **kw):
            with config.change_flags(**kwargs):
                return fn(*a, **kw)

        return inner

    return deco


config = _Config()

# ---------------------------------------------------------------------------
# Flag registry (subset of the reference's ~130 flags in configdefaults.py
# that are meaningful on TPU; grows as subsystems land)
# ---------------------------------------------------------------------------

config.add("floatX", EnumStr("float32", ("float64", "float16", "bfloat16"),
                             doc="default float dtype (TPU-native default: float32)"))
config.add("intX", EnumStr("int64", ("int32",), doc="default int dtype"))
config.add("device", StrParam("tpu", doc="informational; jax picks the backend"))
config.add("mode", EnumStr("FAST_RUN", ("FAST_COMPILE", "JAX", "PY", "DebugMode", "NanGuardMode", "CompareMode", "Mode"),
                           doc="default compilation mode"))
config.add("linker", EnumStr("jax", ("py", "jax_nojit", "cvm"), doc="default linker"))
config.add("optimizer", EnumStr("o2", ("o1", "o3", "o4", "fast_run", "fast_compile", "unsafe", "None", "merge"),
                                doc="default rewrite pipeline query"))
config.add("optimizer_verbose", BoolParam(False, doc="print each applied rewrite"))
config.add("compute_test_value", EnumStr("off", ("ignore", "warn", "raise", "pdb"),
                                         doc="eager test-value propagation"))
config.add("compute_test_value_opt", EnumStr("off", ("ignore", "warn", "raise"),
                                             doc="test values during rewriting"))
config.add("exception_verbosity", EnumStr("low", ("high",), doc="error report detail"))
config.add("on_opt_error", EnumStr("warn", ("raise", "pdb", "ignore"),
                                   doc="behavior when a rewrite fails"))
config.add("on_shape_error", EnumStr("warn", ("raise",), doc="behavior on infer_shape failure"))
config.add("on_unused_input", EnumStr("raise", ("warn", "ignore"),
                                      doc="default policy for unused function inputs"))
config.add("allow_gc", BoolParam(True, doc="free intermediate py-linker storage"))
config.add("warn_float64", EnumStr("ignore", ("warn", "raise", "pdb"),
                                   doc="float64 is slow on TPU; optionally flag it"))
config.add("cast_policy", EnumStr("custom", ("numpy+floatX",), doc="upcast policy"))
config.add("seed", IntParam(0, doc="default RandomStream seed"))
config.add("profile", BoolParam(False, doc="collect ProfileStats by default"))
config.add("profile_optimizer", BoolParam(False, doc="profile rewrite passes"))
config.add("profile_memory", BoolParam(False, doc="profile memory use"))
config.add("jax_jit", BoolParam(True, doc="wrap compiled graphs in jax.jit"))
config.add("jax_donate_shared", BoolParam(True,
           doc="donate shared-variable buffers for in-place update semantics"))
config.add("jax_default_matmul_precision", EnumStr("highest", ("default", "high"),
           doc="precision passed to MXU dot_general in lowered graphs"))
config.add("pallas_fusion", BoolParam(False,
           doc="lower fused Composite elemwise chains to Pallas VPU kernels "
               "(opt-in: measured parity with XLA's own fusion at HBM-bound "
               "sizes — see benchmarks/README.md crossover table)"))
config.add("pallas_fusion_min_size", IntParam(8192,
           doc="min elements before a fused chain uses a Pallas kernel"))
config.add("sparse_densify", EnumStr("auto", ("never",),
           doc="jit-bridge policy for sparse function inputs: 'auto' "
               "uploads a sparse input as a DENSE device array (one "
               "host-side densify, memoized per container) when its whole "
               "sparse cone tolerates dense values and the dense size is "
               "<= sparse_densify_max_mb — random scatter/gather is slow "
               "on TPU while the MXU is not; 'never' always bridges BCOO. "
               "Elementwise consumers (mul/sampling_dot) are masked so "
               "implicit zeros stay exact 0 under inf/nan; CONTRACTIONS "
               "(structured_dot/usmm) densified with inf/nan in the dense "
               "operand can produce nan where the nnz path skips — use "
               "'never' for such graphs"))
config.add("sparse_densify_max_mb", IntParam(512,
           doc="max dense size (MiB) the auto sparse densify bridge accepts"))
config.add("sparse_bss", EnumStr("auto", ("never",),
           doc="jit-bridge policy for the BSS (blocked segment-slot) "
               "Pallas structured_dot path: 'auto' uploads a sparse "
               "function input in BSS layout when its sparse cone is "
               "consumed only by structured_dot/usmm/transpose (+shape) "
               "and the layout gate passes (max cell occupancy <= 32, "
               "VMEM fit) — measured 8.7x the densified matvec at "
               "density 0.01 (benchmarks/README.md); 'never' disables, "
               "falling back to the densify/BCOO bridges"))
config.add("flash_attention", EnumStr("auto", ("on", "off"),
           doc="FusedAttention lowering policy: 'auto' uses the Pallas "
               "FlashAttention kernels on TPU where measured faster "
               "(forward from T>=2048, backward from T>=1024 — see "
               "benchmarks/README.md), 'on' forces them, 'off' keeps the "
               "plain XLA composition"))
config.add("context_parallel_axis", StrParam("",
           doc="mesh axis name; when set, FusedAttention graphs rewrite to "
               "sequence-parallel attention over this axis at compile time"))
config.add("context_parallel_impl", EnumStr("ring", ("ulysses",),
           doc="sequence-parallel attention implementation"))
config.add("scan__allow_gc", BoolParam(False, doc="parity flag; no-op on TPU"))
config.add("scan__allow_output_prealloc", BoolParam(True, doc="parity flag"))
config.add("scan__checkpoint_policy", EnumStr("nothing_saveable",
           ("everything_saveable", "dots_saveable", "checkpoint_dots"),
           doc="jax.checkpoint policy applied to Scan gradients"))
config.add("openmp", BoolParam(False, mutable=True, doc="parity flag; XLA handles threading"))
config.add("nan_is_error", BoolParam(True, doc="NanGuardMode: treat NaN as error"))
config.add("inf_is_error", BoolParam(True, doc="NanGuardMode: treat Inf as error"))
config.add("big_is_error", BoolParam(True, doc="NanGuardMode: treat |x|>1e10 as error"))
config.add("compiledir", StrParam(os.path.expanduser("~/.aesara_tpu/cache"),
           doc="persistent XLA compilation cache directory"))
config.add("assert_no_cpu_op", EnumStr("ignore", ("warn", "raise"), doc="parity flag"))
config.add("unpickle_function", BoolParam(True, doc="allow unpickling compiled Functions"))
config.add("reoptimize_unpickled_function", BoolParam(False, doc="re-run rewrites on unpickle"))
config.add("pickle_protocol", IntParam(-1, doc="protocol for Function pickling"))
config.add("check_input", BoolParam(True, doc="validate inputs in Function.__call__"))
config.add("shape_buckets", StrParam("off",
           doc="dynamic-shape policy for None-dim inputs: 'off' (one XLA "
               "compile per concrete shape), 'pow2' (pad the leading dim "
               "up to the next power of two), or an explicit comma list "
               "of bucket sizes ('8,64,256'); see compile/bucketing.py "
               "for the batch-rowwise exactness contract"))
config.add("shape_buckets_check", EnumStr("raise", ("warn", "off"),
           doc="batch-axis safety analysis for bucketing: 'raise' errors "
               "when a bucketed function's graph reduces/contracts over "
               "the padded batch dim (replicated pad rows would silently "
               "poison the result), 'warn' runs that call unbucketed with "
               "a warning, 'off' trusts the user"))
config.add("tensor__local_elemwise_fusion", BoolParam(True, doc="enable elemwise fusion pass"))
config.add("lib__amdlibm", BoolParam(False, doc="parity flag; unused on TPU"))
config.add("warn__ignore_bug_before", StrParam("all", doc="parity flag"))
config.add("traceback__limit", IntParam(8, doc="frames kept in variable traces"))
config.add("sharding__default_mesh_axes", StrParam("data",
           doc="comma-separated default mesh axis names for parallel.auto_shard"))


def _load_rc_files() -> None:
    paths = [
        os.path.expanduser("~/.aesara_tpu_rc"),
        os.path.expanduser("~/.aesararc"),
        os.environ.get("AESARA_TPU_RC", ""),
    ]
    cp = _ini.ConfigParser()
    # preserve case: ConfigParser lowercases option names by default,
    # silently dropping flags like floatX (review finding)
    cp.optionxform = str
    cp.read([p for p in paths if p])
    for section in cp.sections():
        for key, val in cp.items(section):
            name = key if section in ("global", "DEFAULT") else f"{section}__{key}"
            if name in config._params:
                try:
                    config._set_unchecked(name, val)
                except ValueError as e:
                    warnings.warn(f"rc file: invalid value for {name}: {e}")
            else:
                warnings.warn(f"rc file: unknown config flag {name!r}")


def _load_env_flags() -> None:
    raw = os.environ.get("AESARA_TPU_FLAGS", "") or os.environ.get("AESARA_FLAGS", "")
    unknown = {}
    for chunk in raw.split(","):
        chunk = chunk.strip()
        if not chunk:
            continue
        if "=" not in chunk:
            unknown[chunk] = None
            continue
        k, v = chunk.split("=", 1)
        k = k.strip().replace(".", "__")
        if k in config._params:
            config._set_unchecked(k, v.strip())
        else:
            unknown[k] = v
    config.warn_unused_flags(unknown)



# ---------------------------------------------------------------------------
# reference flag-name parity (configdefaults.py): every AESARA_FLAGS name a
# reference user can set is accepted.  Flags whose mechanism has no TPU
# equivalent (C compiler knobs, numba) parse and are ignored; the
# meaningful ones are wired where noted.
# ---------------------------------------------------------------------------

# wired: get_mode() applies these to the rewrite query
config.add("optimizer_including", StrParam("", doc="extra rewrite tags to include"))
config.add("optimizer_excluding", StrParam("", doc="rewrite tags to exclude"))
config.add("optimizer_requiring", StrParam("", doc="rewrite tags to require"))
# wired: NanGuardMode defaults
config.add("NanGuardMode__nan_is_error", BoolParam(True))
config.add("NanGuardMode__inf_is_error", BoolParam(True))
config.add("NanGuardMode__big_is_error", BoolParam(True))
config.add("NanGuardMode__action", EnumStr("raise", ("warn", "pdb")))
# wired: DebugMode check_finite default
config.add("DebugMode__check_finite", BoolParam(True))
# wired: ProfileStats.summary row counts
config.add("profiling__n_ops", IntParam(20))
config.add("profiling__n_apply", IntParam(20))
config.add("profiling__destination", StrParam("stderr"))
# accepted for parity (no TPU mechanism / covered elsewhere)
for _name, _param in [
    ("DebugMode__check_c", BoolParam(False, doc="no C thunks; XLA is the second path")),
    ("DebugMode__check_py", BoolParam(True)),
    ("DebugMode__check_preallocated_output", StrParam("")),
    ("DebugMode__check_preallocated_output_ndim", IntParam(4)),
    ("DebugMode__check_strides", IntParam(0, doc="XLA owns layout")),
    ("DebugMode__patience", IntParam(10)),
    ("DebugMode__warn_input_not_reused", BoolParam(True)),
    ("base_compiledir", StrParam("", doc="see compiledir")),
    ("check_stack_trace", EnumStr("off", ("log", "warn", "raise"))),
    ("cmodule__age_thresh_use", IntParam(60 * 60 * 24 * 24)),
    ("cmodule__compilation_warning", BoolParam(False)),
    ("cmodule__debug", BoolParam(False)),
    ("cmodule__preload_cache", BoolParam(False)),
    ("cmodule__remove_gxx_opt", BoolParam(False)),
    ("cmodule__warn_no_version", BoolParam(False)),
    ("compile__timeout", IntParam(120, doc="compile-lock timeout (s)")),
    ("compile__wait", IntParam(5, doc="compile-lock poll interval (s)")),
    ("compiledir_format", StrParam("compiledir_%(platform)s")),
    ("conv__assert_shape", BoolParam(False)),
    ("ctc__root", StrParam("", doc="warp-ctc not needed: CTC is pure jax")),
    ("cxx", StrParam("g++", doc="used by the cvm extension build")),
    ("cycle_detection", EnumStr("regular", ("fast",))),
    ("deterministic", EnumStr("default", ("more",),
                              doc="XLA on TPU is deterministic by default")),
    ("experimental__local_alloc_elemwise", BoolParam(True)),
    ("experimental__local_alloc_elemwise_assert", BoolParam(True)),
    ("force_device", BoolParam(False)),
    ("gcc__cxxflags", StrParam("")),
    ("lib__amblibm", BoolParam(False)),
    ("metaopt__optimizer_excluding", StrParam("")),
    ("metaopt__optimizer_including", StrParam("")),
    ("metaopt__verbose", IntParam(0)),
    ("nocleanup", BoolParam(False)),
    ("numba__cache", BoolParam(True, doc="no numba backend on TPU")),
    ("numba__fastmath", BoolParam(True)),
    ("numba__vectorize_target", EnumStr("cpu", ("parallel", "cuda"))),
    ("openmp_elemwise_minsize", IntParam(200000,
                                         doc="XLA fusion replaces OpenMP")),
    ("optdb__max_use_ratio", FloatParam(8.0)),
    ("optdb__position_cutoff", FloatParam(float("inf"))),
    ("pickle_test_value", BoolParam(True)),
    ("print_global_stats", BoolParam(False)),
    ("print_test_value", BoolParam(False)),
    ("profiling__debugprint", BoolParam(False)),
    ("profiling__ignore_first_call", BoolParam(False)),
    ("profiling__min_memory_size", IntParam(1024)),
    ("profiling__min_peak_memory", BoolParam(False)),
    ("profiling__output_line_width", IntParam(512)),
    ("profiling__time_thunks", BoolParam(True)),
    ("tensor__cmp_sloppy", IntParam(0)),
    ("tensor__insert_inplace_optimizer_validate_nb", IntParam(-1)),
    ("traceback__compile_limit", IntParam(0)),
    ("unittests__rseed", StrParam("666")),
    ("vm__lazy", StrParam("None", doc="CVM is always the lazy VM here")),
    ("warn__round", BoolParam(False)),
]:
    config.add(_name, _param)
del _name, _param


# rc + env flags load LAST so they can set every flag, including the
# reference-parity block above
_load_rc_files()
_load_env_flags()
