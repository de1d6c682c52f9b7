"""``Mode`` = (rewrite query, linker) and the global ``optdb`` pipeline.

Re-design of the reference's ``aesara/compile/mode.py`` (Mode:278,
optdb:183, predefined modes:442).  The SequenceDB float positions mirror
the reference pipeline (SURVEY §2.3): merge1@0, useless@0.6,
canonicalize@1, stabilize@1.5, specialize@2, uncanonicalize@3,
fusion@49, merge2@49, add_destroy_handler(donation legality)@49.5,
inplace band 50-70, merge3@100.
"""

from __future__ import annotations

from typing import Optional, Union

from aesara_tpu.config import config
from aesara_tpu.graph.rewriting.basic import (
    GraphRewriter,
    MergeOptimizer,
    Rewriter,
)
from aesara_tpu.graph.rewriting.db import (
    EquilibriumDB,
    LocalGroupDB,
    RewriteDatabaseQuery,
    SequenceDB,
    TopoDB,
)
from aesara_tpu.link.basic import Linker, PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker, JAXNoJitLinker


__all__ = [
    "Mode", "optdb", "get_mode", "get_default_mode", "register_linker",
    "predefined_linkers", "predefined_optimizers", "predefined_modes",
    "FAST_COMPILE", "FAST_RUN", "JAX", "PY", "OPT_NONE", "OPT_FAST_RUN",
    "OPT_FAST_COMPILE", "register_canonicalize", "register_stabilize",
    "register_specialize", "register_uncanonicalize", "register_useless",
    "local_useless",
]


# ---------------------------------------------------------------------------
# the global pipeline
# ---------------------------------------------------------------------------

optdb = SequenceDB()

optdb.register("merge1", MergeOptimizer(), "fast_run", "fast_compile", "merge",
               position=0)

# node-local cleanups that remove no-op nodes
local_useless = LocalGroupDB(apply_all_rewrites=True)
optdb.register(
    "useless",
    TopoDB(local_useless, order="out_to_in", ignore_newtrees=True),
    "fast_run", "fast_compile", position=0.6,
)

canonicalize = EquilibriumDB(ignore_newtrees=False)
optdb.register("canonicalize", canonicalize, "fast_run", "fast_compile",
               "canonicalize_db", position=1)

stabilize = EquilibriumDB()
optdb.register("stabilize", stabilize, "fast_run", position=1.5)

specialize = EquilibriumDB()
optdb.register("specialize", specialize, "fast_run", position=2)

uncanonicalize = EquilibriumDB()
optdb.register("uncanonicalize", uncanonicalize, "fast_run", position=3)

optdb.register("merge2", MergeOptimizer(), "fast_run", "merge", position=49)

# positions 48.5-49.5: elemwise fusion & donation legality are registered by
# aesara_tpu.tensor.rewriting.elemwise / aesara_tpu.graph.destroyhandler
# when those modules are imported (they call optdb.register themselves).

optdb.register("merge3", MergeOptimizer(), "fast_run", "merge", position=100)


def register_canonicalize(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "__name__", None) or getattr(rewrite, "name", None) or str(rewrite)
    canonicalize.register(name, rewrite, "fast_run", "fast_compile", *tags, **kwargs)
    return rewrite


def register_stabilize(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "__name__", None) or getattr(rewrite, "name", None) or str(rewrite)
    stabilize.register(name, rewrite, "fast_run", *tags, **kwargs)
    return rewrite


def register_specialize(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "__name__", None) or getattr(rewrite, "name", None) or str(rewrite)
    specialize.register(name, rewrite, "fast_run", *tags, **kwargs)
    return rewrite


def register_uncanonicalize(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "__name__", None) or getattr(rewrite, "name", None) or str(rewrite)
    uncanonicalize.register(name, rewrite, "fast_run", *tags, **kwargs)
    return rewrite


def register_useless(rewrite, *tags, name=None, **kwargs):
    name = name or getattr(rewrite, "__name__", None) or getattr(rewrite, "name", None) or str(rewrite)
    local_useless.register(name, rewrite, "fast_run", "fast_compile", *tags, **kwargs)
    return rewrite


# ---------------------------------------------------------------------------
# linkers / optimizers / modes
# ---------------------------------------------------------------------------

def _cvm_linker():
    from aesara_tpu.link.c.vm_linker import CVMLinker

    return CVMLinker()


predefined_linkers = {
    "py": PerformLinker(),
    "jax": JAXLinker(),
    "jax_nojit": JAXNoJitLinker(),
}
# the C++ VM linker registers lazily (first use compiles the extension)


class _LazyCVM:
    _instance = None

    def clone(self, allow_gc=None):
        from aesara_tpu.link.c.vm_linker import CVMLinker

        return CVMLinker(allow_gc)

    def accept(self, *a, **kw):  # pragma: no cover - clone() is used first
        from aesara_tpu.link.c.vm_linker import CVMLinker

        return CVMLinker().accept(*a, **kw)


predefined_linkers["cvm"] = _LazyCVM()


def register_linker(name: str, linker_cls) -> None:
    if name in predefined_linkers:
        raise ValueError(f"linker {name!r} already registered")
    predefined_linkers[name] = linker_cls()


OPT_NONE = RewriteDatabaseQuery(include=[], exclude=["non_basic"])
OPT_MERGE = RewriteDatabaseQuery(include=["merge"])
OPT_FAST_COMPILE = RewriteDatabaseQuery(include=["fast_compile"])
OPT_FAST_RUN = RewriteDatabaseQuery(include=["fast_run"])
OPT_O1 = OPT_FAST_COMPILE
OPT_O2 = OPT_FAST_RUN
OPT_O3 = OPT_FAST_RUN.including("o3_extra")
OPT_UNSAFE = OPT_FAST_RUN.including("unsafe")

predefined_optimizers = {
    None: OPT_NONE,
    "None": OPT_NONE,
    "merge": OPT_MERGE,
    "o1": OPT_O1,
    "o2": OPT_O2,
    "o3": OPT_O3,
    "o4": OPT_UNSAFE,
    "unsafe": OPT_UNSAFE,
    "fast_compile": OPT_FAST_COMPILE,
    "fast_run": OPT_FAST_RUN,
}


class Mode:
    """A (rewrite query, linker) pair (reference ``mode.py:278``)."""

    def __init__(self, linker=None, optimizer="default", db=None):
        if linker is None:
            linker = config.linker
        if optimizer == "default":
            optimizer = config.optimizer
        self.__setstate__((linker, optimizer))
        self._db = db

    def __setstate__(self, state):
        linker, optimizer = state
        self.provided_linker = linker
        self.provided_optimizer = optimizer
        if isinstance(linker, str):
            linker = predefined_linkers[linker]
        self.linker = linker
        if isinstance(optimizer, str) or optimizer is None:
            optimizer = predefined_optimizers[optimizer]
        self._optimizer_query = optimizer

    def __getstate__(self):
        return (self.provided_linker, self.provided_optimizer)

    @property
    def optdb(self):
        return self._db if getattr(self, "_db", None) is not None else optdb

    @property
    def optimizer(self) -> GraphRewriter:
        opt = self._optimizer_query
        if isinstance(opt, RewriteDatabaseQuery):
            return self.optdb.query(opt)
        return opt  # already a rewriter

    def including(self, *tags) -> "Mode":
        q = self._optimizer_query
        if not isinstance(q, RewriteDatabaseQuery):
            raise TypeError("cannot refine a non-query optimizer")
        new = Mode(self.provided_linker, q.including(*tags))
        return new

    def excluding(self, *tags) -> "Mode":
        q = self._optimizer_query
        if not isinstance(q, RewriteDatabaseQuery):
            raise TypeError("cannot refine a non-query optimizer")
        return Mode(self.provided_linker, q.excluding(*tags))

    def requiring(self, *tags) -> "Mode":
        q = self._optimizer_query
        if not isinstance(q, RewriteDatabaseQuery):
            raise TypeError("cannot refine a non-query optimizer")
        return Mode(self.provided_linker, q.requiring(*tags))

    def __str__(self):
        return (
            f"Mode(linker={self.provided_linker}, "
            f"optimizer={self.provided_optimizer})"
        )


# predefined modes (reference mode.py:442-463)
FAST_COMPILE = Mode(JAXLinker(), OPT_FAST_COMPILE)
FAST_RUN = Mode(JAXLinker(), OPT_FAST_RUN)
JAX = Mode(JAXLinker(), OPT_FAST_RUN)
PY = Mode(PerformLinker(), OPT_FAST_COMPILE)
PY_NONE = Mode(PerformLinker(), OPT_NONE)
CVM = Mode(_LazyCVM(), OPT_FAST_COMPILE)

predefined_modes = {
    "FAST_COMPILE": FAST_COMPILE,
    "FAST_RUN": FAST_RUN,
    "JAX": JAX,
    "PY": PY,
    "CVM": CVM,
}


def get_mode(orig_string: Optional[Union[str, Mode]]) -> Mode:
    if orig_string is None:
        orig_string = config.mode
    if isinstance(orig_string, (Mode,)):
        return orig_string
    if orig_string in predefined_modes:
        mode = predefined_modes[orig_string]
        # AESARA_FLAGS optimizer_including/excluding/requiring (reference
        # configdefaults): colon-separated tag lists applied to the query
        inc = [t for t in config.optimizer_including.split(":") if t]
        exc = [t for t in config.optimizer_excluding.split(":") if t]
        req = [t for t in config.optimizer_requiring.split(":") if t]
        if inc:
            mode = mode.including(*inc)
        if exc:
            mode = mode.excluding(*exc)
        if req:
            mode = mode.requiring(*req)
        return mode
    if orig_string == "DebugMode":
        from aesara_tpu.compile.debugmode import DebugMode

        return DebugMode()
    if orig_string == "NanGuardMode":
        from aesara_tpu.compile.nanguardmode import NanGuardMode

        return NanGuardMode(True, True, True)
    if orig_string == "CompareMode":
        from aesara_tpu.compile.debugmode import CompareMode

        return CompareMode()
    raise ValueError(f"unknown mode {orig_string!r}")


def get_default_mode() -> Mode:
    return get_mode(None)


def get_target_language(mode=None):
    """Languages the mode's linker emits (reference
    ``get_target_language``): always the XLA path here (+'py' fallback)."""
    return ("jax",)
