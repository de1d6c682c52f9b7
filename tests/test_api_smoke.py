"""Public-API smoke sweep: every exported callable must at least get
past its own imports when invoked.

Round-1 shipped a parity stub (``compile.builders.infer_shape``) that
raised ImportError the moment it was called — an untested public name is
a latent crash.  This sweep calls every public function with generic
tensor arguments; signature rejections (TypeError/ValueError) are fine,
but ImportError/NameError/UnboundLocalError mean the function body is
wired to something that doesn't exist.
"""

import inspect

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at

BROKEN_WIRING = (ImportError, NameError, UnboundLocalError)

MODULES = [
    "aesara_tpu",
    "aesara_tpu.tensor",
    "aesara_tpu.tensor.math",
    "aesara_tpu.tensor.basic",
    "aesara_tpu.tensor.extra_ops",
    "aesara_tpu.tensor.nlinalg",
    "aesara_tpu.tensor.slinalg",
    "aesara_tpu.tensor.special",
    "aesara_tpu.tensor.sort",
    "aesara_tpu.tensor.fft",
    "aesara_tpu.tensor.nnet",
    "aesara_tpu.tensor.nnet.basic",
    "aesara_tpu.tensor.random",
    "aesara_tpu.sparse",
    "aesara_tpu.sparse.basic",
    "aesara_tpu.typed_list",
    "aesara_tpu.gradient",
    "aesara_tpu.compile",
    "aesara_tpu.compile.builders",
    "aesara_tpu.printing",
    "aesara_tpu.scan",
    "aesara_tpu.ifelse",
    "aesara_tpu.raise_op",
]


def _public_functions(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in dir(mod) if not n.startswith("_")]
    out = []
    for n in names:
        if "register" in n:
            # registration entry points mutate the global rewrite DBs;
            # calling them with dummy args would pollute every later test
            continue
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj) or inspect.isclass(obj):
            continue
        if callable(obj):
            out.append((n, obj))
    return out


def _generic_args(fn, n_required):
    """n_required generic matrix variables (most ops accept tensors)."""
    return [at.matrix(f"_smoke_{i}", dtype="float64") for i in range(n_required)]


def _required_positional(fn):
    try:
        sig = inspect.signature(fn)
    except (TypeError, ValueError):
        return 1
    n = 0
    for p in sig.parameters.values():
        if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD) and (
            p.default is p.empty
        ):
            n += 1
        if p.kind == p.VAR_POSITIONAL and n == 0:
            n = 1
    return n


def collect_cases():
    import importlib

    cases = []
    seen = set()
    for modname in MODULES:
        mod = importlib.import_module(modname)
        for name, fn in _public_functions(mod):
            key = id(fn)
            if key in seen:
                continue
            seen.add(key)
            cases.append(pytest.param(fn, id=f"{modname}.{name}"))
    return cases


@pytest.mark.parametrize("fn", collect_cases())
def test_callable_does_not_hit_broken_wiring(fn):
    n = _required_positional(fn)
    if n > 6:
        pytest.skip("signature too wide for a generic smoke call")
    try:
        fn(*_generic_args(fn, n))
    except BROKEN_WIRING as e:
        raise AssertionError(
            f"{fn!r} raised {type(e).__name__} when called — broken "
            f"internal wiring: {e}"
        )
    except Exception:
        # signature/type rejections are fine: the body executed its
        # imports and validated its inputs
        pass


def test_root_namespace_names_resolve():
    # the reference root exports by import, not __all__ — pin the core
    # surface plus the lazy submodules
    core = [
        "function", "shared", "grad", "scan", "config", "tensor",
        "sparse", "typed_list", "parallel", "d3viz", "misc", "printing",
        "In", "Out", "Mode", "OpFromGraph", "ifelse", "dprint",
    ]
    for n in core:
        assert getattr(atp, n, None) is not None, n


def test_tensor_namespace_names_resolve():
    for n in at.__all__:
        assert getattr(at, n, None) is not None, n
