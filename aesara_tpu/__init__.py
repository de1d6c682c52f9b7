"""aesara_tpu — a TPU-native symbolic tensor compiler.

Users build symbolic expression graphs with a NumPy-like API
(``aesara_tpu.tensor``), take symbolic gradients (``grad``/``Lop``/``Rop``),
and compile graphs to executables with ``aesara_tpu.function``.  Where the
reference (aesara-devs/aesara) transpiles per-op C code run by a host VM,
this framework lowers whole function graphs to XLA (Pallas kernels for
fused chains, MXU ``dot_general`` for the BLAS pipeline, ``lax.scan`` for
loops) and adds a mesh/sharding + collectives layer
(``aesara_tpu.parallel``).
"""

__version__ = "0.1.0"

import logging

# reference logging surface (reference __init__.py:33-44): a package
# logger with one default stderr handler users can detach
aesara_logger = logging.getLogger("aesara_tpu")
logging_default_handler = logging.StreamHandler()
logging_default_formatter = logging.Formatter(
    fmt="%(levelname)s (%(name)s): %(message)s"
)
logging_default_handler.setFormatter(logging_default_formatter)
aesara_logger.setLevel(logging.WARNING)
if not aesara_logger.hasHandlers():
    aesara_logger.addHandler(logging_default_handler)


def disable_log_handler(logger=aesara_logger, handler=logging_default_handler):
    """Detach the default handler — for apps that configure logging
    themselves (reference ``disable_log_handler``)."""
    if logger.hasHandlers():
        logger.removeHandler(handler)


from aesara_tpu.config import change_flags, config
from aesara_tpu.graph.ir import clone_replace

from aesara_tpu.compile.function import Function, function, function_dump, pfunc
from aesara_tpu.compile.sharedvalue import SharedVariable, shared, shared_constructor
from aesara_tpu.compile.io import In, Out
from aesara_tpu.compile.mode import FAST_COMPILE, FAST_RUN, JAX, Mode, PY, get_mode
from aesara_tpu.compile.ops import as_op
from aesara_tpu.compile.builders import OpFromGraph, remat
from aesara_tpu.gradient import (
    Lop,
    Rop,
    grad,
    hessian,
    jacobian,
    subgraph_grad,
    verify_grad,
)
from aesara_tpu.printing import Print, debugprint, pp, pprint
from aesara_tpu.updates import OrderedUpdates

from aesara_tpu import scalar  # noqa: F401
from aesara_tpu import tensor  # noqa: F401
from aesara_tpu import tensor as at  # conventional alias
from aesara_tpu.tensor import rewriting as _tensor_rewriting  # registers packs
from aesara_tpu.graph import destroyhandler as _destroyhandler  # registers 49.5 pass
from aesara_tpu.scan import rewriting as _scan_rewriting  # registers scan_save_mem
from aesara_tpu.compile.builders import _register_inline_ofg as _rio
_rio()  # inline_ofg_expansion (circular-import-safe registration)
del _rio
from aesara_tpu.sparse import rewriting as _sp_rw  # noqa: F401  (registers roundtrip fold)
from aesara_tpu.ifelse import _register_ifelse_rewrites as _rir
_rir()
del _rir

from aesara_tpu.scan.basic import scan
from aesara_tpu.scan.views import foldl, foldr
from aesara_tpu.scan.views import map as scan_map
from aesara_tpu.scan.views import reduce as scan_reduce
from aesara_tpu.scan.checkpoints import scan_checkpoints
from aesara_tpu.scan import checkpoints
from aesara_tpu.scan.views import map, reduce  # noqa: A001,A002 (reference exports these names)
from aesara_tpu.graph.ir import Variable
from aesara_tpu.compile.profiling import ProfileStats
from aesara_tpu.compile.mode import predefined_linkers, predefined_modes, predefined_optimizers
from aesara_tpu.compile.function import Function as FunctionMaker  # maker == function here


def as_symbolic(x, name=None, **kwargs):
    """Convert any supported value into the equivalent Variable
    (reference ``aesara/__init__.py:81`` singledispatch): Variables pass
    through, scipy.sparse values become sparse constants, everything
    else goes through ``as_tensor_variable``."""
    from aesara_tpu.graph.ir import Variable as _Var

    if isinstance(x, _Var):
        return x
    try:
        import scipy.sparse as _sp

        if _sp.issparse(x):
            from aesara_tpu.sparse.basic import constant as sp_constant

            return sp_constant(x, name=name)
    except Exception:
        pass
    from aesara_tpu.tensor.basic import as_tensor_variable

    res = as_tensor_variable(x, **kwargs)
    if name is not None:
        res.name = name
    return res


from aesara_tpu.ifelse import ifelse
from aesara_tpu.raise_op import Assert, assert_op

dprint = debugprint


def get_scalar_constant_value(v):
    """Parity helper: extract the constant value of a scalar graph."""
    from aesara_tpu.tensor.basic import get_scalar_constant_value as _g

    return _g(v)


def __getattr__(name):
    import importlib

    lazy = {"sparse", "parallel", "typed_list", "d3viz", "misc"}
    if name in lazy:
        return importlib.import_module(f"aesara_tpu.{name}")
    raise AttributeError(f"module 'aesara_tpu' has no attribute {name!r}")


# deferred optdb registrations (modules that load while compile.mode is
# still initializing)
from aesara_tpu.parallel import attention as _par_attention  # noqa: E402

_par_attention._register()
del _par_attention
