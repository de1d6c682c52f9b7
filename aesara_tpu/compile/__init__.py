from aesara_tpu.compile.function import Function, function, function_dump, orig_function, pfunc
from aesara_tpu.compile.io import In, Out, SymbolicInput, SymbolicOutput
from aesara_tpu.compile.mode import (
    FAST_COMPILE,
    FAST_RUN,
    JAX,
    PY,
    Mode,
    get_default_mode,
    get_mode,
    optdb,
    register_canonicalize,
    register_specialize,
    register_stabilize,
    register_uncanonicalize,
    register_useless,
)
from aesara_tpu.compile.ops import DeepCopyOp, FromFunctionOp, ViewOp, as_op, deep_copy_op, view_op
from aesara_tpu.compile.sharedvalue import SharedVariable, shared, shared_constructor
