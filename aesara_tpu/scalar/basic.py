"""Reference import-path alias: ``scalar/basic.py`` → ``scalar/ops.py``
(the reference's main scalar module; ours is consolidated in ops.py)."""
from aesara_tpu.scalar.ops import *  # noqa: F401,F403
from aesara_tpu.scalar.ops import (  # noqa: F401
    ScalarOp, ScalarType, UnaryScalarOp, BinaryScalarOp,
    constant, discrete_dtypes, float_dtypes, upcast,
)
