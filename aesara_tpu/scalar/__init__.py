"""Scalar algebra: types, the ScalarOp zoo, special functions, Composite."""

from aesara_tpu.scalar.ops import *  # noqa: F401,F403
from aesara_tpu.scalar.ops import (  # explicit re-exports for clarity
    ScalarOp,
    ScalarType,
    ScalarVariable,
    ScalarConstant,
    UnaryScalarOp,
    BinaryScalarOp,
    as_scalar,
    cast_to,
    constant,
    get_scalar_type,
    upcast,
)
import aesara_tpu.scalar.math as math  # noqa: F401  (shadow stdlib leak from star import)
