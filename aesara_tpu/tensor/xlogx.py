"""x·log(x) scalar ops (reference ``aesara/tensor/xlogx.py``)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.scalar.ops import UnaryScalarOp, BinaryScalarOp, upgrade_to_float
from aesara_tpu.tensor.elemwise import Elemwise


class XlogX(UnaryScalarOp):
    """x ln(x); 0 at x=0."""

    output_types_preference = staticmethod(upgrade_to_float)

    def impl(self, x):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(x == 0.0, 0.0, x * np.log(x))

    def grad(self, inputs, output_grads):
        from aesara_tpu.scalar.ops import add, constant, log, mul

        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, add(constant(1.0), log(x)))]


class XlogY0(BinaryScalarOp):
    """x ln(y); 0 at x=0."""

    output_types_preference = staticmethod(upgrade_to_float)

    def impl(self, x, y):
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(x == 0.0, 0.0, x * np.log(y))

    def grad(self, inputs, output_grads):
        from aesara_tpu.scalar.ops import log, mul, true_div

        x, y = inputs
        (gz,) = output_grads
        return [mul(gz, log(y)), mul(gz, true_div(x, y))]


scalar_xlogx = XlogX(name="xlogx")
scalar_xlogy0 = XlogY0(name="xlogy0")
xlogx = Elemwise(scalar_xlogx)
xlogy0 = Elemwise(scalar_xlogy0)
