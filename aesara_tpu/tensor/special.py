"""Softmax family (reference ``aesara/tensor/special.py``: SoftmaxGrad:13,
Softmax:239, LogSoftmax:508).  These are dedicated ops (not plain graph
compositions) so rewrites can recognize them and the XLA path lowers to
fused jax.nn kernels; the Pallas fusion pass can target them directly."""

from __future__ import annotations

from typing import Optional

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.type import TensorType


__all__ = ["Softmax", "softmax", "LogSoftmax", "log_softmax", "SoftmaxGrad",
           "poch", "factorial"]


class Softmax(Op):
    """(reference ``special.py:239``)"""

    __props__ = ("axis",)

    def __init__(self, axis=-1):
        self.axis = axis if axis is None else int(axis)

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.dtype.startswith(("int", "uint")) or x.type.dtype == "bool":
            from aesara_tpu.tensor.basic import cast
            from aesara_tpu.config import config

            x = cast(x, config.floatX)
        return Apply(self, [x], [x.type()])

    def _ax(self, ndim):
        if self.axis is None:
            return None
        return self.axis % ndim if ndim else 0

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        ax = self._ax(x.ndim)
        if ax is None:
            z = x - x.max()
            e = np.exp(z)
            output_storage[0][0] = (e / e.sum()).astype(x.dtype)
            return
        z = x - x.max(axis=ax, keepdims=True)
        e = np.exp(z)
        output_storage[0][0] = (e / e.sum(axis=ax, keepdims=True)).astype(x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def L_op(self, inputs, outputs, output_grads):
        (x,) = inputs
        (sm,) = outputs
        (gz,) = output_grads
        return [SoftmaxGrad(self.axis)(gz, sm)]

    def __str__(self):
        return f"Softmax{{axis={self.axis}}}"


class SoftmaxGrad(Op):
    """VJP of softmax (reference ``special.py:13``)."""

    __props__ = ("axis",)

    def __init__(self, axis=-1):
        self.axis = axis if axis is None else int(axis)

    def make_node(self, dy, sm):
        dy = as_tensor_variable(dy)
        sm = as_tensor_variable(sm)
        return Apply(self, [dy, sm], [sm.type()])

    def perform(self, node, inputs, output_storage):
        dy, sm = inputs
        ax = self.axis if self.axis is None else self.axis % sm.ndim
        if ax is None:
            inner = (dy * sm).sum()
        else:
            inner = (dy * sm).sum(axis=ax, keepdims=True)
        output_storage[0][0] = (sm * (dy - inner)).astype(sm.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[1]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, inp) for i, inp in enumerate(inputs)]


def softmax(x, axis=-1):
    return Softmax(axis)(x)


class LogSoftmax(Op):
    """(reference ``special.py:508``)"""

    __props__ = ("axis",)

    def __init__(self, axis=-1):
        self.axis = axis if axis is None else int(axis)

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.dtype.startswith(("int", "uint")) or x.type.dtype == "bool":
            from aesara_tpu.tensor.basic import cast
            from aesara_tpu.config import config

            x = cast(x, config.floatX)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        ax = self.axis if self.axis is None else self.axis % max(x.ndim, 1)
        if ax is None:
            z = x - x.max()
            output_storage[0][0] = (z - np.log(np.exp(z).sum())).astype(x.dtype)
            return
        z = x - x.max(axis=ax, keepdims=True)
        lse = np.log(np.exp(z).sum(axis=ax, keepdims=True))
        output_storage[0][0] = (z - lse).astype(x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def L_op(self, inputs, outputs, output_grads):
        (x,) = inputs
        (lsm,) = outputs
        (gz,) = output_grads
        from aesara_tpu.tensor.math import exp as texp, sub as tsub, mul as tmul, sum as tsum

        ax = self.axis
        axk = ax if ax is None else ax
        s = tsum(gz, axis=axk, keepdims=ax is not None) if ax is not None else tsum(gz)
        return [tsub(gz, tmul(texp(lsm), s))]

    def __str__(self):
        return f"LogSoftmax{{axis={self.axis}}}"


def log_softmax(x, axis=-1):
    return LogSoftmax(axis)(x)


def poch(z, m):
    """Pochhammer symbol via gamma (reference ``special.py`` poch)."""
    from aesara_tpu.tensor.math import gamma as tgamma, true_div

    return true_div(tgamma(z + m), tgamma(z))


def factorial(n):
    from aesara_tpu.tensor.math import gamma as tgamma

    return tgamma(n + 1)
