"""Pooling (reference ``aesara/tensor/nnet/signal/pool.py``, 2,567 LoC of
max/avg pool + grad C kernels) — here one op on ``lax.reduce_window``
with gradients through jax.vjp (one source of truth, both backends)."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.type import TensorType


__all__ = ["Pool", "pool_2d", "max_pool_2d", "PoolGrad"]


def _out_len(i, w, s, pad, ignore_border):
    if i is None:
        return None
    i = i + 2 * pad
    if ignore_border:
        return max(0, (i - w) // s + 1)
    import math

    return max(0, int(math.ceil(max(i - w, 0) / s)) + 1) if i >= w else (1 if i > 0 else 0)


class Pool(Op):
    """2-d pooling over the trailing two axes (NCHW)."""

    __props__ = ("ws", "stride", "pad", "mode", "ignore_border")

    def __init__(self, ws, ignore_border=True, stride=None, pad=(0, 0),
                 mode="max"):
        self.ws = tuple(ws)
        self.stride = tuple(stride) if stride is not None else tuple(ws)
        self.pad = tuple(pad)
        if mode not in ("max", "sum", "average_inc_pad", "average_exc_pad"):
            raise ValueError(f"bad pool mode {mode}")
        self.mode = mode
        self.ignore_border = bool(ignore_border)
        if not ignore_border and (self.pad != (0, 0)):
            raise NotImplementedError("padding requires ignore_border=True")

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim < 2:
            raise TypeError("pool needs ndim >= 2")
        shape = list(x.type.shape)
        shape[-2] = _out_len(shape[-2], self.ws[0], self.stride[0], self.pad[0],
                             self.ignore_border)
        shape[-1] = _out_len(shape[-1], self.ws[1], self.stride[1], self.pad[1],
                             self.ignore_border)
        return Apply(self, [x], [TensorType(x.type.dtype, tuple(shape))()])

    def _jax_forward(self, x):
        import jax.numpy as jnp
        from jax import lax

        x = jnp.asarray(x)
        nd = x.ndim
        window = (1,) * (nd - 2) + self.ws
        strides = (1,) * (nd - 2) + self.stride
        pads = ((0, 0),) * (nd - 2) + tuple((p, p) for p in self.pad)
        if not self.ignore_border:
            # pad right edge so partial windows are included
            extra = []
            for i, (w, s) in enumerate(zip(self.ws, self.stride)):
                size = x.shape[nd - 2 + i]
                n_out = _out_len(size, w, s, 0, False)
                needed = (n_out - 1) * s + w - size
                extra.append(max(0, needed))
            pads = ((0, 0),) * (nd - 2) + tuple(
                (p, p + e) for p, e in zip(self.pad, extra)
            )
        if self.mode == "max":
            init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
            return lax.reduce_window(x, init, lax.max, window, strides, pads)
        # init must match the operand dtype (review finding: float 0.0
        # crashed integer pooling)
        zero = np.zeros((), dtype=np.dtype(str(x.dtype))).item() if not jnp.issubdtype(x.dtype, jnp.floating) else 0.0
        summed = lax.reduce_window(x, zero, lax.add, window,
                                   strides, pads)
        if self.mode == "sum":
            return summed.astype(x.dtype)
        if self.mode == "average_inc_pad":
            denom = float(np.prod(self.ws))
            return (summed / denom).astype(x.dtype)
        # average_exc_pad: divide by the true window size
        ones = jnp.ones_like(x)
        counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, pads)
        return (summed / counts).astype(x.dtype)

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        from aesara_tpu.scalar.ops import _np_dtype

        res = self._jax_forward(x)
        output_storage[0][0] = np.asarray(res).astype(
            _np_dtype(node.outputs[0].type.dtype), copy=False
        )

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.shape import shape as tshape

        out = node.outputs[0]
        return [tuple(tshape(out)[d] for d in range(out.type.ndim))]

    def L_op(self, inputs, outputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [PoolGrad(self)(x, gz)]

    def __str__(self):
        return f"Pool{{{self.mode}, ws={self.ws}, stride={self.stride}}}"


class PoolGrad(Op):
    __props__ = ("fwd_props",)

    def __init__(self, fwd: Pool):
        self.fwd = fwd
        self.fwd_props = (fwd.ws, fwd.stride, fwd.pad, fwd.mode, fwd.ignore_border)

    def make_node(self, x, gz):
        x = as_tensor_variable(x)
        gz = as_tensor_variable(gz)
        return Apply(self, [x, gz], [x.type()])

    def perform(self, node, inputs, output_storage):
        import jax
        import jax.numpy as jnp

        x, gz = inputs
        _, vjp_fn = jax.vjp(self.fwd._jax_forward, jnp.asarray(x))
        (g,) = vjp_fn(jnp.asarray(gz, dtype=jnp.result_type(np.asarray(x).dtype)))
        from aesara_tpu.scalar.ops import _np_dtype

        output_storage[0][0] = np.asarray(g).astype(
            _np_dtype(node.outputs[0].type.dtype), copy=False
        )

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, v) for i, v in enumerate(inputs)]


def pool_2d(input, ws=None, ignore_border=True, stride=None, pad=(0, 0),
            mode="max", ds=None, st=None, padding=None):
    # legacy kwarg aliases from the reference
    if ds is not None:
        ws = ds
    if st is not None:
        stride = st
    if padding is not None:
        pad = padding
    return Pool(ws, ignore_border, stride, pad, mode)(input)


def max_pool_2d(input, ws, ignore_border=True, stride=None, pad=(0, 0)):
    return pool_2d(input, ws, ignore_border, stride, pad, mode="max")
