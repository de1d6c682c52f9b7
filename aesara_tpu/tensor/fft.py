"""Real FFTs (reference ``aesara/tensor/fft.py``: RFFTOp:12, IRFFTOp:72).

The reference packs complex results into a trailing (…, 2) real axis;
we keep that convention for API parity.  XLA lowers to jnp.fft.
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable, cast
from aesara_tpu.tensor.type import TensorType


__all__ = ["RFFTOp", "rfft", "IRFFTOp", "irfft"]


class RFFTOp(Op):
    __props__ = ()

    def make_node(self, a, s=None):
        a = as_tensor_variable(a)
        if a.type.ndim < 2:
            raise TypeError("rfft needs a batched input (ndim >= 2)")
        inputs = [a]
        if s is not None:
            inputs.append(cast(as_tensor_variable(s), "int64"))
        out_shape = a.type.shape[:-1] + (None, 2)
        return Apply(self, inputs, [TensorType("float64" if a.type.dtype == "float64" else "float32", out_shape)()])

    def perform(self, node, inputs, output_storage):
        a = inputs[0]
        s = tuple(int(x) for x in inputs[1]) if len(inputs) > 1 else None
        res = np.fft.rfftn(a, s=s, axes=range(1, a.ndim))
        packed = np.stack([res.real, res.imag], axis=-1)
        output_storage[0][0] = packed.astype(node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        (gz,) = output_grads
        rest = [DisconnectedType()()] if len(inputs) > 1 else []
        return [RFFTGradOp()(inputs[0], gz)] + rest


def rfft(inp, norm=None):
    if norm is not None:
        raise NotImplementedError("rfft norm option lands later")
    return RFFTOp()(inp)


class IRFFTOp(Op):
    __props__ = ()

    def make_node(self, a, s=None):
        a = as_tensor_variable(a)
        if a.type.ndim < 3:
            raise TypeError("irfft expects packed (..., 2) complex input")
        inputs = [a]
        if s is not None:
            inputs.append(cast(as_tensor_variable(s), "int64"))
        out_shape = a.type.shape[:-2] + (None,)
        return Apply(self, inputs, [TensorType(a.type.dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        a = inputs[0]
        s = tuple(int(x) for x in inputs[1]) if len(inputs) > 1 else None
        comp = a[..., 0] + 1j * a[..., 1]
        res = np.fft.irfftn(comp, s=s, axes=range(1, comp.ndim))
        output_storage[0][0] = res.astype(node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        (gz,) = output_grads
        rest = [DisconnectedType()()] if len(inputs) > 1 else []
        return [IRFFTGradOp()(inputs[0], gz)] + rest


def irfft(inp, norm=None):
    if norm is not None:
        raise NotImplementedError("irfft norm option lands later")
    return IRFFTOp()(inp)


class RFFTGradOp(Op):
    """vjp of RFFTOp via jax (packed-pair convention preserved); the
    naive ``irfft(gz)`` is wrong by the hermitian double-counting and
    1/n normalization."""

    __props__ = ()

    def make_node(self, a, gz):
        a = as_tensor_variable(a)
        gz = as_tensor_variable(gz)
        return Apply(self, [a, gz], [a.type()])

    def perform(self, node, inputs, output_storage):
        import jax
        import jax.numpy as jnp

        a, gz = inputs

        def packed_rfft(x):
            res = jnp.fft.rfftn(x, axes=range(1, x.ndim))
            return jnp.stack([res.real, res.imag], axis=-1)

        _, vjp = jax.vjp(packed_rfft, jnp.asarray(a, dtype="float64")
                         if a.dtype == np.float64 else jnp.asarray(a))
        (g,) = vjp(jnp.asarray(gz, dtype=np.asarray(a).dtype))
        output_storage[0][0] = np.asarray(g, dtype=a.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]


class IRFFTGradOp(Op):
    """vjp of IRFFTOp via jax (same rationale as RFFTGradOp)."""

    __props__ = ()

    def make_node(self, a, gz):
        a = as_tensor_variable(a)
        gz = as_tensor_variable(gz)
        return Apply(self, [a, gz], [a.type()])

    def perform(self, node, inputs, output_storage):
        import jax
        import jax.numpy as jnp

        a, gz = inputs

        def unpacked_irfft(packed):
            comp = packed[..., 0] + 1j * packed[..., 1]
            return jnp.fft.irfftn(comp, axes=range(1, comp.ndim))

        _, vjp = jax.vjp(unpacked_irfft, jnp.asarray(a))
        (g,) = vjp(jnp.asarray(gz, dtype=np.asarray(gz).dtype))
        output_storage[0][0] = np.asarray(g, dtype=a.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]
