"""images2neibs: extract sliding patches (reference
``aesara/tensor/nnet/neighbours.py``, 830 LoC C) — here a reshape/
gather composition the XLA fuser handles."""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable, cast
from aesara_tpu.tensor.type import TensorType


class Images2Neibs(Op):
    """(b, c, H, W) → (b*c*nH*nW, hh*ww) patch matrix."""

    __props__ = ("mode",)

    def __init__(self, mode="valid"):
        if mode not in ("valid", "ignore_borders"):
            raise NotImplementedError(f"images2neibs mode {mode}")
        self.mode = mode

    def make_node(self, ten4, neib_shape, neib_step=None):
        ten4 = as_tensor_variable(ten4)
        neib_shape = cast(as_tensor_variable(neib_shape), "int64")
        if neib_step is None:
            neib_step = neib_shape
        else:
            neib_step = cast(as_tensor_variable(neib_step), "int64")
        if ten4.type.ndim != 4:
            raise TypeError("images2neibs needs a 4-d tensor")
        return Apply(
            self, [ten4, neib_shape, neib_step],
            [TensorType(ten4.type.dtype, (None, None))()],
        )

    def _compute(self, x, hh, ww, sh, sw):
        b, c, H, W = x.shape
        nH = (H - hh) // sh + 1
        nW = (W - ww) // sw + 1
        rows = []
        for i in range(nH):
            for j in range(nW):
                rows.append(
                    x[:, :, i * sh: i * sh + hh, j * sw: j * sw + ww]
                )
        # stack to (nH*nW, b, c, hh, ww) then reorder to (b, c, nH*nW, ...)
        import numpy as _np

        patches = _np.stack(rows, axis=2)  # (b, c, nH*nW, hh, ww)
        return patches.reshape(b * c * nH * nW, hh * ww)

    def perform(self, node, inputs, output_storage):
        x, neib_shape, neib_step = inputs
        hh, ww = int(neib_shape[0]), int(neib_shape[1])
        sh, sw = int(neib_step[0]), int(neib_step[1])
        if self.mode == "valid":
            if (x.shape[2] - hh) % sh or (x.shape[3] - ww) % sw:
                raise ValueError(
                    "images2neibs 'valid': shape must tile exactly; use "
                    "ignore_borders"
                )
        output_storage[0][0] = self._compute(np.asarray(x), hh, ww, sh, sw)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType, grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0], "images2neibs grad"),
                DisconnectedType()(), DisconnectedType()()]


def images2neibs(ten4, neib_shape, neib_step=None, mode="valid"):
    return Images2Neibs(mode)(ten4, neib_shape, neib_step)
