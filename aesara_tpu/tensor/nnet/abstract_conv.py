"""2-d convolution (reference ``aesara/tensor/nnet/abstract_conv.py``:
AbstractConv2d + gradWeights/gradInputs, lowered by rewrites to C gemm
kernels ``corr_gemm.c``).

Here the op itself IS the MXU primitive: forward, grad-inputs and
grad-weights all evaluate ``lax.conv_general_dilated`` (through jax.vjp
for the gradients), on host keys for the oracle and traced for XLA, so
py and device paths match exactly.  Layout is NCHW/OIHW like the
reference.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.type import TensorType
from aesara_tpu.scalar.ops import upcast


__all__ = ["AbstractConv2d", "conv2d", "conv2d_transpose",
           "get_conv_output_shape"]


def _norm_border(border_mode, kh: Optional[int], kw: Optional[int]):
    """border_mode → explicit ((top,bottom),(left,right)) padding or None
    if kernel size unknown and mode needs it."""
    if border_mode == "valid":
        return ((0, 0), (0, 0))
    if border_mode == "full":
        if kh is None or kw is None:
            return None
        return ((kh - 1, kh - 1), (kw - 1, kw - 1))
    if border_mode == "half":
        if kh is None or kw is None:
            return None
        return ((kh // 2, kh // 2), (kw // 2, kw // 2))
    if isinstance(border_mode, int):
        return ((border_mode, border_mode), (border_mode, border_mode))
    if isinstance(border_mode, (tuple, list)):
        ph, pw = border_mode
        ph = (ph, ph) if isinstance(ph, int) else tuple(ph)
        pw = (pw, pw) if isinstance(pw, int) else tuple(pw)
        return (ph, pw)
    raise ValueError(f"bad border_mode {border_mode!r}")


def get_conv_output_shape(image_shape, kernel_shape, border_mode, subsample,
                          filter_dilation=(1, 1)):
    """Static output shape (reference helper of the same name)."""
    b, _, ih, iw = image_shape
    nf, _, kh, kw = kernel_shape
    pad = _norm_border(border_mode, kh, kw)
    out = [b, nf]
    for i, (isz, ksz, s, d) in enumerate(
        zip((ih, iw), (kh, kw), subsample, filter_dilation)
    ):
        if isz is None or ksz is None or pad is None:
            out.append(None)
            continue
        keff = (ksz - 1) * d + 1
        out.append((isz + pad[i][0] + pad[i][1] - keff) // s + 1)
    return tuple(out)


class AbstractConv2d(Op):
    """NCHW×OIHW 2-d convolution on the MXU."""

    __props__ = ("border_mode", "subsample", "filter_flip", "filter_dilation",
                 "num_groups")

    def __init__(self, border_mode="valid", subsample=(1, 1), filter_flip=True,
                 filter_dilation=(1, 1), num_groups=1, imshp=None, kshp=None):
        self.border_mode = (
            tuple(border_mode) if isinstance(border_mode, (list, tuple))
            else border_mode
        )
        self.subsample = tuple(subsample)
        self.filter_flip = bool(filter_flip)
        self.filter_dilation = tuple(filter_dilation)
        self.num_groups = int(num_groups)

    def make_node(self, img, kern):
        img = as_tensor_variable(img)
        kern = as_tensor_variable(kern)
        if img.type.ndim != 4 or kern.type.ndim != 4:
            raise TypeError("conv2d needs 4-d image (NCHW) and kernel (OIHW)")
        dtype = upcast(img.type.dtype, kern.type.dtype)
        out_shape = get_conv_output_shape(
            img.type.shape, kern.type.shape, self.border_mode,
            self.subsample, self.filter_dilation,
        )
        return Apply(self, [img, kern], [TensorType(dtype, out_shape)()])

    # --- the single source of truth: a jax forward --------------------------
    def _jax_forward(self, img, kern):
        import jax.numpy as jnp
        from jax import lax

        kh, kw = kern.shape[2], kern.shape[3]
        pad = _norm_border(self.border_mode, kh, kw)
        if self.filter_flip:
            kern = kern[:, :, ::-1, ::-1]
        return lax.conv_general_dilated(
            jnp.asarray(img), jnp.asarray(kern),
            window_strides=self.subsample,
            padding=pad,
            rhs_dilation=self.filter_dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.num_groups,
        )

    def perform(self, node, inputs, output_storage):
        img, kern = inputs
        res = self._jax_forward(img, kern)
        from aesara_tpu.scalar.ops import _np_dtype

        output_storage[0][0] = np.asarray(res).astype(
            _np_dtype(node.outputs[0].type.dtype), copy=False
        )

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.shape import shape as tshape

        out = node.outputs[0]
        return [tuple(tshape(out)[d] for d in range(4))]

    def L_op(self, inputs, outputs, output_grads):
        img, kern = inputs
        (gz,) = output_grads
        g_img = AbstractConv2dGradInputs(self)(kern, gz, img)
        g_kern = AbstractConv2dGradWeights(self)(img, gz, kern)
        return [g_img, g_kern]

    def __str__(self):
        return (f"AbstractConv2d{{{self.border_mode}, sub={self.subsample}, "
                f"flip={self.filter_flip}}}")


class _ConvGradBase(Op):
    """Gradient ops evaluated through jax.vjp of the forward — one
    implementation, both backends."""

    __props__ = ("fwd_props",)

    def __init__(self, fwd: AbstractConv2d):
        self.fwd = fwd
        self.fwd_props = (
            fwd.border_mode, fwd.subsample, fwd.filter_flip,
            fwd.filter_dilation, fwd.num_groups,
        )

    def _vjp(self, img, kern, gz):
        import jax

        _, vjp_fn = jax.vjp(self.fwd._jax_forward, img, kern)
        return vjp_fn(gz)


class AbstractConv2dGradInputs(_ConvGradBase):
    """∂conv/∂image (reference AbstractConv2d_gradInputs)."""

    def make_node(self, kern, gz, img_template):
        kern = as_tensor_variable(kern)
        gz = as_tensor_variable(gz)
        img_template = as_tensor_variable(img_template)
        return Apply(self, [kern, gz, img_template], [img_template.type()])

    def perform(self, node, inputs, output_storage):
        kern, gz, img = inputs
        import jax.numpy as jnp

        g_img, _ = self._vjp(jnp.asarray(img), jnp.asarray(kern), jnp.asarray(gz))
        from aesara_tpu.scalar.ops import _np_dtype

        output_storage[0][0] = np.asarray(g_img).astype(
            _np_dtype(node.outputs[0].type.dtype), copy=False
        )

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[2]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, v) for i, v in enumerate(inputs)]


class AbstractConv2dGradWeights(_ConvGradBase):
    """∂conv/∂kernel (reference AbstractConv2d_gradWeights)."""

    def make_node(self, img, gz, kern_template):
        img = as_tensor_variable(img)
        gz = as_tensor_variable(gz)
        kern_template = as_tensor_variable(kern_template)
        return Apply(self, [img, gz, kern_template], [kern_template.type()])

    def perform(self, node, inputs, output_storage):
        img, gz, kern = inputs
        import jax.numpy as jnp

        _, g_kern = self._vjp(jnp.asarray(img), jnp.asarray(kern), jnp.asarray(gz))
        from aesara_tpu.scalar.ops import _np_dtype

        output_storage[0][0] = np.asarray(g_kern).astype(
            _np_dtype(node.outputs[0].type.dtype), copy=False
        )

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[2]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, v) for i, v in enumerate(inputs)]


def conv2d(
    input,
    filters,
    input_shape=None,
    filter_shape=None,
    border_mode="valid",
    subsample=(1, 1),
    filter_flip=True,
    filter_dilation=(1, 1),
    num_groups=1,
    **kwargs,
):
    """The user-facing conv (reference ``abstract_conv.py`` conv2d)."""
    return AbstractConv2d(
        border_mode, subsample, filter_flip, filter_dilation, num_groups
    )(input, filters)


def conv2d_transpose(
    input, filters, output_shape=None, filter_shape=None,
    border_mode="valid", input_dilation=(1, 1), filter_flip=True,
    num_groups=1,
):
    """Transposed (fractionally-strided) conv via gradInputs of the
    matching forward conv (the reference builds it the same way)."""
    input = as_tensor_variable(input)
    filters = as_tensor_variable(filters)
    if output_shape is None:
        raise ValueError("conv2d_transpose requires output_shape")
    from aesara_tpu.tensor.basic import zeros

    template = zeros(tuple(output_shape), dtype=input.type.dtype)
    fwd = AbstractConv2d(border_mode, input_dilation, filter_flip,
                         (1, 1), num_groups)
    return AbstractConv2dGradInputs(fwd)(filters, input, template)


class AbstractConv3d(AbstractConv2d):
    """NCDHW×OIDHW 3-d convolution (reference ``abstract_conv.py``
    AbstractConv3d) — same MXU primitive with three spatial dims."""

    def __init__(self, border_mode="valid", subsample=(1, 1, 1),
                 filter_flip=True, filter_dilation=(1, 1, 1), num_groups=1,
                 imshp=None, kshp=None):
        super().__init__(border_mode, subsample, filter_flip,
                         filter_dilation, num_groups)

    def make_node(self, img, kern):
        img = as_tensor_variable(img)
        kern = as_tensor_variable(kern)
        if img.type.ndim != 5 or kern.type.ndim != 5:
            raise TypeError("conv3d needs 5-d image (NCDHW) and kernel (OIDHW)")
        dtype = upcast(img.type.dtype, kern.type.dtype)
        b = img.type.shape[0]
        nf = kern.type.shape[0]
        spatial = []
        pad3 = self._norm_border3(kern.type.shape[2:])
        for i in range(3):
            isz = img.type.shape[2 + i]
            ksz = kern.type.shape[2 + i]
            if isz is None or ksz is None or pad3 is None:
                spatial.append(None)
                continue
            keff = (ksz - 1) * self.filter_dilation[i] + 1
            spatial.append(
                (isz + pad3[i][0] + pad3[i][1] - keff) // self.subsample[i] + 1
            )
        return Apply(
            self, [img, kern],
            [TensorType(dtype, (b, nf) + tuple(spatial))()],
        )

    def _norm_border3(self, kshape):
        bm = self.border_mode
        if bm == "valid":
            return ((0, 0),) * 3
        if bm == "full":
            if any(k is None for k in kshape):
                return None
            return tuple((k - 1, k - 1) for k in kshape)
        if bm == "half":
            if any(k is None for k in kshape):
                return None
            return tuple((k // 2, k // 2) for k in kshape)
        if isinstance(bm, int):
            return ((bm, bm),) * 3
        if isinstance(bm, (tuple, list)):
            return tuple(
                (p, p) if isinstance(p, int) else tuple(p) for p in bm
            )
        raise ValueError(f"bad border_mode {bm!r}")

    def _jax_forward(self, img, kern):
        import jax.numpy as jnp
        from jax import lax

        pad = self._norm_border3(kern.shape[2:])
        if self.filter_flip:
            kern = kern[:, :, ::-1, ::-1, ::-1]
        return lax.conv_general_dilated(
            jnp.asarray(img), jnp.asarray(kern),
            window_strides=self.subsample,
            padding=pad,
            rhs_dilation=self.filter_dilation,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            feature_group_count=self.num_groups,
        )


def conv3d(input, filters, input_shape=None, filter_shape=None,
           border_mode="valid", subsample=(1, 1, 1), filter_flip=True,
           filter_dilation=(1, 1, 1), num_groups=1, **kwargs):
    return AbstractConv3d(
        border_mode, subsample, filter_flip, filter_dilation, num_groups
    )(input, filters)
