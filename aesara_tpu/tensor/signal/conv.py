"""2D signal convolution (reference ``tensor/signal/conv.py:28``):
single images / stacks of 2D images against 2D filter(s), built on the
nnet conv2d (→ one ``lax.conv_general_dilated`` on TPU)."""

from __future__ import annotations

__all__ = ["conv2d"]


def conv2d(input, filters, image_shape=None, filter_shape=None,
           border_mode="valid", subsample=(1, 1), **kwargs):
    """Basic 2D convolution: ``input`` ([num_images,] h, w) with
    ``filters`` ([num_filters,] fh, fw) → ([num_images,] [num_filters,]
    oh, ow) following the reference's dim contract."""
    from aesara_tpu.tensor.basic import as_tensor_variable
    from aesara_tpu.tensor.nnet.abstract_conv import conv2d as nnet_conv2d

    input = as_tensor_variable(input)
    filters = as_tensor_variable(filters)
    if input.type.ndim not in (2, 3) or filters.type.ndim not in (2, 3):
        raise ValueError(
            "signal.conv2d: input and filters must be 2D or 3D, got "
            f"{input.type.ndim}D and {filters.type.ndim}D"
        )
    batched_im = input.type.ndim == 3
    batched_f = filters.type.ndim == 3
    im4 = input if batched_im else input.dimshuffle("x", 0, 1)
    f4 = filters if batched_f else filters.dimshuffle("x", 0, 1)
    out = nnet_conv2d(
        im4.dimshuffle(0, "x", 1, 2),      # (n, 1, h, w)
        f4.dimshuffle(0, "x", 1, 2),       # (k, 1, fh, fw)
        border_mode=border_mode,
        subsample=tuple(subsample),
        **kwargs,
    )                                       # (n, k, oh, ow)
    if batched_im and batched_f:
        return out
    if batched_im:
        return out[:, 0]
    if batched_f:
        return out[0]
    return out[0, 0]
