"""Legacy conv interface (reference ``aesara/tensor/nnet/conv.py`` —
deprecated there too; ``conv2d:61`` warns and the ``ConvOp`` C kernels
are superseded by abstract_conv).  Kept as a deprecation shim that
forwards to the abstract_conv path (→ ``lax.conv_general_dilated``)."""

import warnings

from aesara_tpu.tensor.nnet.abstract_conv import AbstractConv2d
from aesara_tpu.tensor.nnet.abstract_conv import conv2d as _abstract_conv2d

__all__ = ["conv2d", "ConvOp"]

#: reference ``ConvOp`` — the op actually constructed is the abstract one
ConvOp = AbstractConv2d


def conv2d(input, filters, image_shape=None, filter_shape=None,
           border_mode="valid", subsample=(1, 1), **kwargs):
    """Old-style conv2d (reference ``conv.py:61``): NCHW input, OIHW
    filters, ``image_shape``/``filter_shape`` hints."""
    warnings.warn(
        "aesara_tpu.tensor.nnet.conv.conv2d is deprecated; use "
        "aesara_tpu.tensor.nnet.conv2d (abstract_conv)",
        DeprecationWarning,
        stacklevel=2,
    )
    kwargs.pop("unroll_batch", None)
    kwargs.pop("unroll_kern", None)
    kwargs.pop("unroll_patch", None)
    kwargs.pop("openmp", None)
    return _abstract_conv2d(
        input, filters, input_shape=image_shape, filter_shape=filter_shape,
        border_mode=border_mode, subsample=subsample, **kwargs
    )
