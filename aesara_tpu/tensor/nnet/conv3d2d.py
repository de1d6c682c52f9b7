"""conv3d2d (reference ``aesara/tensor/nnet/conv3d2d.py``: 3-d conv
built from stacked 2-d convs to reuse the 2-d C kernels).  On TPU the
native 3-d primitive IS available, so this delegates to AbstractConv3d;
the signature matches the reference (b, t, c, h, w layout)."""

from __future__ import annotations

from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.nnet.abstract_conv import conv3d as _conv3d


def conv3d(signals, filters, signals_shape=None, filters_shape=None,
           border_mode="valid"):
    """signals: (b, t, c, h, w); filters: (nf, ft, c, fh, fw)."""
    signals = as_tensor_variable(signals)
    filters = as_tensor_variable(filters)
    # reorder to NCDHW / OIDHW
    s = signals.dimshuffle(0, 2, 1, 3, 4)
    f = filters.dimshuffle(0, 2, 1, 3, 4)
    out = _conv3d(s, f, border_mode=border_mode)
    return out.dimshuffle(0, 2, 1, 3, 4)
