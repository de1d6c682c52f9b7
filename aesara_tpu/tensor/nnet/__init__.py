"""Neural-network ops (reference ``aesara/tensor/nnet/``: abstract_conv.py
3,721 LoC, basic.py 2,156 LoC, batchnorm.py, signal/pool.py 2,567 LoC).

TPU-native design: the reference lowers AbstractConv2d to hand-written
C gemm kernels (``corr_gemm.c``); here convolution IS
``lax.conv_general_dilated`` on the MXU and pooling IS
``lax.reduce_window`` (SURVEY §2.11 item 5) — the gradient ops evaluate
the transposed forms through jax.vjp of the same primitive so both
backends agree bit-for-bit.
"""

from aesara_tpu.tensor.nnet.basic import (
    binary_crossentropy,
    categorical_crossentropy,
    confusion_matrix,
    elu,
    hard_sigmoid,
    relu,
    selu,
    sigmoid,
    sigmoid_binary_crossentropy,
    softmax,
    softmax_with_bias,
    softplus,
    ultra_fast_sigmoid,
    crossentropy_softmax_1hot,
    crossentropy_softmax_1hot_with_bias,
    crossentropy_categorical_1hot,
)
from aesara_tpu.tensor.nnet.abstract_conv import (
    AbstractConv2d,
    conv2d,
    conv2d_transpose,
)
from aesara_tpu.tensor.nnet.batchnorm import (
    batch_normalization,
    batch_normalization_test,
    batch_normalization_train,
)
from aesara_tpu.tensor.nnet.pool import Pool, max_pool_2d, pool_2d

# reference nnet/__init__ completions
from aesara_tpu.tensor.nnet.abstract_conv import conv2d as abstract_conv2d  # noqa: F401
from aesara_tpu.tensor.nnet.abstract_conv import conv3d  # noqa: F401
from aesara_tpu.tensor.nnet.abstract_conv import conv2d_transpose as conv2d_grad_wrt_inputs  # noqa: F401
from aesara_tpu.tensor.nnet.basic import (  # noqa: F401
    crossentropy_categorical_1hot_grad,
    crossentropy_softmax_1hot_with_bias_dx,
    crossentropy_softmax_argmax_1hot_with_bias,
    crossentropy_softmax_max_and_argmax_1hot,
    crossentropy_softmax_max_and_argmax_1hot_with_bias,
    h_softmax,
    logsoftmax,
    prepend_0_to_each_row,
    prepend_1_to_each_row,
    prepend_scalar_to_each_row,
    softmax_grad_legacy,
    softmax_legacy,
    softsign,
)
_REWRITE_ALIASES = {
    "softmax_simplifier",
    "crossentropy_to_crossentropy_with_softmax",
    "crossentropy_to_crossentropy_with_softmax_with_bias",
    "graph_merge_softmax_with_crossentropy_softmax",
}


def __getattr__(name):
    # lazy: the rewrite pack imports compile.mode, which is mid-init when
    # the linker imports this package
    if name in _REWRITE_ALIASES:
        from aesara_tpu.tensor.rewriting import special as _special

        return getattr(_special, name)
    raise AttributeError(f"module 'aesara_tpu.tensor.nnet' has no attribute {name!r}")


def separable_conv2d(input, depthwise_filters, pointwise_filters,
                     num_channels, **kwargs):
    """Depthwise conv (grouped, one group per input channel) then 1x1
    pointwise (reference ``abstract_conv.py separable_conv2d``).
    ``depthwise_filters``: (num_channels * multiplier, 1, h, w); group c
    (filters [c*m:(c+1)*m]) convolves input channel c.  Channel counts
    are static, so the groups unroll at graph-build time."""
    from aesara_tpu.tensor.basic import join
    from aesara_tpu.tensor.nnet.abstract_conv import conv2d

    num_channels = int(num_channels)
    # constant slice bounds whenever the filter count is static — a
    # symbolic ``shape[0] // num_channels`` makes every group slice
    # dynamic-shaped and kicks the whole graph off XLA
    static_n = depthwise_filters.type.shape[0]
    mult_expr = (static_n // num_channels if static_n is not None
                 else depthwise_filters.shape[0] // num_channels)
    chans = []
    for c in range(num_channels):
        img_c = input[:, c:c + 1]
        filt_c = depthwise_filters[c * mult_expr:(c + 1) * mult_expr]
        chans.append(conv2d(img_c, filt_c, **kwargs))
    depth_out = join(1, *chans)
    return conv2d(depth_out, pointwise_filters, border_mode="valid")
