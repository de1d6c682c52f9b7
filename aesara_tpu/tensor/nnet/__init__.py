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
