"""Reference import-path alias: ``nnet/corr.py`` (CorrMM CPU correlation
implementations).  On TPU every AbstractConv lowers to ONE
``lax.conv_general_dilated`` (``nnet/abstract_conv.py``); the CorrMM
op-selection layer has no role, so this module forwards to the abstract
interface the reference rewrites CorrMM *from* (grad-op names keep the
reference underscore spelling)."""
from aesara_tpu.tensor.nnet.abstract_conv import (  # noqa: F401
    AbstractConv2d,
    AbstractConv2dGradInputs,
    AbstractConv2dGradWeights,
    conv2d,
)

AbstractConv2d_gradInputs = AbstractConv2dGradInputs
AbstractConv2d_gradWeights = AbstractConv2dGradWeights
