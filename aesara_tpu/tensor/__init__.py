"""The NumPy-like symbolic namespace (``import aesara_tpu.tensor as at``).

Mirrors the reference's ``aesara/tensor/__init__.py`` public surface.
"""

from aesara_tpu.tensor.type import *  # noqa: F401,F403
from aesara_tpu.tensor.type import TensorType, tensor
from aesara_tpu.tensor.var import TensorConstant, TensorVariable
from aesara_tpu.tensor.basic import *  # noqa: F401,F403
from aesara_tpu.tensor.elemwise import CAReduce, DimShuffle, Elemwise
from aesara_tpu.tensor.shape import (
    Reshape,
    Shape,
    Shape_i,
    SpecifyShape,
    reshape,
    shape,
    shape_padaxis,
    shape_padleft,
    shape_padright,
    specify_shape,
    unbroadcast,
)
from aesara_tpu.tensor.math import *  # noqa: F401,F403
from aesara_tpu.tensor import math
from aesara_tpu.tensor.subtensor import (
    AdvancedIncSubtensor,
    AdvancedIncSubtensor1,
    AdvancedSubtensor,
    AdvancedSubtensor1,
    IncSubtensor,
    Subtensor,
    inc_subtensor,
    set_subtensor,
    take,
)
from aesara_tpu.tensor.sort import argsort, argtopk, sort, topk, topk_and_argtopk
from aesara_tpu.graph.ir import Constant
from aesara_tpu.gradient import (
    consider_constant,
    grad,
    hessian,
    jacobian,
)

#: anything convertible by as_tensor_variable (reference TensorLike)
TensorLike = object


# submodules that land in later build stages import lazily:
def __getattr__(name):
    import importlib

    lazy = {
        "extra_ops", "nlinalg", "slinalg", "sort", "special", "fft",
        "random", "nnet", "signal", "io", "blas", "blas_c", "blas_scipy",
        "rewriting", "xlogx", "linalg", "sharedvar", "type_other",
    }
    if name in lazy:
        return importlib.import_module(f"aesara_tpu.tensor.{name}")
    # extra_ops functions surface at the namespace root like the reference
    eo = importlib.import_module("aesara_tpu.tensor.extra_ops")
    if hasattr(eo, name):
        return getattr(eo, name)
    raise AttributeError(f"module 'aesara_tpu.tensor' has no attribute {name!r}")
