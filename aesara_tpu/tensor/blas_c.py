"""Reference ``tensor/blas_c.py`` surface (hand-tuned C gemv/ger kernels
+ the use_c_blas registrations).  On TPU the kernels are the MXU
``dot_general`` lowerings of the fused ops in ``tensor/blas.py``; the
inplace ("destructive") instances exported here are what the reference's
C path would have produced after its position-70 specializations."""

from aesara_tpu.tensor.blas import (  # noqa: F401
    Gemv,
    Ger,
    gemv,
    gemv_inplace,
    gemv_no_inplace,
    ger,
    ger_inplace,
    ger_no_inplace,
)

#: reference names for the destructive variants
CGemv = Gemv
CGer = Ger
