"""Reference ``tensor/blas_scipy.py`` surface (SciPy BLAS fallback ops).
On TPU there is no BLAS fallback chain — the same fused ops lower to the
MXU unconditionally (see ``tensor/blas.py``)."""

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

ScipyGer = Ger
