"""Parity stub (reference ``tensor/blas_scipy.py``: SciPy BLAS fallback).
See ``tensor/blas.py``."""

from aesara_tpu.tensor.blas import gemm, gemv, ger  # noqa: F401
