"""Parity stub (reference ``tensor/blas_c.py``: hand-tuned C gemv/ger).
On TPU these are MXU dot_general — see ``tensor/blas.py``."""

from aesara_tpu.tensor.blas import gemm, gemv, ger  # noqa: F401
