"""Tensor rewrite packs; importing registers them into the global optdb
(reference registers via module import the same way)."""

from aesara_tpu.tensor.rewriting import basic, elemwise, linalg, math, shape, special, subtensor, uncanonicalize, extra_ops  # noqa: F401
from aesara_tpu.tensor import blas as _blas  # noqa: F401  (registers BlasOpt)
