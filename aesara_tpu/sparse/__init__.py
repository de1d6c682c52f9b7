"""Sparse tensors: SciPy CSR/CSC semantics on the oracle path, BCOO on the
XLA path (reference ``aesara/sparse``, SURVEY §2.6)."""

from aesara_tpu.sparse.type import SparseTensorType
from aesara_tpu.sparse.basic import *  # noqa: F401,F403
from aesara_tpu.sparse import basic  # noqa: F401
