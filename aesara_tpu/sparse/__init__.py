"""Sparse tensors: SciPy CSR/CSC semantics on the oracle path, BCOO on the
XLA path (reference ``aesara/sparse``, SURVEY §2.6)."""

from aesara_tpu.sparse.type import SparseTensorType
from aesara_tpu.sparse.basic import *  # noqa: F401,F403
from aesara_tpu.sparse import basic  # noqa: F401
from aesara_tpu.sparse.basic import sparse_shared as shared  # noqa: F401
from aesara_tpu.sparse import basic as sharedvar  # noqa: F401  (reference keeps constructors there)


def sparse_grad(var):
    """Mark a dense-gradient RV so its grad stays sparse (reference
    ``sparse/__init__.py sparse_grad``): flips the sp_sum-style flag on
    the variable's tag; ops consult it via structured gradients."""
    var.tag.sparse_grad = True
    return var


def __getattr__(name):
    # lazy: rewriting imports compile.mode, which imports the linkers,
    # which import sparse (circular at package-init time)
    if name == "rewriting":
        import importlib

        return importlib.import_module("aesara_tpu.sparse.rewriting")
    raise AttributeError(f"module 'aesara_tpu.sparse' has no attribute {name!r}")
