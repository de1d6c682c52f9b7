"""Sparse tensors: SciPy CSR/CSC semantics on the oracle path, BCOO on the
XLA path (reference ``aesara/sparse``, SURVEY §2.6)."""

from aesara_tpu.sparse.type import SparseTensorType
from aesara_tpu.sparse.basic import *  # noqa: F401,F403
from aesara_tpu.sparse import basic  # noqa: F401
from aesara_tpu.sparse.basic import sparse_shared as shared  # noqa: F401
from aesara_tpu.sparse import sharedvar  # noqa: F401  (registers the shared() constructor)


def sparse_grad(var):
    """Return a new variable whose gradient is stored sparse (reference
    ``sparse/__init__.py sparse_grad``): supported for
    ``a_tensor[int_vector]`` (AdvancedSubtensor1) — the grad becomes a
    sparse matrix of the gathered rows instead of dense zeros+scatter."""
    from aesara_tpu.tensor.subtensor import AdvancedSubtensor1

    if var.owner is None or not isinstance(var.owner.op, AdvancedSubtensor1):
        raise TypeError(
            "sparse_grad is only implemented for AdvancedSubtensor1 "
            "(a_tensor[an_int_vector])"
        )
    x, ilist = var.owner.inputs
    return AdvancedSubtensor1(sparse_grad=True)(x, ilist)


def __getattr__(name):
    # lazy: rewriting imports compile.mode, which imports the linkers,
    # which import sparse (circular at package-init time)
    if name == "rewriting":
        import importlib

        return importlib.import_module("aesara_tpu.sparse.rewriting")
    raise AttributeError(f"module 'aesara_tpu.sparse' has no attribute {name!r}")
