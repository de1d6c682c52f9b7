"""Sparse shared variables (reference ``sparse/sharedvar.py``):
registers scipy sparse matrices with the generic ``shared()``
constructor so ``aesara_tpu.shared(sp.csr_matrix(...))`` works."""

import scipy.sparse

from aesara_tpu.compile.sharedvalue import SharedVariable, shared_constructor
from aesara_tpu.sparse.basic import SparseTensorType, SparseVariable, sparse_shared

__all__ = ["SparseTensorSharedVariable", "sparse_constructor"]


class SparseTensorSharedVariable(SparseVariable, SharedVariable):
    """Shared variable holding a scipy sparse matrix (reference
    ``SparseTensorSharedVariable`` — inherits the sparse operator sugar
    so ``s * 2`` builds sparse ops, not dense elemwise)."""

    @property
    def format(self):
        return self.type.format

    def get_value(self, borrow=False, return_internal_type=False):
        # the generic path would np.asarray a sparse matrix into a 0-d
        # object array; sparse values copy with scipy's own .copy()
        val = self.container.value
        if borrow or return_internal_type:
            return val
        return val.copy()


def sparse_constructor(value, name=None, strict=False, allow_downcast=None,
                       borrow=False, format=None, **kwargs):
    fmt = format or value.format
    stype = SparseTensorType(fmt, value.dtype.name)
    val = value if borrow else value.copy()
    return SparseTensorSharedVariable(
        stype, val.asformat(fmt), name=name, strict=strict,
        allow_downcast=allow_downcast,
    )


@shared_constructor.register(scipy.sparse.spmatrix)
def _shared_from_spmatrix(value, name=None, strict=False,
                          allow_downcast=None, **kwargs):
    return sparse_constructor(value, name=name, strict=strict,
                              allow_downcast=allow_downcast, **kwargs)
