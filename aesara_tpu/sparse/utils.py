"""Sparse utilities (reference ``sparse/utils.py``)."""

import numpy as np

__all__ = ["hash_from_sparse"]


def hash_from_sparse(data):
    """Content hash of a scipy sparse matrix (reference
    ``hash_from_sparse``): covers dtype, format, shape, and the three
    CSR/CSC arrays."""
    import hashlib

    import scipy.sparse as sp

    if not sp.issparse(data):
        raise TypeError(f"expected a sparse matrix, got {type(data)}")
    csx = data.tocsr() if data.format not in ("csr", "csc") else data
    h = hashlib.sha256()
    h.update(str((csx.format, csx.dtype, csx.shape)).encode())
    h.update(np.ascontiguousarray(csx.data).tobytes())
    h.update(np.ascontiguousarray(csx.indices).tobytes())
    h.update(np.ascontiguousarray(csx.indptr).tobytes())
    return h.hexdigest()
