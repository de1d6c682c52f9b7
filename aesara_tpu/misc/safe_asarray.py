"""dtype-stable asarray (reference ``misc/safe_asarray.py``)."""

import numpy as np

__all__ = ["_asarray"]


def _asarray(a, dtype, order=None):
    """np.asarray that GUARANTEES the requested dtype name sticks
    (reference ``_asarray``: plain asarray can silently keep a wider
    dtype on some platforms)."""
    if str(dtype) == "bfloat16":
        import ml_dtypes

        return np.asarray(a, order=order).astype(ml_dtypes.bfloat16)
    dtype = np.dtype(dtype)
    rval = np.asarray(a, dtype=dtype, order=order)
    if rval.dtype.num != dtype.num:
        rval = rval.view(dtype=dtype)
    return rval
