"""may_share_memory (reference ``aesara/misc/may_share_memory.py``)."""

import numpy as np


def may_share_memory(a, b, raise_other_type=True):
    a_nd = isinstance(a, np.ndarray)
    b_nd = isinstance(b, np.ndarray)
    if a_nd and b_nd:
        return np.may_share_memory(a, b)
    try:
        import scipy.sparse as sp

        if sp.issparse(a) or sp.issparse(b):
            def parts(x):
                return [x.data, x.indices, x.indptr] if sp.issparse(x) else [x]

            return any(
                np.may_share_memory(x, y)
                for x in parts(a) for y in parts(b)
                if isinstance(x, np.ndarray) and isinstance(y, np.ndarray)
            )
    except ImportError:
        pass
    if raise_other_type:
        raise TypeError("may_share_memory: unsupported types")
    return False
