"""Scalar shared variables (reference ``scalar/sharedvar.py``).

The generic ``shared()`` constructor covers 0-d tensors; this module
keeps the reference's class name for isinstance checks and the
``scalar_constructor`` entry point.
"""

import numpy as np

from aesara_tpu.compile.sharedvalue import SharedVariable, shared

__all__ = ["ScalarSharedVariable", "scalar_constructor"]


class ScalarSharedVariable(SharedVariable):
    """0-d shared variable (reference ``ScalarSharedVariable``)."""


def scalar_constructor(value, name=None, strict=False, allow_downcast=None):
    """Build a 0-d shared variable from a python/numpy scalar."""
    if np.asarray(value).ndim != 0:
        raise TypeError("scalar_constructor requires a scalar value")
    return shared(np.asarray(value), name=name, strict=strict,
                  allow_downcast=allow_downcast)
