"""Hint-tag linalg helpers (reference ``aesara/sandbox/linalg/ops.py``).

The node rewriters were promoted to ``tensor/rewriting/linalg.py`` (the
reference file's own TODO); they are re-exported here under their
reference names.  ``spectral_radius_bound`` is implemented directly.
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.tensor import math as tm
from aesara_tpu.tensor.basic import as_tensor_variable, cast
from aesara_tpu.tensor.rewriting.linalg import (  # noqa: F401
    inv_as_solve,
    local_det_chol,
    local_log_prod_sqr,
    no_transpose_symmetric,
    psd_solve_with_chol,
    tag_solve_triangular,
    transinv_to_invtrans,
)

__all__ = [
    "inv_as_solve", "local_det_chol", "local_log_prod_sqr",
    "no_transpose_symmetric", "psd_solve_with_chol",
    "tag_solve_triangular", "transinv_to_invtrans",
    "spectral_radius_bound",
]


def spectral_radius_bound(X, log2_exponent):
    """Upper bound on the largest eigenvalue of a square symmetric
    matrix: ``trace(X^(2^k))^(2^-k)`` via repeated squaring (V. Pan 1990;
    reference ``spectral_radius_bound``, sandbox/linalg/ops.py:152).
    Larger ``log2_exponent`` = tighter and slower; each squaring is one
    MXU matmul."""
    if not isinstance(log2_exponent, int) or log2_exponent <= 0:
        raise ValueError("log2_exponent must be a positive integer")
    X = as_tensor_variable(X)
    if X.type.ndim != 2:
        raise TypeError("spectral_radius_bound requires a matrix")
    XX = X
    for _ in range(log2_exponent):
        XX = tm.dot(XX, XX)
    from aesara_tpu.tensor.nlinalg import trace

    return tm.pow(trace(XX), 2.0 ** (-log2_exponent))
