"""Reference-parity namespace ``sandbox.linalg`` (reference
``aesara/sandbox/linalg/__init__.py``).  The rewrites themselves live in
``aesara_tpu.tensor.rewriting.linalg`` (registered on package import);
this module re-exports them plus ``spectral_radius_bound``."""

from aesara_tpu.sandbox.linalg.ops import (  # noqa: F401
    inv_as_solve,
    local_det_chol,
    local_log_prod_sqr,
    no_transpose_symmetric,
    psd_solve_with_chol,
    spectral_radius_bound,
    tag_solve_triangular,
    transinv_to_invtrans,
)
