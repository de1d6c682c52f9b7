"""BLAS-name module (reference ``aesara/tensor/blas.py``, 2,756 LoC of
Gemv/Ger/Gemm/Dot22 C bindings + GemmOptimizer).

On TPU there is no BLAS: every product lowers to the MXU through
``dot_general`` (SURVEY §2.11 item 4), and XLA's own fusion plays the
GemmOptimizer role.  This module keeps the reference's import surface so
``from aesara.tensor.blas import gemm`` ports unchanged."""

from aesara_tpu.tensor.math import (  # noqa: F401
    BatchedDot,
    Dot,
    batched_dot,
    dot,
    gemm,
    gemv,
    ger,
)


def batched_tensordot(x, y, axes=2):
    from aesara_tpu.tensor.math import tensordot

    # batch dim 0 on both: map tensordot over it
    from aesara_tpu.tensor.basic import stack
    from aesara_tpu.scan.views import map as scan_map

    res, _ = scan_map(lambda a, b: tensordot(a, b, axes=axes),
                      sequences=[x, y])
    return res


#: reference alias
Dot22 = Dot
