"""``SparseTensorType``: CSR/CSC sparse matrices
(reference ``aesara/sparse/type.py:35``, a TensorType subclass wrapping
SciPy sparse)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from aesara_tpu.tensor.type import TensorType


class SparseTensorType(TensorType):
    """dtype + format ('csr'|'csc') + 2-d shape."""

    format_cls = {"csr": sp.csr_matrix, "csc": sp.csc_matrix}

    def __init__(self, format: str, dtype: str, shape=None, name=None, **kwargs):
        if format not in self.format_cls:
            raise ValueError(f"unsupported sparse format {format!r}")
        self.format = format
        super().__init__(dtype, shape if shape is not None else (None, None),
                         name=name)
        if self.ndim != 2:
            raise TypeError("sparse tensors are 2-d")

    def clone(self, dtype=None, shape=None, **kwargs):
        return type(self)(self.format, dtype or self.dtype,
                          self.shape if shape is None else shape)

    def filter(self, data, strict=False, allow_downcast=None):
        if strict:
            if not sp.issparse(data) or data.format != self.format:
                raise TypeError(f"{self} (strict) needs a {self.format} matrix")
            if data.dtype != np.dtype(self.dtype):
                raise TypeError(f"{self} (strict) got dtype {data.dtype}")
            return data
        if sp.issparse(data):
            converted = data.asformat(self.format)
        else:
            converted = self.format_cls[self.format](np.asarray(data))
        if converted.dtype != np.dtype(self.dtype):
            # reference filter (sparse/type.py): format conversion is
            # free, but a precision-LOSING dtype cast needs an explicit
            # allow_downcast — never silent
            if not allow_downcast:
                from aesara_tpu.scalar.ops import upcast

                if upcast(self.dtype, converted.dtype.name) != self.dtype:
                    raise TypeError(
                        f"{self}: expected {self.dtype}, got "
                        f"{converted.dtype} (pass allow_downcast to cast)"
                    )
            converted = converted.astype(self.dtype)
        for want, got in zip(self.shape, converted.shape):
            if want is not None and want != got:
                raise TypeError(f"{self}: shape mismatch {converted.shape}")
        return converted

    def values_eq(self, a, b):
        return (
            a.shape == b.shape
            and abs(a - b).nnz == 0
        )

    def values_eq_approx(self, a, b, tolerance=1e-4):
        if a.shape != b.shape:
            return False
        diff = abs(a - b)
        if diff.nnz == 0:
            return True
        return bool(np.max(np.abs(diff.data)) <= tolerance * max(1.0, float(np.max(np.abs(a.data)) if a.nnz else 0.0)))

    def is_super(self, otype):
        return (
            isinstance(otype, SparseTensorType)
            and otype.format == self.format
            and super().is_super(otype)
        )

    def __eq__(self, other):
        return (
            type(other) is SparseTensorType
            and other.format == self.format
            and other.dtype == self.dtype
            and other.shape == self.shape
        )

    def __hash__(self):
        return hash((SparseTensorType, self.format, self.dtype, self.shape))

    def __str__(self):
        return f"Sparse[{self.dtype}, {self.format}]"

    def value_zeros(self, shape):
        return self.format_cls[self.format](tuple(int(s) for s in shape),
                                            dtype=self.dtype)
