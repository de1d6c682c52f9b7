"""Tensor-layer exception taxonomy (reference ``aesara/tensor/exceptions.py``)."""

from aesara_tpu.tensor.basic import NotScalarConstantError

__all__ = ["ShapeError", "NotScalarConstantError", "AdvancedIndexingError",
           "EmptyConstantError"]


class ShapeError(Exception):
    """Shape inference failed (reference ``ShapeError:1``)."""


class AdvancedIndexingError(TypeError):
    """Malformed advanced-indexing expression (reference
    ``AdvancedIndexingError:12``)."""


class EmptyConstantError(NotScalarConstantError):
    """Constant extraction hit an empty value (reference)."""
