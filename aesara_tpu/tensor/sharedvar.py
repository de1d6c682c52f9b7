"""Tensor shared-variable machinery (reference ``tensor/sharedvar.py``:
TensorSharedVariable, tensor_constructor, scalar_constructor)."""

from aesara_tpu.compile.sharedvalue import SharedVariable, shared


class TensorSharedVariable(SharedVariable):
    """parity name; all tensor shareds are this shape here"""


def tensor_constructor(value, name=None, strict=False, allow_downcast=None,
                       borrow=False, shape=None, **kwargs):
    return shared(value, name=name, borrow=borrow, **kwargs)


scalar_constructor = tensor_constructor


class ScalarSharedVariable(TensorSharedVariable):
    """0-d shared value (reference ``tensor/sharedvar.py
    ScalarSharedVariable`` — there a distinct aesara.scalar-typed shared;
    here scalars are 0-d tensors, so this is the same container)."""
