"""``SharedVariable``: graph variables with persistent state.

Re-design of the reference's ``aesara/compile/sharedvalue.py``
(SharedVariable:30, shared_constructor:213, shared:166).  On the XLA path
the container holds a device buffer; updated shareds are donated to the
jitted program so updates are in-place in HBM.
"""

from __future__ import annotations

from functools import singledispatch
from typing import Any, Optional

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.graph.ir import Variable
from aesara_tpu.link.basic import Container


__all__ = ["SharedVariable", "shared", "shared_constructor"]


class SharedVariable(Variable):
    """A Variable with a value that persists between function calls."""

    def __init__(self, type, value, name=None, strict=False, allow_downcast=None,
                 container: Optional[Container] = None):
        super().__init__(type=type, owner=None, index=None, name=name)
        if container is not None:
            self.container = container
            if value is not None or strict:
                raise TypeError("container and value are mutually exclusive")
        else:
            self.container = Container(
                type,
                storage=[type.filter(value, strict=strict, allow_downcast=allow_downcast)],
                readonly=False,
                strict=strict,
                allow_downcast=allow_downcast,
                name=name,
            )
        # RandomStream bookkeeping (reference sets these on RNG shareds)
        self.default_update: Optional[Variable] = None

    def get_value(self, borrow: bool = False, return_internal_type: bool = False):
        val = self.container.value
        if borrow or return_internal_type:
            return val
        return np.array(val) if isinstance(val, np.ndarray) else _to_host_copy(val)

    def set_value(self, new_value, borrow: bool = False):
        if borrow:
            self.container.value = new_value
        else:
            self.container.value = (
                new_value.copy() if isinstance(new_value, np.ndarray) else new_value
            )

    def get_test_value(self):
        return self.get_value(borrow=True, return_internal_type=True)

    def zero(self, borrow: bool = False):
        """Set all values to 0 (reference helper)."""
        val = self.container.value
        self.container.value = np.zeros_like(np.asarray(val))

    def clone(self, **kwargs):
        cp = self.__class__(
            type=kwargs.pop("type", self.type), value=None, name=self.name,
            container=self.container,
        )
        cp.tag = self.tag
        cp.default_update = self.default_update
        return cp

    @property
    def value(self):
        raise AttributeError("use get_value()/set_value()")

    def __str__(self):
        return self.name or f"<Shared:{self.type}>"


def _to_host_copy(val):
    try:
        return np.asarray(val).copy()
    except Exception:
        return val


@singledispatch
def shared_constructor(value, name=None, strict=False, allow_downcast=None, **kwargs):
    """Dispatch on value type → appropriate SharedVariable subclass
    (reference ``sharedvalue.py:213``)."""
    raise TypeError(f"no shared constructor for {type(value)}")


def shared(value, name=None, strict=False, allow_downcast=None, **kwargs):
    """Make a SharedVariable holding ``value`` (reference ``:166``)."""
    if isinstance(value, Variable):
        raise TypeError("shared() takes a value, not a Variable")
    try:
        sv = shared_constructor(
            value, name=name, strict=strict, allow_downcast=allow_downcast, **kwargs
        )
        collect_new_shareds._notify(sv)
        return sv
    except TypeError:
        pass
    # default: tensors from ndarrays / python numbers
    sv = _tensor_shared(value, name, strict, allow_downcast, **kwargs)
    collect_new_shareds._notify(sv)
    return sv


def _tensor_shared(value, name=None, strict=False, allow_downcast=None,
                   borrow=False, shape=None, broadcastable=None, target=None, sharding=None):
    from aesara_tpu.tensor.type import TensorType
    from aesara_tpu.tensor.var import TensorConstant, _tensor_operators

    if isinstance(value, np.ndarray):
        # reference semantics: the shared container OWNS its buffer —
        # copy unless the caller explicitly lends it with borrow=True
        # (review finding: external mutation silently changed state)
        arr = value if borrow else value.copy()
    else:
        arr = np.asarray(value)
    if isinstance(value, (bool, int, float, complex)) and not isinstance(
        value, (np.ndarray, np.generic)
    ):
        # python scalars: keep python float→floatX convention of the reference
        if isinstance(value, bool):
            dtype = "bool"
        elif isinstance(value, int):
            dtype = "int64"
        elif isinstance(value, float):
            dtype = config.floatX
        else:
            dtype = "complex128"
        arr = np.asarray(value, dtype=dtype)
    if shape is None and broadcastable is not None:
        shape = tuple(1 if b else s for b, s in zip(broadcastable, arr.shape))
    ttype = TensorType(
        "bfloat16" if str(arr.dtype) == "bfloat16" else arr.dtype.name,
        shape if shape is not None else arr.shape,
        sharding=sharding,
    )
    return TensorSharedVariable(
        ttype, arr, name=name, strict=strict, allow_downcast=allow_downcast
    )


from aesara_tpu.tensor.var import _tensor_operators as _tensor_ops  # noqa: E402


class TensorSharedVariable(_tensor_ops, SharedVariable):
    """Shared ndarray with the full tensor operator surface."""

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class collect_new_shareds:
    """Context manager recording shared variables created inside it
    (reference ``collect_new_shareds``)."""

    _active: list = []

    def __enter__(self):
        self.new_shareds: list = []
        collect_new_shareds._active.append(self)
        return self

    def __exit__(self, *exc):
        collect_new_shareds._active.remove(self)
        return False

    @classmethod
    def _notify(cls, sv):
        for ctx in cls._active:
            ctx.new_shareds.append(sv)
