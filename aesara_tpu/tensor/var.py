"""``TensorVariable``: the NumPy-like method/operator surface.

Re-design of the reference's ``aesara/tensor/var.py`` (_tensor_py_operators
:25, TensorVariable:855, TensorConstant:1043).  All methods delegate to the
``aesara_tpu.tensor`` op namespace (lazy imports avoid circular deps).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from aesara_tpu.graph.ir import Constant, Variable
from aesara_tpu.tensor.type import TensorType
from aesara_tpu.utils import HashableNDArray



def _coerce_other(other):
    """Convert the foreign operand; None means NotImplemented (let python
    try the reflected op) — but genuine graph errors (shape/dtype
    mismatches) must propagate, not be swallowed."""
    from aesara_tpu.graph.ir import Variable
    from aesara_tpu.tensor.basic import as_tensor_variable

    if isinstance(other, Variable):
        return other
    try:
        return as_tensor_variable(other)
    except (TypeError, ValueError):
        return None


class _tensor_operators:
    """Mixin with the operator overloads (reference ``var.py:25``)."""

    #: make ndarray defer to our reflected dunders (reference var.py:786);
    #: without this ``ndarray + variable`` builds an OBJECT ARRAY of
    #: per-element graphs instead of one symbolic add
    __array_priority__ = 1000

    # --- arithmetic ---
    def __add__(self, other):
        from aesara_tpu.tensor import math as tm

        other = _coerce_other(other)
        if other is None:
            return NotImplemented
        return tm.add(self, other)

    def __radd__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.add(other, self)

    def __sub__(self, other):
        from aesara_tpu.tensor import math as tm

        other = _coerce_other(other)
        if other is None:
            return NotImplemented
        return tm.sub(self, other)

    def __rsub__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.sub(other, self)

    def __mul__(self, other):
        from aesara_tpu.tensor import math as tm

        other = _coerce_other(other)
        if other is None:
            return NotImplemented
        return tm.mul(self, other)

    def __rmul__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.mul(other, self)

    def __truediv__(self, other):
        from aesara_tpu.tensor import math as tm

        other = _coerce_other(other)
        if other is None:
            return NotImplemented
        return tm.true_div(self, other)

    def __rtruediv__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.true_div(other, self)

    def __floordiv__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.int_div(self, other)

    def __rfloordiv__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.int_div(other, self)

    def __mod__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.mod(self, other)

    def __rmod__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.mod(other, self)

    def __divmod__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.divmod_(self, other)

    def __pow__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.pow(self, other)

    def __rpow__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.pow(other, self)

    def __neg__(self):
        from aesara_tpu.tensor import math as tm

        return tm.neg(self)

    def __abs__(self):
        from aesara_tpu.tensor import math as tm

        return tm.abs(self)

    def __matmul__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.matmul(self, other)

    def __rmatmul__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.matmul(other, self)

    # --- bitwise/logical ---
    def __and__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.and_(self, other)

    def __rand__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.and_(other, self)

    def __or__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.or_(self, other)

    def __ror__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.or_(other, self)

    def __xor__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.xor(self, other)

    def __invert__(self):
        from aesara_tpu.tensor import math as tm

        return tm.invert(self)

    def __lshift__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.shift_left(self, other)

    def __rshift__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.shift_right(self, other)

    # --- comparisons (symbolic, like the reference) ---
    def __lt__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.lt(self, other)

    def __le__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.le(self, other)

    def __gt__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.gt(self, other)

    def __ge__(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.ge(self, other)

    def __bool__(self):
        # same contract as the reference: symbolic truthiness is an error,
        # except `var.__eq__` identity checks used by contains/dict ops
        raise TypeError(
            "Cannot evaluate the truth value of a symbolic Variable; "
            "use aesara_tpu.tensor.eq / neq for elementwise comparison"
        )

    def __iter__(self):
        if self.ndim == 0:
            raise TypeError("iteration over a 0-d tensor")
        n = self.type.shape[0]
        if n is None:
            raise TypeError(
                "cannot iterate over a tensor with unknown leading dimension"
            )
        return iter(self[i] for i in range(n))

    # --- indexing ---
    def __getitem__(self, args):
        from aesara_tpu.tensor import subtensor as st

        return st.take_slice(self, args)

    def take(self, indices, axis=None, mode="raise"):
        from aesara_tpu.tensor import subtensor as st

        return st.take(self, indices, axis=axis, mode=mode)

    # --- shapes/structure ---
    @property
    def shape(self):
        from aesara_tpu.tensor.shape import shape as _shape

        return _shape(self)

    @property
    def size(self):
        from aesara_tpu.tensor import math as tm

        if self.ndim == 0:
            from aesara_tpu.tensor.basic import constant as tconst

            return tconst(1, dtype="int64")
        return tm.prod(self.shape)

    @property
    def ndim(self) -> int:
        return self.type.ndim

    @property
    def dtype(self) -> str:
        return self.type.dtype

    @property
    def broadcastable(self):
        return self.type.broadcastable

    @property
    def T(self):
        from aesara_tpu.tensor.basic import transpose

        return transpose(self)

    def transpose(self, *axes):
        from aesara_tpu.tensor.basic import transpose

        if len(axes) == 1 and isinstance(axes[0], (list, tuple)):
            axes = tuple(axes[0])
        return transpose(self, axes or None)

    def reshape(self, shape, ndim=None):
        from aesara_tpu.tensor.shape import reshape

        return reshape(self, shape, ndim=ndim)

    def dimshuffle(self, *pattern):
        from aesara_tpu.tensor.elemwise import DimShuffle

        if len(pattern) == 1 and isinstance(pattern[0], (list, tuple)):
            pattern = tuple(pattern[0])
        return DimShuffle(self.type.ndim, pattern)(self)

    def flatten(self, ndim=1):
        from aesara_tpu.tensor.basic import flatten

        return flatten(self, ndim)

    def ravel(self):
        return self.flatten()

    def squeeze(self, axis=None):
        from aesara_tpu.tensor.extra_ops import squeeze

        return squeeze(self, axis=axis)

    def diagonal(self, offset=0, axis1=0, axis2=1):
        from aesara_tpu.tensor.basic import diagonal

        return diagonal(self, offset, axis1, axis2)

    def astype(self, dtype):
        from aesara_tpu.tensor.basic import cast

        return cast(self, dtype)

    def copy(self, name=None):
        from aesara_tpu.tensor.basic import tensor_copy

        out = tensor_copy(self)
        out.name = name
        return out

    def repeat(self, repeats, axis=None):
        from aesara_tpu.tensor.extra_ops import repeat

        return repeat(self, repeats, axis=axis)

    def round(self, mode="half_to_even"):
        from aesara_tpu.tensor import math as tm

        return tm.round(self, mode)

    def trace(self):
        from aesara_tpu.tensor.nlinalg import trace

        return trace(self)

    def cumsum(self, axis=None):
        from aesara_tpu.tensor.extra_ops import cumsum

        return cumsum(self, axis)

    def cumprod(self, axis=None):
        from aesara_tpu.tensor.extra_ops import cumprod

        return cumprod(self, axis)

    def searchsorted(self, v, side="left", sorter=None):
        from aesara_tpu.tensor.extra_ops import searchsorted

        return searchsorted(self, v, side, sorter)

    def sort(self, axis=-1, kind="quicksort", order=None):
        from aesara_tpu.tensor.sort import sort

        return sort(self, axis, kind, order)

    def argsort(self, axis=-1, kind="quicksort", order=None):
        from aesara_tpu.tensor.sort import argsort

        return argsort(self, axis, kind, order)

    def nonzero(self, return_matrix=False):
        from aesara_tpu.tensor.basic import nonzero

        return nonzero(self, return_matrix)

    def nonzero_values(self):
        from aesara_tpu.tensor.basic import nonzero_values

        return nonzero_values(self)

    def choose(self, choices, mode="raise"):
        from aesara_tpu.tensor.basic import choose

        return choose(self, choices, mode)

    def conj(self):
        from aesara_tpu.tensor import math as tm

        return tm.conj(self)

    conjugate = conj

    @property
    def real(self):
        from aesara_tpu.tensor import math as tm

        return tm.real(self)

    @property
    def imag(self):
        from aesara_tpu.tensor import math as tm

        return tm.imag(self)

    # --- reductions ---
    def sum(self, axis=None, dtype=None, keepdims=False, acc_dtype=None):
        from aesara_tpu.tensor import math as tm

        return tm.sum(self, axis=axis, dtype=dtype, keepdims=keepdims, acc_dtype=acc_dtype)

    def prod(self, axis=None, dtype=None, keepdims=False, acc_dtype=None):
        from aesara_tpu.tensor import math as tm

        return tm.prod(self, axis=axis, dtype=dtype, keepdims=keepdims, acc_dtype=acc_dtype)

    def mean(self, axis=None, dtype=None, keepdims=False, acc_dtype=None):
        from aesara_tpu.tensor import math as tm

        return tm.mean(self, axis=axis, dtype=dtype, keepdims=keepdims, acc_dtype=acc_dtype)

    def var(self, axis=None, ddof=0, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.var(self, axis=axis, ddof=ddof, keepdims=keepdims)

    def std(self, axis=None, ddof=0, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.std(self, axis=axis, ddof=ddof, keepdims=keepdims)

    def min(self, axis=None, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.min(self, axis=axis, keepdims=keepdims)

    def max(self, axis=None, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.max(self, axis=axis, keepdims=keepdims)

    def argmin(self, axis=None, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.argmin(self, axis=axis, keepdims=keepdims)

    def argmax(self, axis=None, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.argmax(self, axis=axis, keepdims=keepdims)

    def all(self, axis=None, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.all(self, axis=axis, keepdims=keepdims)

    def any(self, axis=None, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.any(self, axis=axis, keepdims=keepdims)

    def norm(self, L, axis=None, keepdims=False):
        from aesara_tpu.tensor import math as tm

        return tm.norm(self, L, axis=axis, keepdims=keepdims)

    def dot(self, other):
        from aesara_tpu.tensor import math as tm

        return tm.dot(self, other)

    def clip(self, a_min, a_max):
        from aesara_tpu.tensor import math as tm

        return tm.clip(self, a_min, a_max)

    def fill(self, value):
        from aesara_tpu.tensor.basic import fill

        return fill(self, value)

    def zeros_like(self, dtype=None):
        from aesara_tpu.tensor.basic import zeros_like

        return zeros_like(self, dtype=dtype)

    def ones_like(self, dtype=None):
        from aesara_tpu.tensor.basic import ones_like

        return ones_like(self, dtype=dtype)


class TensorVariable(_tensor_operators, Variable):
    """A tensor-typed symbolic variable (reference ``var.py:855``)."""

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        # identity semantics for containers; elementwise eq is tensor.eq
        return self is other

    def __ne__(self, other):
        return self is not other


class TensorConstantSignature(tuple):
    """Hashable content signature for constants (reference ``var.py``)."""

    def __eq__(self, other):
        if type(self) is not type(other):
            return False
        (t0, d0), (t1, d1) = self, other
        if t0 != t1 or d0.shape != d1.shape:
            return False
        return bool(
            np.array_equal(np.asarray(d0), np.asarray(d1))
            or (
                d0.dtype.kind == "f"
                and np.array_equal(np.isnan(d0), np.isnan(d1))
                and np.array_equal(
                    d0[~np.isnan(d0)] if d0.dtype.kind == "f" else d0,
                    d1[~np.isnan(d1)] if d1.dtype.kind == "f" else d1,
                )
            )
        )

    def __ne__(self, other):
        return not self == other

    def __hash__(self):
        t, d = self
        return hash((type(self), t, d.shape, d.tobytes() if d.size <= 100000 else d.size))


class TensorConstant(TensorVariable, Constant):
    """A constant ndarray (reference ``var.py:1043``)."""

    def __init__(self, type, data, name=None):
        data_shape = np.shape(data)
        # specialize the static shape to the actual data
        if tuple(type.shape) != data_shape:
            type = type.clone(shape=data_shape)
        Constant.__init__(self, type, data, name)

    def signature(self):
        return TensorConstantSignature((self.type, self.data))

    def __hash__(self):
        return hash(self.signature())

    def __eq__(self, other):
        if isinstance(other, TensorConstant):
            return self.signature() == other.signature()
        if isinstance(other, (int, float, np.ndarray)) and self.data.size == 1:
            return bool(np.all(self.data == other))
        return NotImplemented

    def __ne__(self, other):
        result = self.__eq__(other)
        if result is NotImplemented:
            return result
        return not result

    def __str__(self):
        if self.name is not None:
            return self.name
        s = np.array2string(np.asarray(self.data), threshold=5)
        return f"TensorConstant{{{s}}}"

    @property
    def unique_value(self):
        """The single value if all elements are equal, else None."""
        data = np.asarray(self.data)
        if data.size > 0:
            flat = data.ravel()
            if data.size == 1 or bool(np.all(flat == flat[0])):
                return flat[0] if data.size else None
        return None


TensorType.variable_type = TensorVariable
TensorType.constant_type = TensorConstant


# --- reference dense-variable aliases (tensor/var.py tail) -------------------
# every TensorVariable here IS dense (sparse has its own Variable class),
# so the Dense* names are direct aliases; the metaclasses existed to make
# isinstance checks exclude sparse — same semantics via subclassing here.
DenseTensorVariable = TensorVariable
DenseTensorConstant = TensorConstant
DenseVariableMeta = type(TensorVariable)
DenseConstantMeta = type(TensorConstant)


def get_unique_value(x):
    """If ``x`` is a constant filled with one repeated value, return that
    value, else None (reference ``get_unique_value``)."""
    import numpy as np

    if not isinstance(x, TensorConstant):
        return None
    data = np.asarray(x.data)
    if data.size == 0:
        return None
    first = data.ravel()[0]
    if np.all(data == first):
        return first
    return None
