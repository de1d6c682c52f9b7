"""``TensorType``: dtype + static shape (tuple with None for unknown dims),
plus the standard constructors (scalar/vector/matrix/...).

Re-design of the reference's ``aesara/tensor/type.py:57``.  Differences by
design (TPU-first):

- carries an optional ``sharding`` annotation slot (a
  ``jax.sharding.PartitionSpec``-like tuple) from day one — SURVEY §7
  stage 1;
- "broadcastable" is derived: dim i is broadcastable iff ``shape[i] == 1``
  (matching the modern reference semantics).
"""

from __future__ import annotations

from typing import Any, Iterable, Optional, Sequence, Tuple, Union

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.graph.ir import Constant, Type, Variable
from aesara_tpu.graph.op import get_test_value
from aesara_tpu.scalar.ops import _np_dtype, all_dtypes, discrete_dtypes, upcast


__all__ = [
    "TensorType",
    "DenseTensorType",
    "values_eq_approx",
    "tensor",
    "scalar", "vector", "matrix", "row", "col", "tensor3", "tensor4",
    "tensor5", "tensor6", "tensor7",
    "scalars", "vectors", "matrices",
    "iscalar", "lscalar", "fscalar", "dscalar", "bscalar", "wscalar", "zscalar", "cscalar",
    "ivector", "lvector", "fvector", "dvector", "bvector", "wvector",
    "imatrix", "lmatrix", "fmatrix", "dmatrix", "bmatrix", "wmatrix",
    "itensor3", "ltensor3", "ftensor3", "dtensor3",
    "itensor4", "ltensor4", "ftensor4", "dtensor4",
]


class TensorType(Type):
    """An ndarray type with fixed dtype and static shape info."""

    __props__ = ("dtype", "shape")
    ndim: int

    def __init__(
        self,
        dtype: str,
        shape: Optional[Sequence[Optional[int]]] = None,
        name: Optional[str] = None,
        broadcastable: Optional[Sequence[bool]] = None,
        sharding=None,
    ):
        if broadcastable is not None and shape is None:
            # legacy constructor: broadcastable flags → shape with 1s/Nones
            shape = tuple(1 if b else None for b in broadcastable)
        if shape is None:
            shape = ()
        if dtype == "floatX":
            dtype = config.floatX
        if dtype == "intX":
            dtype = config.intX
        self.dtype = np.dtype(dtype).name if dtype != "bfloat16" else "bfloat16"
        if self.dtype not in all_dtypes:
            raise TypeError(f"unsupported dtype {dtype!r}")

        def norm(s):
            if s is None:
                return None
            if isinstance(s, (bool, np.bool_)):
                raise TypeError("shape entries cannot be booleans")
            return int(s)

        self.shape: Tuple[Optional[int], ...] = tuple(norm(s) for s in shape)
        self.name = name
        self.sharding = sharding  # optional PartitionSpec-like annotation

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def broadcastable(self) -> Tuple[bool, ...]:
        return tuple(s == 1 for s in self.shape)

    def clone(self, dtype=None, shape=None, sharding=None, **kwargs) -> "TensorType":
        return type(self)(
            dtype or self.dtype,
            self.shape if shape is None else shape,
            name=self.name,
            sharding=self.sharding if sharding is None else sharding,
        )

    # --- value admission -----------------------------------------------------

    def filter(self, data: Any, strict: bool = False, allow_downcast=None):
        np_dtype = _np_dtype(self.dtype)
        if isinstance(data, Variable):
            raise TypeError("cannot use a Variable as a Type value")
        if strict:
            if not isinstance(data, np.ndarray):
                raise TypeError(f"{self} (strict) requires an ndarray, got {type(data)}")
            if data.dtype != np_dtype:
                raise TypeError(f"{self} (strict) got dtype {data.dtype}")
            converted = data
        else:
            # python literals (floats/lists) may downcast into floatX
            # land; float64 NDARRAYS may not without allow_downcast
            # (reference tensor/type.py filter: silent precision loss on
            # real data is an error, literals are convenience)
            was_python_literal = not isinstance(data, np.ndarray)
            arr = np.asarray(data)
            if arr.dtype == np_dtype:
                converted = arr
            elif allow_downcast or (
                allow_downcast is None
                and (
                    np.can_cast(arr.dtype, np_dtype)
                    # floatX policy: allow float64 LITERALS into float32
                    or (
                        was_python_literal
                        and arr.dtype.kind == "f"
                        and self.dtype in ("float32", "bfloat16", "float16")
                    )
                    # python int literals
                    or (
                        arr.dtype.kind in "iu"
                        and self.dtype in discrete_dtypes
                        and np.all(arr == arr.astype(np_dtype))
                    )
                )
            ):
                converted = arr.astype(np_dtype)
            else:
                raise TypeError(
                    f"cannot convert dtype {arr.dtype} to {self.dtype} "
                    f"without risking precision loss"
                )
        if converted.ndim != self.ndim:
            raise TypeError(
                f"{self}: wrong ndim, expected {self.ndim}, got {converted.ndim} "
                f"(shape {converted.shape})"
            )
        for want, got in zip(self.shape, converted.shape):
            if want is not None and want != got:
                raise TypeError(
                    f"{self}: shape mismatch, expected {self.shape}, got {converted.shape}"
                )
        return converted

    def filter_variable(self, other, allow_convert: bool = True):
        if not isinstance(other, Variable):
            other = self.constant_type(type=self.clone(shape=np.shape(other)), data=other)
        if other.type == self:
            return other
        if allow_convert:
            conv = self.convert_variable(other)
            if conv is not None:
                return conv
        raise TypeError(f"cannot convert {other} of type {other.type} to {self}")

    def convert_variable(self, var):
        vtype = var.type
        if not isinstance(vtype, TensorType):
            if getattr(vtype, "ndim", None) == 0 and hasattr(vtype, "dtype"):
                # a ScalarType value lifts to a 0-d tensor
                from aesara_tpu.tensor.basic import tensor_from_scalar

                if self.ndim == 0 and vtype.dtype == self.dtype:
                    return tensor_from_scalar(var)
            return None
        if vtype.dtype != self.dtype or vtype.ndim != self.ndim:
            return None
        # shapes compatible? self more specific → SpecifyShape; self less → ok
        if self.is_super(vtype):
            return var
        if all(
            s is None or v is None or s == v for s, v in zip(self.shape, vtype.shape)
        ):
            if any(s is not None and v is None for s, v in zip(self.shape, vtype.shape)):
                from aesara_tpu.tensor.shape import specify_shape

                return specify_shape(var, self.shape)
            return var
        return None

    def is_super(self, otype) -> bool:
        """self ⊇ otype: every value of otype is valid for self."""
        return (
            isinstance(otype, TensorType)
            and self.dtype == otype.dtype
            and self.ndim == otype.ndim
            and all(
                s is None or s == o
                for s, o in zip(self.shape, otype.shape)
            )
        )

    def in_same_class(self, otype) -> bool:
        return (
            isinstance(otype, TensorType)
            and self.dtype == otype.dtype
            and self.broadcastable == otype.broadcastable
        )

    # --- value equality --------------------------------------------------------

    def values_eq(self, a, b) -> bool:
        if a.shape != b.shape or a.dtype != b.dtype:
            return False
        if str(a.dtype).startswith("float") or str(a.dtype) == "bfloat16":
            af, bf = np.asarray(a, np.float64), np.asarray(b, np.float64)
            return bool(np.all((af == bf) | (np.isnan(af) & np.isnan(bf))))
        return bool(np.array_equal(np.asarray(a), np.asarray(b)))

    def values_eq_approx(self, a, b, allow_remove_inf=False, allow_remove_nan=False,
                         rtol=None, atol=None) -> bool:
        return values_eq_approx(a, b, allow_remove_inf, allow_remove_nan, rtol, atol)

    # --- misc --------------------------------------------------------------------

    def value_zeros(self, shape):
        return np.zeros(shape, dtype=_np_dtype(self.dtype))

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.dtype == other.dtype
            and self.shape == other.shape
        )

    def __hash__(self):
        return hash((type(self), self.dtype, self.shape))

    def __str__(self):
        if self.name:
            return self.name
        names = {0: "Scalar", 1: "Vector", 2: "Matrix", 3: "Tensor3",
                 4: "Tensor4", 5: "Tensor5", 6: "Tensor6", 7: "Tensor7"}
        base = names.get(self.ndim, f"Tensor{self.ndim}")
        if any(s is not None for s in self.shape):
            return f"{base}({self.dtype}, shape={self.shape})"
        return f"{base}({self.dtype})"

    def __repr__(self):
        return f"TensorType({self.dtype}, {self.shape})"


# Alias used by sparse code to mean "the dense type"
DenseTensorType = TensorType


def values_eq_approx(
    a, b, allow_remove_inf=False, allow_remove_nan=False, rtol=None, atol=None
) -> bool:
    """Approximate ndarray equality with nan/inf handling (reference
    ``tensor/type.py:646``)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        return False
    if a.dtype != b.dtype:
        return False
    if str(a.dtype) in discrete_dtypes:
        return bool(np.array_equal(a, b))
    af = np.asarray(a, dtype=np.float64)
    bf = np.asarray(b, dtype=np.float64)
    if rtol is None:
        rtol = 1e-5 if str(a.dtype) in ("float32", "bfloat16", "float16") else 1e-8
        if str(a.dtype) in ("float16", "bfloat16"):
            rtol = 1e-2
    if atol is None:
        atol = 1e-8 if str(a.dtype) not in ("float16", "bfloat16") else 1e-3
    mask = np.zeros(a.shape, dtype=bool)
    if allow_remove_inf:
        mask |= np.isinf(af)
    if allow_remove_nan:
        mask |= np.isnan(af)
    both_nan = np.isnan(af) & np.isnan(bf)
    both_inf = np.isinf(af) & np.isinf(bf) & (np.sign(af) == np.sign(bf))
    close = np.isclose(af, bf, rtol=rtol, atol=atol)
    return bool(np.all(close | both_nan | both_inf | mask))


# ---------------------------------------------------------------------------
# constructors (reference tensor/type.py:782-1101)
# ---------------------------------------------------------------------------

def tensor(name=None, *, dtype=None, shape=None, broadcastable=None, sharding=None):
    if dtype is None:
        dtype = config.floatX
    t = TensorType(dtype, shape=shape, broadcastable=broadcastable, sharding=sharding)
    return t(name)


def _ctor(ndim: int):
    def make(name=None, *, dtype=None, shape=None):
        if dtype is None:
            dtype = config.floatX
        if shape is None:
            shape = (None,) * ndim
        if len(shape) != ndim:
            raise ValueError(f"shape must have {ndim} entries")
        return TensorType(dtype, shape)(name)

    return make


scalar = _ctor(0)
vector = _ctor(1)
matrix = _ctor(2)
tensor3 = _ctor(3)
tensor4 = _ctor(4)
tensor5 = _ctor(5)
tensor6 = _ctor(6)
tensor7 = _ctor(7)


def row(name=None, *, dtype=None):
    return TensorType(dtype or config.floatX, (1, None))(name)


def col(name=None, *, dtype=None):
    return TensorType(dtype or config.floatX, (None, 1))(name)


def _multi(ctor):
    def make(*names, **kwargs):
        return [ctor(n, **kwargs) for n in names]

    return make


scalars = _multi(scalar)
vectors = _multi(vector)
matrices = _multi(matrix)

_prefix_dtypes = {
    "b": "int8", "w": "int16", "i": "int32", "l": "int64",
    "f": "float32", "d": "float64", "c": "complex64", "z": "complex128",
}

# generate the classic prefixed constructors (iscalar, fmatrix, ...)
def _make_prefixed():
    g = globals()
    base = {"scalar": 0, "vector": 1, "matrix": 2, "tensor3": 3,
            "tensor4": 4, "tensor5": 5, "tensor6": 6, "tensor7": 7,
            "row": None, "col": None}
    for prefix, dt in _prefix_dtypes.items():
        for bname, nd in base.items():
            # reference parity: the prefixed constructors (dvector,
            # fmatrix, iscalar, ...) are TensorType INSTANCES — calling
            # one makes a variable (Type.__call__), and they double as
            # type objects for as_op(itypes=[at.dvector]) etc.
            if bname == "row":
                inst = TensorType(dt, (1, None))
            elif bname == "col":
                inst = TensorType(dt, (None, 1))
            else:
                inst = TensorType(dt, (None,) * nd)

            plural = f"{bname[:-1]}ces" if bname == "matrix" else f"{bname}s"
            g[f"{prefix}{bname}"] = inst
            g[f"{prefix}{plural}"] = _multi(inst)
            __all__.extend([f"{prefix}{bname}", f"{prefix}{plural}"])
    # plural forms of the plain constructors
    for bname in ("tensor3", "tensor4", "tensor5"):
        g[f"{bname}s"] = _multi(g[bname])
        __all__.append(f"{bname}s")


_make_prefixed()
