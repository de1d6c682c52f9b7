"""Scalar types and the scalar op algebra.

TPU-native re-design of the reference's ``aesara/scalar/basic.py`` (~120
ScalarOp classes) and the special-function set of ``aesara/scalar/math.py``.
Each op declares:

- ``impl``: NumPy/SciPy reference semantics (the py-mode oracle; replaces
  the reference's ``impl``+``c_code`` pair — there is no C snippet layer;
  the device path is the XLA lowering registered per-op in
  ``aesara_tpu.link.jax.dispatch.scalar``),
- a dtype rule (``upcast_out``, ``upgrade_to_float``, ``bool_out``, ...),
- autodiff (``grad``) in terms of other scalar ops.

``Elemwise`` (``aesara_tpu.tensor.elemwise``) lifts these to tensors;
``Composite`` (``aesara_tpu.scalar.composite``) fuses scalar sub-graphs —
the unit of elemwise fusion that Pallas kernels consume.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.graph.ir import Apply, Constant, Type, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.utils import MethodNotDefined


# ---------------------------------------------------------------------------
# dtype lattice helpers
# ---------------------------------------------------------------------------

int_dtypes = ("int8", "int16", "int32", "int64")
uint_dtypes = ("uint8", "uint16", "uint32", "uint64")
float_dtypes = ("float16", "bfloat16", "float32", "float64")
complex_dtypes = ("complex64", "complex128")
discrete_dtypes = ("bool",) + int_dtypes + uint_dtypes
continuous_dtypes = float_dtypes + complex_dtypes
all_dtypes = discrete_dtypes + continuous_dtypes


def upcast(dtype, *dtypes) -> str:
    """NumPy-style type promotion over dtype names.

    bfloat16 is handled with jax's accelerator rules (numpy's
    promote_types refuses bf16∘int entirely): bf16 with any
    integer/bool stays bf16, bf16 with float16 widens to float32, and
    bf16 with float32/float64/complex takes the wider float.
    """
    all_ds = [
        "bfloat16" if str(d) == "bfloat16" else np.dtype(d).name
        for d in (dtype, *dtypes)
    ]
    if "bfloat16" in all_ds:
        # jax accelerator rules: with bf16 present, integer/bool
        # operands never widen the result (promoting them with numpy
        # first would leak f16∘int64 → f64 — review finding), so only
        # the other CONTINUOUS operands matter
        rest = [d for d in all_ds
                if d != "bfloat16" and d in continuous_dtypes]
        if not rest:
            return "bfloat16"
        promoted = upcast(*rest)
        if promoted == "float16":
            return "float32"
        return promoted
    rval = np.dtype(all_ds[0])
    for d in all_ds[1:]:
        rval = np.promote_types(rval, np.dtype(d))
    return rval.name


# --- output-dtype rules ------------------------------------------------------

def upcast_out(*types):
    return (ScalarType(upcast(*[t.dtype for t in types])),)


def same_out(*types):
    for t in types[1:]:
        if t.dtype != types[0].dtype:
            raise TypeError(f"mismatched dtypes: {[t.dtype for t in types]}")
    return (types[0],)


def bool_out(*types):
    return (ScalarType("bool"),)


def upgrade_to_float(*types):
    """Discrete inputs upgrade to floatX (TPU-native policy: all integer
    widths go to ``config.floatX`` — float64 is emulated on TPU, so we
    never silently promote to it; reference maps int64→float64 instead)."""
    dtypes = [t.dtype for t in types]
    conv = [config.floatX if d in discrete_dtypes else d for d in dtypes]
    return (ScalarType(upcast(*conv)),)


def upgrade_to_float64(*types):
    dtypes = [t.dtype for t in types]
    conv = ["float64" if d in discrete_dtypes else d for d in dtypes]
    return (ScalarType(upcast(*conv)),)


def upgrade_to_float_no_complex(*types):
    for t in types:
        if t.dtype in complex_dtypes:
            raise TypeError(f"complex input not supported: {t}")
    return upgrade_to_float(*types)


def complex_to_real_out(*types):
    """Same dtype, except complex inputs map to their real component type
    (reference ``scalar/basic.py`` Abs.make_node: complex64→float32)."""
    out = []
    for t in types:
        if t.dtype == "complex64":
            out.append(ScalarType("float32"))
        elif t.dtype == "complex128":
            out.append(ScalarType("float64"))
        else:
            out.append(t)
    return out[:1]


def same_out_nocomplex(*types):
    for t in types:
        if t.dtype in complex_dtypes:
            raise TypeError(f"complex input not supported: {t}")
    return same_out(*types)


def same_out_float_only(*types):
    for t in types:
        if t.dtype not in float_dtypes:
            raise TypeError(f"float input required: {t}")
    return same_out(*types)


def discrete_out(*types):
    for t in types:
        if t.dtype not in discrete_dtypes:
            raise TypeError(f"integer/bool input required: {t}")
    return upcast_out(*types)


# ---------------------------------------------------------------------------
# ScalarType / ScalarVariable
# ---------------------------------------------------------------------------

class ScalarType(Type):
    """A 0-d value of a given numpy dtype (reference ``scalar/basic.py``
    ScalarType).  Carries no shape; Elemwise lifts scalar ops to tensors."""

    __slots__ = ("dtype",)
    ndim = 0
    shape: tuple = ()

    def __init__(self, dtype: str):
        if dtype == "floatX":
            dtype = config.floatX
        self.dtype = np.dtype(dtype).name if dtype != "bfloat16" else "bfloat16"

    @property
    def dtype_specs(self):
        return (self.dtype,)

    def filter(self, data, strict=False, allow_downcast=None):
        np_dtype = _np_dtype(self.dtype)
        if strict:
            arr = np.asarray(data)
            if arr.dtype != np_dtype or arr.ndim != 0:
                raise TypeError(f"{data!r} is not a {self.dtype} scalar")
            return arr[()]
        arr = np.asarray(data, dtype=np_dtype)
        if arr.ndim != 0:
            raise TypeError(f"scalar expected, got array of ndim {arr.ndim}")
        if allow_downcast is False:
            orig = np.asarray(data)
            if not np.can_cast(orig.dtype, np_dtype, casting="same_kind") and orig.dtype != np_dtype:
                raise TypeError(f"cannot downcast {orig.dtype} to {self.dtype}")
        return arr[()]

    def values_eq(self, a, b):
        return a == b or (np.isnan(a) and np.isnan(b))

    def values_eq_approx(self, a, b, tolerance=1e-4):
        if self.dtype in discrete_dtypes:
            return a == b
        if np.isnan(a) and np.isnan(b):
            return True
        diff = abs(np.float64(a) - np.float64(b))
        return diff <= tolerance * (abs(np.float64(a)) + abs(np.float64(b))) + 1e-8

    def is_super(self, otype):
        return isinstance(otype, ScalarType) and otype.dtype == self.dtype

    def upcast(self, *others):
        return upcast(self.dtype, *[o.dtype for o in others])

    def __eq__(self, other):
        return type(other) is ScalarType and other.dtype == self.dtype

    def __hash__(self):
        return hash((ScalarType, self.dtype))

    def __str__(self):
        return self.dtype

    def __repr__(self):
        return f"ScalarType({self.dtype})"

    def clone(self, dtype=None, **kwargs):
        return ScalarType(dtype or self.dtype)


def _np_dtype(name: str):
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


class ScalarVariable(Variable):
    """Scalar symbolic variable with arithmetic operator sugar."""

    def __add__(self, other):
        return add(self, other)

    def __radd__(self, other):
        return add(other, self)

    def __sub__(self, other):
        return sub(self, other)

    def __rsub__(self, other):
        return sub(other, self)

    def __mul__(self, other):
        return mul(self, other)

    def __rmul__(self, other):
        return mul(other, self)

    def __truediv__(self, other):
        return true_div(self, other)

    def __rtruediv__(self, other):
        return true_div(other, self)

    def __floordiv__(self, other):
        return int_div(self, other)

    def __mod__(self, other):
        return mod(self, other)

    def __pow__(self, other):
        return pow(self, other)

    def __rpow__(self, other):
        return pow(other, self)

    def __neg__(self):
        return neg(self)

    def __abs__(self):
        return abs_(self)

    def __lt__(self, other):
        return lt(self, other)

    def __le__(self, other):
        return le(self, other)

    def __gt__(self, other):
        return gt(self, other)

    def __ge__(self, other):
        return ge(self, other)

    @property
    def dtype(self):
        return self.type.dtype


class ScalarConstant(ScalarVariable, Constant):
    pass


ScalarType.variable_type = ScalarVariable
ScalarType.constant_type = ScalarConstant

# common type singletons
bool_t = ScalarType("bool")
int8 = ScalarType("int8")
int16 = ScalarType("int16")
int32 = ScalarType("int32")
int64 = ScalarType("int64")
uint8 = ScalarType("uint8")
uint16 = ScalarType("uint16")
uint32 = ScalarType("uint32")
uint64 = ScalarType("uint64")
float16 = ScalarType("float16")
bfloat16 = ScalarType("bfloat16")
float32 = ScalarType("float32")
float64 = ScalarType("float64")
complex64 = ScalarType("complex64")
complex128 = ScalarType("complex128")


def get_scalar_type(dtype: str) -> ScalarType:
    return ScalarType(dtype)


def as_scalar(x, name=None) -> ScalarVariable:
    if isinstance(x, Variable):
        if isinstance(x.type, ScalarType):
            return x
        from aesara_tpu.tensor.basic import scalar_from_tensor

        t = getattr(x.type, "ndim", None)
        if t == 0:
            return scalar_from_tensor(x)
        raise TypeError(f"cannot convert {x} to a scalar")
    arr = np.asarray(x)
    if arr.ndim != 0:
        raise TypeError(f"scalar expected, got shape {arr.shape}")
    return ScalarConstant(ScalarType(arr.dtype.name), arr[()], name=name)


def constant(x, dtype=None) -> ScalarConstant:
    """Literal scalar constant.

    Bare Python literals pick minimal dtypes (ints → int8, floats →
    ``config.floatX``) so that literals appearing in gradient formulas do
    not upcast the surrounding expression (the reference canonicalizes
    literals the same way).
    """
    if dtype is None:
        if isinstance(x, bool):
            dtype = "bool"
        elif isinstance(x, int):
            dtype = "int8" if -128 <= x < 128 else "int64"
        elif isinstance(x, float):
            dtype = config.floatX
    arr = np.asarray(x, dtype=dtype)
    return ScalarConstant(ScalarType(arr.dtype.name), arr[()])


# ---------------------------------------------------------------------------
# ScalarOp base classes
# ---------------------------------------------------------------------------

class ScalarOp(Op):
    """Base of the scalar algebra (reference ``scalar/basic.py`` ScalarOp).

    Class attributes:
      nin/nout        — arity (nin=-1 means variadic)
      identity        — neutral element, used by CAReduce
      commutative / associative — algebraic flags used by canonicalization
      nfunc           — numpy/scipy callable implementing the op
      output_types_preference — dtype rule (module-level functions above)
    """

    nin = -1
    nout = 1
    identity: Any = None
    commutative: bool = False
    associative: bool = False
    nfunc: Any = None
    output_types_preference = staticmethod(upcast_out)

    def __init__(self, output_types_preference=None, name=None):
        if output_types_preference is not None:
            self.output_types_preference = output_types_preference
        if name is not None:
            self.name = name

    def output_types(self, types) -> Tuple[ScalarType, ...]:
        # ops flagged complex_error reject complex operands at BUILD time
        # (reference scalar/basic.py: IntDiv/Mod raise "complex not
        # supported" in output_types rather than failing in C code)
        if getattr(self, "complex_error", False) and any(
            t.dtype in complex_dtypes for t in types
        ):
            raise TypeError(f"{self} does not support complex inputs")
        return tuple(self.output_types_preference(*types))

    def make_node(self, *inputs) -> Apply:
        if self.nin >= 0 and len(inputs) != self.nin:
            raise TypeError(f"{self} expected {self.nin} inputs, got {len(inputs)}")
        inputs = [as_scalar(i) for i in inputs]
        outputs = [t() for t in self.output_types([i.type for i in inputs])]
        if len(outputs) != self.nout:
            raise TypeError(f"{self} dtype rule produced {len(outputs)} outputs")
        return Apply(self, inputs, outputs)

    def impl(self, *inputs):
        if self.nfunc is not None:
            return self.nfunc(*inputs)
        raise MethodNotDefined(f"{type(self).__name__}.impl")

    def perform(self, node, inputs, output_storage):
        out = self.impl(*inputs)
        if self.nout == 1:
            out = (out,)
        for storage, o, var in zip(output_storage, out, node.outputs):
            storage[0] = np.asarray(o).astype(_np_dtype(var.type.dtype))[()]

    def grad(self, inputs, output_grads):
        raise NotImplementedError(f"{type(self).__name__}.grad")

    def L_op(self, inputs, outputs, output_grads):
        return self.grad(inputs, output_grads)

    def __eq__(self, other):
        if self is other:
            return True
        if type(self) is not type(other):
            return False
        props = getattr(self, "__props__", None)
        if props:
            return all(getattr(self, p) == getattr(other, p) for p in props)
        return self.output_types_preference == other.output_types_preference

    def __hash__(self):
        props = getattr(self, "__props__", None)
        if props:
            return hash((type(self),) + tuple(getattr(self, p) for p in props))
        return hash((type(self), self.output_types_preference))

    def __str__(self):
        name = getattr(self, "name", None)
        return name or type(self).__name__.lower()


class UnaryScalarOp(ScalarOp):
    nin = 1


class BinaryScalarOp(ScalarOp):
    nin = 2


class LogicalComparison(BinaryScalarOp):
    output_types_preference = staticmethod(bool_out)

    def grad(self, inputs, output_grads):
        # a comparison's gradient is DEFINED and zero (floatX for
        # discrete inputs) — grad(x > y, y) == 0.0, not an
        # undefined-grad error (reference LogicalComparison.L_op,
        # scalar/basic.py:1304)
        return [_zeros_like(inp) for inp in inputs]


class FixedLogicalComparison(UnaryScalarOp):
    output_types_preference = staticmethod(bool_out)

    def grad(self, inputs, output_grads):
        # same zero-grad contract as LogicalComparison (isnan/isinf)
        return [_zeros_like(inputs[0])]


# ---------------------------------------------------------------------------
# helper for zero/disconnected grads
# ---------------------------------------------------------------------------

def _zeros_like(x):
    return second(x, constant(0, dtype=x.dtype if x.dtype not in discrete_dtypes else config.floatX))


def _discrete_grads(op, inputs):
    """Integer-valued op: gradient is zero everywhere it exists."""
    from aesara_tpu.gradient import grad_undefined

    return [grad_undefined(op, i, inp, "output is discrete") for i, inp in enumerate(inputs)]


# ---------------------------------------------------------------------------
# arithmetic
# ---------------------------------------------------------------------------

class Add(ScalarOp):
    identity = 0
    commutative = True
    associative = True
    nfunc = staticmethod(lambda *xs: np.sum(xs, axis=0) if len(xs) > 1 else xs[0])

    def impl(self, *inputs):
        s = inputs[0]
        for x in inputs[1:]:
            s = s + x
        return s

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        rval = []
        for inp in inputs:
            if inp.type.dtype in discrete_dtypes:
                rval.append(inp.zeros_like() if hasattr(inp, "zeros_like") else _zeros_like(inp))
            else:
                rval.append(gz)
        return rval


class Mul(ScalarOp):
    identity = 1
    commutative = True
    associative = True

    def impl(self, *inputs):
        p = inputs[0]
        for x in inputs[1:]:
            p = p * x
        return p

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        rval = []
        for i, inp in enumerate(inputs):
            others = [x for j, x in enumerate(inputs) if j != i]
            g = gz
            for o in others:
                g = mul(g, o)
            rval.append(g)
        return rval


class Sub(BinaryScalarOp):
    nfunc = staticmethod(np.subtract)

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [gz, neg(gz)]


class TrueDiv(BinaryScalarOp):
    nfunc = staticmethod(np.true_divide)

    @staticmethod
    def output_types_preference(*types):
        t = upcast_out(*types)[0]
        if t.dtype in discrete_dtypes:
            return (ScalarType(config.floatX),)
        return (t,)

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        return [true_div(gz, y), neg(true_div(mul(gz, x), mul(y, y)))]


class IntDiv(BinaryScalarOp):
    nfunc = staticmethod(np.floor_divide)
    complex_error = True

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class Mod(BinaryScalarOp):
    nfunc = staticmethod(np.mod)
    complex_error = True  # reference: "% is not defined for complex"

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        if x.type.dtype in discrete_dtypes:
            return _discrete_grads(self, inputs)
        from aesara_tpu.gradient import grad_undefined

        return [gz, grad_undefined(self, 1, y, "mod grad wrt divisor undefined")]


class Pow(BinaryScalarOp):
    nfunc = staticmethod(np.power)

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        gx = mul(gz, mul(y, pow(x, sub(y, constant(1, dtype="int8")))))
        gy = mul(gz, mul(log(x), pow(x, y)))
        return [gx, gy]


class Neg(UnaryScalarOp):
    nfunc = staticmethod(np.negative)
    output_types_preference = staticmethod(same_out)

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [neg(gz)]


class Abs(UnaryScalarOp):
    nfunc = staticmethod(np.abs)
    # complex modulus is REAL: complex64→float32, complex128→float64
    # (reference scalar/basic.py:2544-2552)
    output_types_preference = staticmethod(complex_to_real_out)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        if x.type.dtype in discrete_dtypes:
            return _discrete_grads(self, inputs)
        if x.type.dtype in complex_dtypes:
            # d|z| in the CR sense: gz * z / |z| (reference :2568)
            return [mul(gz, true_div(x, abs_(x)))]
        return [mul(gz, sgn(x))]


class Sgn(UnaryScalarOp):
    nfunc = staticmethod(np.sign)
    output_types_preference = staticmethod(same_out_nocomplex)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class Ceil(UnaryScalarOp):
    nfunc = staticmethod(np.ceil)
    output_types_preference = staticmethod(same_out_nocomplex)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class Floor(UnaryScalarOp):
    nfunc = staticmethod(np.floor)
    output_types_preference = staticmethod(same_out_nocomplex)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class Trunc(UnaryScalarOp):
    nfunc = staticmethod(np.trunc)
    output_types_preference = staticmethod(same_out_nocomplex)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class RoundHalfToEven(UnaryScalarOp):
    nfunc = staticmethod(np.round)
    output_types_preference = staticmethod(same_out_nocomplex)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class RoundHalfAwayFromZero(UnaryScalarOp):
    output_types_preference = staticmethod(same_out_nocomplex)

    def impl(self, x):
        return np.trunc(x + np.copysign(np.asarray(0.5, dtype=np.asarray(x).dtype), x))

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class Maximum(BinaryScalarOp):
    commutative = True
    associative = True
    nfunc = staticmethod(np.maximum)

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        if x.type.dtype in discrete_dtypes and y.type.dtype in discrete_dtypes:
            return _discrete_grads(self, inputs)
        gx = mul(gz, cast_to(ge(x, y), gz.type.dtype))
        gy = mul(gz, cast_to(lt(x, y), gz.type.dtype))
        return [gx, gy]


class Minimum(BinaryScalarOp):
    commutative = True
    associative = True
    nfunc = staticmethod(np.minimum)

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        if x.type.dtype in discrete_dtypes and y.type.dtype in discrete_dtypes:
            return _discrete_grads(self, inputs)
        gx = mul(gz, cast_to(le(x, y), gz.type.dtype))
        gy = mul(gz, cast_to(gt(x, y), gz.type.dtype))
        return [gx, gy]


# ---------------------------------------------------------------------------
# comparison / logical
# ---------------------------------------------------------------------------

class LT(LogicalComparison):
    nfunc = staticmethod(np.less)


class GT(LogicalComparison):
    nfunc = staticmethod(np.greater)


class LE(LogicalComparison):
    nfunc = staticmethod(np.less_equal)


class GE(LogicalComparison):
    nfunc = staticmethod(np.greater_equal)


class EQ(LogicalComparison):
    commutative = True
    nfunc = staticmethod(np.equal)


class NEQ(LogicalComparison):
    commutative = True
    nfunc = staticmethod(np.not_equal)


class IsNan(FixedLogicalComparison):
    nfunc = staticmethod(np.isnan)


class IsInf(FixedLogicalComparison):
    nfunc = staticmethod(np.isinf)


class And(BinaryScalarOp):
    commutative = True
    associative = True
    identity = -1  # all bits set (bitwise and identity)
    nfunc = staticmethod(np.bitwise_and)
    output_types_preference = staticmethod(discrete_out)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class Or(BinaryScalarOp):
    commutative = True
    associative = True
    identity = 0
    nfunc = staticmethod(np.bitwise_or)
    output_types_preference = staticmethod(discrete_out)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class Xor(BinaryScalarOp):
    commutative = True
    associative = True
    identity = 0
    nfunc = staticmethod(np.bitwise_xor)
    output_types_preference = staticmethod(discrete_out)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class Invert(UnaryScalarOp):
    nfunc = staticmethod(np.invert)
    output_types_preference = staticmethod(discrete_out)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class ShiftLeft(BinaryScalarOp):
    nfunc = staticmethod(np.left_shift)
    output_types_preference = staticmethod(discrete_out)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


class ShiftRight(BinaryScalarOp):
    nfunc = staticmethod(np.right_shift)
    output_types_preference = staticmethod(discrete_out)

    def grad(self, inputs, output_grads):
        return _discrete_grads(self, inputs)


# ---------------------------------------------------------------------------
# control / structural
# ---------------------------------------------------------------------------

class Switch(ScalarOp):
    """switch(cond, ift, iff) — the eager elemwise conditional."""

    nin = 3

    @staticmethod
    def output_types_preference(cond_t, ift_t, iff_t):
        return upcast_out(ift_t, iff_t)

    def impl(self, cond, ift, iff):
        return np.where(cond, ift, iff)[()] if np.ndim(cond) == 0 else np.where(cond, ift, iff)

    def grad(self, inputs, output_grads):
        cond, ift, iff = inputs
        (gz,) = output_grads
        from aesara_tpu.gradient import grad_undefined

        first = grad_undefined(self, 0, cond, "condition has no gradient")
        zero = constant(0, dtype=gz.type.dtype)
        return [
            first,
            switch(cond, gz, zero),
            switch(cond, zero, gz),
        ]


class Identity(UnaryScalarOp):
    nfunc = staticmethod(lambda x: x)
    output_types_preference = staticmethod(same_out)

    def grad(self, inputs, output_grads):
        return [output_grads[0]]


class Second(BinaryScalarOp):
    """second(x, y) = y broadcast against x — symbolic 'fill'."""

    def impl(self, x, y):
        return np.broadcast_arrays(x, y)[1] if np.ndim(x) or np.ndim(y) else y

    @staticmethod
    def output_types_preference(xt, yt):
        return (yt,)

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        from aesara_tpu.gradient import DisconnectedType

        return [DisconnectedType()(), gz]

    def connection_pattern(self, node):
        return [[False], [True]]


class Cast(UnaryScalarOp):
    """dtype conversion (reference ``scalar/basic.py`` Cast)."""

    __props__ = ("o_type",)

    def __init__(self, o_type: ScalarType, name=None):
        if not isinstance(o_type, ScalarType):
            raise TypeError("o_type must be a ScalarType")
        super().__init__(None, name)
        self.o_type = o_type
        self.ctor = o_type

    @property
    def output_types_preference(self):
        return lambda *types: (self.o_type,)

    def impl(self, x):
        return np.asarray(x).astype(_np_dtype(self.o_type.dtype))[()]

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        if self.o_type.dtype in discrete_dtypes or x.type.dtype in discrete_dtypes:
            return _discrete_grads(self, inputs)
        return [cast_to(gz, x.type.dtype)]

    def __str__(self):
        return f"cast{{{self.o_type.dtype}}}"


_cast_cache: dict = {}


def cast_to(x, dtype: str):
    """Insert a Cast (no-op if already that dtype)."""
    if dtype == "floatX":
        dtype = config.floatX
    x = as_scalar(x)
    if x.type.dtype == dtype:
        return x
    op = _cast_cache.get(dtype)
    if op is None:
        op = _cast_cache[dtype] = Cast(ScalarType(dtype))
    return op(x)


# ---------------------------------------------------------------------------
# transcendental
# ---------------------------------------------------------------------------

class Exp(UnaryScalarOp):
    nfunc = staticmethod(np.exp)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, exp(x))]


class Exp2(UnaryScalarOp):
    nfunc = staticmethod(np.exp2)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, mul(exp2(x), constant(math.log(2.0))))]


class Expm1(UnaryScalarOp):
    nfunc = staticmethod(np.expm1)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, exp(x))]


class Log(UnaryScalarOp):
    nfunc = staticmethod(np.log)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, x)]


class Log2(UnaryScalarOp):
    nfunc = staticmethod(np.log2)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, mul(x, constant(math.log(2.0))))]


class Log10(UnaryScalarOp):
    nfunc = staticmethod(np.log10)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, mul(x, constant(math.log(10.0))))]


class Log1p(UnaryScalarOp):
    nfunc = staticmethod(np.log1p)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, add(constant(1.0), x))]


class Sqrt(UnaryScalarOp):
    nfunc = staticmethod(np.sqrt)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, mul(constant(2.0), sqrt(x)))]


class Sqr(UnaryScalarOp):
    nfunc = staticmethod(np.square)
    output_types_preference = staticmethod(same_out)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, mul(constant(2.0), x))]


class Deg2Rad(UnaryScalarOp):
    nfunc = staticmethod(np.deg2rad)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [mul(gz, constant(math.pi / 180.0))]


class Rad2Deg(UnaryScalarOp):
    nfunc = staticmethod(np.rad2deg)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [mul(gz, constant(180.0 / math.pi))]


class Cos(UnaryScalarOp):
    nfunc = staticmethod(np.cos)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [neg(mul(gz, sin(x)))]


class Sin(UnaryScalarOp):
    nfunc = staticmethod(np.sin)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, cos(x))]


class Tan(UnaryScalarOp):
    nfunc = staticmethod(np.tan)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, sqr(cos(x)))]


class ArcCos(UnaryScalarOp):
    nfunc = staticmethod(np.arccos)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [neg(true_div(gz, sqrt(sub(constant(1.0), sqr(x)))))]


class ArcSin(UnaryScalarOp):
    nfunc = staticmethod(np.arcsin)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, sqrt(sub(constant(1.0), sqr(x))))]


class ArcTan(UnaryScalarOp):
    nfunc = staticmethod(np.arctan)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, add(constant(1.0), sqr(x)))]


class ArcTan2(BinaryScalarOp):
    nfunc = staticmethod(np.arctan2)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        y, x = inputs
        (gz,) = output_grads
        den = add(sqr(x), sqr(y))
        return [mul(gz, true_div(x, den)), neg(mul(gz, true_div(y, den)))]


class Cosh(UnaryScalarOp):
    nfunc = staticmethod(np.cosh)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, sinh(x))]


class Sinh(UnaryScalarOp):
    nfunc = staticmethod(np.sinh)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, cosh(x))]


class Tanh(UnaryScalarOp):
    nfunc = staticmethod(np.tanh)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, sub(constant(1.0), sqr(tanh(x))))]


class ArcCosh(UnaryScalarOp):
    nfunc = staticmethod(np.arccosh)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, mul(sqrt(sub(x, constant(1.0))), sqrt(add(x, constant(1.0)))))]


class ArcSinh(UnaryScalarOp):
    nfunc = staticmethod(np.arcsinh)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, sqrt(add(constant(1.0), sqr(x))))]


class ArcTanh(UnaryScalarOp):
    nfunc = staticmethod(np.arctanh)
    output_types_preference = staticmethod(upgrade_to_float)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [true_div(gz, sub(constant(1.0), sqr(x)))]


class Conj(UnaryScalarOp):
    nfunc = staticmethod(np.conj)
    output_types_preference = staticmethod(same_out)

    def grad(self, inputs, output_grads):
        return [conj(output_grads[0])]


# op instances (the canonical singletons rewrites compare against)
add = Add(name="add")
mul = Mul(name="mul")
sub = Sub(name="sub")
true_div = TrueDiv(name="true_div")
int_div = IntDiv(name="int_div")
mod = Mod(name="mod")
pow = Pow(name="pow")
neg = Neg(name="neg")
abs_ = Abs(name="abs")
sgn = Sgn(name="sgn")
ceil = Ceil(name="ceil")
floor = Floor(name="floor")
trunc = Trunc(name="trunc")
round_half_to_even = RoundHalfToEven(name="round_half_to_even")
round_half_away_from_zero = RoundHalfAwayFromZero(name="round_half_away_from_zero")
maximum = Maximum(name="maximum")
minimum = Minimum(name="minimum")
lt = LT(name="lt")
gt = GT(name="gt")
le = LE(name="le")
ge = GE(name="ge")
eq = EQ(name="eq")
neq = NEQ(name="neq")
isnan = IsNan(name="isnan")
isinf = IsInf(name="isinf")
and_ = And(name="and_")
or_ = Or(name="or_")
xor = Xor(name="xor")
invert = Invert(name="invert")
shift_left = ShiftLeft(name="shift_left")
shift_right = ShiftRight(name="shift_right")
switch = Switch(name="switch")
identity = Identity(name="identity")
second = Second(name="second")
exp = Exp(name="exp")
exp2 = Exp2(name="exp2")
expm1 = Expm1(name="expm1")
log = Log(name="log")
log2 = Log2(name="log2")
log10 = Log10(name="log10")
log1p = Log1p(name="log1p")
sqrt = Sqrt(name="sqrt")
sqr = Sqr(name="sqr")
deg2rad = Deg2Rad(name="deg2rad")
rad2deg = Rad2Deg(name="rad2deg")
cos = Cos(name="cos")
sin = Sin(name="sin")
tan = Tan(name="tan")
arccos = ArcCos(name="arccos")
arcsin = ArcSin(name="arcsin")
arctan = ArcTan(name="arctan")
arctan2 = ArcTan2(name="arctan2")
cosh = Cosh(name="cosh")
sinh = Sinh(name="sinh")
tanh = Tanh(name="tanh")
arccosh = ArcCosh(name="arccosh")
arcsinh = ArcSinh(name="arcsinh")
arctanh = ArcTanh(name="arctanh")
conj = Conj(name="conj")


def clip(x, min_, max_):
    """clip as composition (reference defines a Clip op; min(max(x,lo),hi))."""
    return minimum(maximum(x, min_), max_)


# --- complex component ops (reference scalar/basic.py Real:2876, Imag:2895,
# Angle:2914, Complex:2952, ComplexFromPolar:2990) ---------------------------

_real_out = complex_to_real_out


class Real(UnaryScalarOp):
    nfunc = staticmethod(np.real)
    output_types_preference = staticmethod(_real_out)

    def grad(self, inputs, output_grads):
        from aesara_tpu.graph.null_type import NullType

        return [NullType("grad of real is not holomorphic")()]


class Imag(UnaryScalarOp):
    nfunc = staticmethod(np.imag)
    output_types_preference = staticmethod(_real_out)

    def grad(self, inputs, output_grads):
        from aesara_tpu.graph.null_type import NullType

        return [NullType("grad of imag is not holomorphic")()]


class Angle(UnaryScalarOp):
    nfunc = staticmethod(np.angle)
    output_types_preference = staticmethod(_real_out)


def _complex_out(*types):
    if any(t.dtype == "float64" for t in types):
        return [ScalarType("complex128")]
    return [ScalarType("complex64")]


class ComplexOp(BinaryScalarOp):
    """real, imag → complex"""

    output_types_preference = staticmethod(_complex_out)

    def impl(self, re_, im_):
        return np.complex64(re_ + 1j * im_) if np.asarray(re_).dtype != np.float64 else np.complex128(re_ + 1j * im_)


class ComplexFromPolar(BinaryScalarOp):
    """abs, angle → complex"""

    output_types_preference = staticmethod(_complex_out)

    def impl(self, r, theta):
        res = r * np.cos(theta) + 1j * (r * np.sin(theta))
        return np.complex128(res) if np.asarray(r).dtype == np.float64 else np.complex64(res)


real_part = Real(name="real")
imag_part = Imag(name="imag")
angle = Angle(name="angle")
complex_op = ComplexOp(name="complex")
complex_from_polar = ComplexFromPolar(name="complex_from_polar")


# --- reference class-name aliases + small completions (scalar/basic.py) ------

AND = And
OR = Or
XOR = Xor
TrueDivide = TrueDiv
FloorDivide = IntDiv
ScalarMaximum = Maximum
ScalarMinimum = Minimum
BinaryBitOp = BinaryScalarOp  # the reference's bit-op base
UnaryBitOp = UnaryScalarOp


class ComplexError(Exception):
    """Complex numbers not supported by an op (reference name)."""


class IntegerDivisionError(Exception):
    """Integer division edge error (reference name)."""


class Clip(ScalarOp):
    """clip(x, min, max) as one scalar op (reference ``Clip``)."""

    nin = 3
    nout = 1
    nfunc = staticmethod(np.clip)
    output_types_preference = staticmethod(upcast_out)

    def impl(self, x, mn, mx):
        return np.clip(x, mn, mx)

    def grad(self, inputs, output_grads):
        x, mn, mx = inputs
        (gz,) = output_grads
        inside = and_(ge(x, mn), le(x, mx))
        gx = mul(gz, cast_to(inside, gz.type.dtype))
        below = lt(x, mn)
        above = gt(x, mx)
        gmn = mul(gz, cast_to(below, gz.type.dtype))
        gmx = mul(gz, cast_to(above, gz.type.dtype))
        return [gx, gmn, gmx]


clip_scalar = Clip(name="clip")


class InRange(ScalarOp):
    """low <= x <= high with configurable openness (reference ``InRange``)."""

    nin = 3
    nout = 1
    __props__ = ("openlow", "openhigh")

    def __init__(self, openlow=False, openhigh=False):
        self.openlow = bool(openlow)
        self.openhigh = bool(openhigh)

    def output_types_preference(self, *types):
        return [ScalarType("bool")]

    def impl(self, x, low, high):
        lo_ok = x > low if self.openlow else x >= low
        hi_ok = x < high if self.openhigh else x <= high
        return np.bool_(lo_ok and hi_ok)

    def grad(self, inputs, output_grads):
        # zero everywhere, including AT the bounds (mathematically the
        # boundary gradient is infinite; the reference defines it zero
        # for stability — scalar/basic.py:1554 InRange.get_grad)
        return [_zeros_like(inp) for inp in inputs]


class Mean(ScalarOp):
    """Variadic scalar mean (reference ``Mean``)."""

    nout = 1
    nfunc = None
    output_types_preference = staticmethod(upgrade_to_float)

    def impl(self, *vals):
        return sum(vals) / len(vals)


mean_scalar = Mean(name="mean")


class Reciprocal(UnaryScalarOp):
    nfunc = staticmethod(np.reciprocal)
    output_types_preference = staticmethod(upgrade_to_float)

    def impl(self, x):
        return 1.0 / x

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [neg(true_div(gz, sqr(x)))]


reciprocal = Reciprocal(name="reciprocal")


class Complex(BinaryScalarOp):
    """reference alias of ComplexOp"""


Complex = ComplexOp  # noqa: F811


class NumpyAutocaster:
    """Value→dtype policy object (reference ``NumpyAutocaster``)."""

    def __init__(self, dtypes):
        self.dtypes = tuple(dtypes)

    def __call__(self, x):
        for dt in self.dtypes:
            try:
                np_dt = np.dtype(dt)
                if np.asarray(x).astype(np_dt) == x:
                    return np_dt
            except (OverflowError, ValueError):
                continue
        return np.asarray(x).dtype


autocast_int = NumpyAutocaster(("int8", "int16", "int32", "int64"))
autocast_float = NumpyAutocaster(("float32", "float64"))


class autocast_float_as:
    """Context manager temporarily changing float autocasting
    (reference ``autocast_float_as``)."""

    def __init__(self, *dtypes):
        self.dtypes = dtypes

    def __enter__(self):
        global autocast_float
        self._old = autocast_float
        autocast_float = NumpyAutocaster(self.dtypes)
        return self

    def __exit__(self, *exc):
        global autocast_float
        autocast_float = self._old
        return False


def transfer_type(*indices):
    """output_types_preference: output i takes input indices[i]'s type
    (reference ``transfer_type``)."""

    def preference(*types):
        return [types[i] if isinstance(i, int) else i for i in indices]

    return preference


def specific_out(*spec_types):
    """output_types_preference returning fixed types (reference)."""

    def preference(*types):
        return list(spec_types)

    return preference


def unary_out_lookup(type_table):
    """output_types_preference from an {in_dtype: out_dtype} table
    (reference ``unary_out_lookup``)."""

    def preference(t, *rest):
        out = type_table.get(t.dtype)
        if out is None:
            raise TypeError(f"no output type rule for {t.dtype}")
        return [ScalarType(out)]

    return preference
