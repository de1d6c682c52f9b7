"""Math ops: elemwise wrappers, reductions, argmax, dot/matmul.

Re-design of the reference's ``aesara/tensor/math.py`` (MaxAndArgmax:126,
Argmax:342, Mean:1495, Dot:1879, MatMul:2871, ~200 elemwise wrappers) with
the BLAS family (Gemm/Dot22/BatchedDot of ``aesara/tensor/blas.py``)
represented by ``Dot``/``BatchedDot`` that lower straight to MXU
``dot_general`` (SURVEY §2.11 item 4: no BLAS discovery on TPU).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from aesara_tpu import scalar as aes
from aesara_tpu.config import config
from aesara_tpu.graph.ir import Apply, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.scalar.ops import ScalarType, _np_dtype, discrete_dtypes, upcast
from aesara_tpu.tensor import basic as tb
from aesara_tpu.tensor.basic import as_tensor_variable, cast, constant
from aesara_tpu.tensor.elemwise import CAReduce, DimShuffle, Elemwise
from aesara_tpu.tensor.type import TensorType


# ---------------------------------------------------------------------------
# elemwise wrappers
# ---------------------------------------------------------------------------

def _ew(scalar_op, name):
    op = Elemwise(scalar_op)

    def fn(*args):
        return op(*args)

    fn.__name__ = name
    fn.elemwise_op = op
    fn.scalar_op = scalar_op
    return fn


add = _ew(aes.ops.add, "add")
sub = _ew(aes.ops.sub, "sub")
mul = _ew(aes.ops.mul, "mul")
true_div = _ew(aes.ops.true_div, "true_div")
int_div = _ew(aes.ops.int_div, "int_div")
floor_div = int_div
mod = _ew(aes.ops.mod, "mod")
pow = _ew(aes.ops.pow, "pow")
neg = _ew(aes.ops.neg, "neg")
abs = _ew(aes.ops.abs_, "abs")
sgn = _ew(aes.ops.sgn, "sgn")
sign = sgn
ceil = _ew(aes.ops.ceil, "ceil")
floor = _ew(aes.ops.floor, "floor")
trunc = _ew(aes.ops.trunc, "trunc")
round_half_to_even = _ew(aes.ops.round_half_to_even, "round_half_to_even")
round_half_away_from_zero = _ew(aes.ops.round_half_away_from_zero, "round_half_away_from_zero")
maximum = _ew(aes.ops.maximum, "maximum")
minimum = _ew(aes.ops.minimum, "minimum")
lt = _ew(aes.ops.lt, "lt")
gt = _ew(aes.ops.gt, "gt")
le = _ew(aes.ops.le, "le")
ge = _ew(aes.ops.ge, "ge")
eq = _ew(aes.ops.eq, "eq")
neq = _ew(aes.ops.neq, "neq")
isnan_ = _ew(aes.ops.isnan, "isnan")
isinf_ = _ew(aes.ops.isinf, "isinf")
and_ = _ew(aes.ops.and_, "and_")
bitwise_and = and_
or_ = _ew(aes.ops.or_, "or_")
bitwise_or = or_
xor = _ew(aes.ops.xor, "xor")
bitwise_xor = xor
invert = _ew(aes.ops.invert, "invert")
bitwise_not = invert
shift_left = _ew(aes.ops.shift_left, "shift_left")
shift_right = _ew(aes.ops.shift_right, "shift_right")
exp = _ew(aes.ops.exp, "exp")
exp2 = _ew(aes.ops.exp2, "exp2")
expm1 = _ew(aes.ops.expm1, "expm1")
log = _ew(aes.ops.log, "log")
log2 = _ew(aes.ops.log2, "log2")
log10 = _ew(aes.ops.log10, "log10")
log1p = _ew(aes.ops.log1p, "log1p")
sqrt = _ew(aes.ops.sqrt, "sqrt")
sqr = _ew(aes.ops.sqr, "sqr")
square = sqr
deg2rad = _ew(aes.ops.deg2rad, "deg2rad")
rad2deg = _ew(aes.ops.rad2deg, "rad2deg")
cos = _ew(aes.ops.cos, "cos")
sin = _ew(aes.ops.sin, "sin")
tan = _ew(aes.ops.tan, "tan")
arccos = _ew(aes.ops.arccos, "arccos")
arcsin = _ew(aes.ops.arcsin, "arcsin")
arctan = _ew(aes.ops.arctan, "arctan")
arctan2 = _ew(aes.ops.arctan2, "arctan2")
cosh = _ew(aes.ops.cosh, "cosh")
sinh = _ew(aes.ops.sinh, "sinh")
tanh = _ew(aes.ops.tanh, "tanh")
arccosh = _ew(aes.ops.arccosh, "arccosh")
arcsinh = _ew(aes.ops.arcsinh, "arcsinh")
arctanh = _ew(aes.ops.arctanh, "arctanh")
erf = _ew(aes.math.erf, "erf")
erfc = _ew(aes.math.erfc, "erfc")
erfinv = _ew(aes.math.erfinv, "erfinv")
erfcinv = _ew(aes.math.erfcinv, "erfcinv")
gamma = _ew(aes.math.gamma, "gamma")
gammaln = _ew(aes.math.gammaln, "gammaln")
psi = _ew(aes.math.psi, "psi")
digamma = psi
tri_gamma = _ew(aes.math.tri_gamma, "tri_gamma")
polygamma1 = tri_gamma
gammainc = _ew(aes.math.gammainc, "gammainc")
gammaincc = _ew(aes.math.gammaincc, "gammaincc")
gammau = _ew(aes.math.gammau, "gammau")
gammal = _ew(aes.math.gammal, "gammal")
j0 = _ew(aes.math.j0, "j0")
j1 = _ew(aes.math.j1, "j1")
jv = _ew(aes.math.jv, "jv")
i0 = _ew(aes.math.i0, "i0")
i1 = _ew(aes.math.i1, "i1")
iv = _ew(aes.math.iv, "iv")
betainc = _ew(aes.math.betainc, "betainc")
hyp2f1 = _ew(aes.math.hyp2f1, "hyp2f1")
sigmoid = _ew(aes.math.sigmoid, "sigmoid")
expit = sigmoid
softplus = _ew(aes.math.softplus, "softplus")
log1pexp = softplus
log1mexp = _ew(aes.math.log1mexp, "log1mexp")
conj = _ew(aes.ops.conj, "conj")
conjugate = conj


real = _ew(aes.ops.real_part, "real")
imag = _ew(aes.ops.imag_part, "imag")
angle = _ew(aes.ops.angle, "angle")
complex = _ew(aes.ops.complex_op, "complex")
complex_from_polar = _ew(aes.ops.complex_from_polar, "complex_from_polar")


reciprocal = _ew(aes.ops.reciprocal, "reciprocal")


inv = reciprocal


def clip(x, min_, max_):
    return minimum(maximum(x, min_), max_)


def divmod_(x, y):
    return int_div(x, y), mod(x, y)


def round(x, mode: str = "half_to_even"):
    if mode == "half_to_even":
        return round_half_to_even(x)
    if mode == "half_away_from_zero":
        return round_half_away_from_zero(x)
    raise ValueError(f"unknown round mode {mode}")


def iround(x, mode: str = "half_to_even"):
    return cast(round(x, mode), "int64")


def isnan(x):
    x = as_tensor_variable(x)
    if x.type.dtype in discrete_dtypes:
        return tb.zeros_like(x, dtype="bool")
    return isnan_(x)


def isinf(x):
    x = as_tensor_variable(x)
    if x.type.dtype in discrete_dtypes:
        return tb.zeros_like(x, dtype="bool")
    return isinf_(x)


def isclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False):
    a, b = as_tensor_variable(a), as_tensor_variable(b)
    diff = abs(sub(a, b))
    tol = add(constant(atol), mul(constant(rtol), abs(b)))
    close = le(diff, tol)
    res = and_(close, and_(invert_bool(isinf(a)), invert_bool(isinf(b))))
    res = or_(res, and_(isinf(a), and_(isinf(b), eq(sgn(a), sgn(b)))))
    if equal_nan:
        res = or_(res, and_(isnan(a), isnan(b)))
    return res


def allclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False):
    return all(isclose(a, b, rtol, atol, equal_nan))


def invert_bool(x):
    return eq(x, constant(False))


def logaddexp(a, b):
    m = maximum(a, b)
    return add(m, log1p(exp(neg(abs(sub(a, b))))))


def logsumexp(x, axis=None, keepdims=False):
    m = max(x, axis=axis, keepdims=True)
    res = add(log(sum(exp(sub(x, m)), axis=axis, keepdims=True)), m)
    if not keepdims:
        res = _drop_kept_dims(res, axis, as_tensor_variable(x).type.ndim)
    return res


def _drop_kept_dims(res, axis, ndim):
    if axis is None:
        axes = tuple(range(ndim))
    elif isinstance(axis, (int, np.integer)):
        axes = (int(axis) % ndim,)
    else:
        axes = tuple(int(a) % ndim for a in axis)
    keep = tuple(d for d in range(ndim) if d not in axes)
    # res still has all dims (keepdims=True shape); select the kept ones
    order = []
    counter = 0
    for d in range(ndim):
        if d in axes:
            counter += 1
        else:
            order.append(d)
    return DimShuffle(res.type.ndim, tuple(order))(res)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

class Sum(CAReduce):
    """Sum reduction (reference ``math.py:2351`` wrappers over CAReduce)."""

    def __init__(self, axis=None, dtype=None, acc_dtype=None):
        super().__init__(
            aes.ops.add, axis=axis, dtype=dtype, acc_dtype=acc_dtype,
            upcast_discrete_output=True,
        )

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        if x.type.dtype in discrete_dtypes:
            return [x.zeros_like(dtype=config.floatX)]
        axes = self._normalized_axes(x.type.ndim)
        new_order = ["x"] * x.type.ndim
        counter = 0
        for d in range(x.type.ndim):
            if d not in axes:
                new_order[d] = counter
                counter += 1
        gz_pad = DimShuffle(gz.type.ndim, tuple(new_order))(gz)
        gx = tb.fill(x, gz_pad)
        if gx.type.dtype != x.type.dtype:
            gx = cast(gx, x.type.dtype)
        return [gx]

    def R_op(self, inputs, eval_points):
        if eval_points[0] is None:
            return [None]
        return self.make_node(eval_points[0]).outputs

    def __str__(self):
        ax = "" if self.axis is None else f"{{axis={list(self.axis)}}}"
        return f"Sum{ax}"


class Prod(CAReduce):
    def __init__(self, axis=None, dtype=None, acc_dtype=None, no_zeros_in_input=False):
        super().__init__(
            aes.ops.mul, axis=axis, dtype=dtype, acc_dtype=acc_dtype,
            upcast_discrete_output=True,
        )

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        if x.type.dtype in discrete_dtypes:
            return [x.zeros_like(dtype=config.floatX)]
        axes = self._normalized_axes(x.type.ndim)
        new_order = ["x"] * x.type.ndim
        counter = 0
        for d in range(x.type.ndim):
            if d not in axes:
                new_order[d] = counter
                counter += 1
        gz_pad = DimShuffle(gz.type.ndim, tuple(new_order))(gz)
        # d prod/dx_i = prod_{j != i} x_j — computed WITHOUT dividing by
        # x_i so zeros don't produce NaN (review finding; reference has
        # the same zero-handling branch):
        #   z  = #zeros along the axis; pnz = prod of nonzero entries
        #   z == 0           -> pnz / x_i  (x_i != 0 there)
        #   z == 1 at a zero -> pnz
        #   otherwise        -> 0
        is_zero = eq(x, tb.constant(0, dtype=x.type.dtype))
        ones = tb.ones_like(x)
        x_safe = tb.switch(is_zero, ones, x)
        red = lambda v, op_cls: DimShuffle(gz.type.ndim, tuple(new_order))(
            op_cls(v)
        )
        pnz_pad = red(x_safe, Prod(axis=self.axis, dtype=self.dtype,
                                   acc_dtype=self.acc_dtype))
        z_pad = DimShuffle(gz.type.ndim, tuple(new_order))(
            Sum(axis=self.axis)(cast(is_zero, "int64"))
        )
        zf = tb.fill(x, z_pad)
        pnzf = tb.fill(x, pnz_pad)
        prod_others = tb.switch(
            eq(zf, 0),
            true_div(pnzf, x_safe),
            tb.switch(and_(eq(zf, 1), is_zero), pnzf,
                      tb.zeros_like(x)),
        )
        gx = mul(tb.fill(x, gz_pad), prod_others)
        if gx.type.dtype != x.type.dtype:
            gx = cast(gx, x.type.dtype)
        return [gx]

    def __str__(self):
        ax = "" if self.axis is None else f"{{axis={list(self.axis)}}}"
        return f"Prod{ax}"


class Max(CAReduce):
    def __init__(self, axis=None):
        super().__init__(aes.ops.maximum, axis=axis)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        if x.type.dtype in discrete_dtypes:
            from aesara_tpu.gradient import grad_undefined

            return [grad_undefined(self, 0, x)]
        axes = self._normalized_axes(x.type.ndim)
        new_order = ["x"] * x.type.ndim
        counter = 0
        for d in range(x.type.ndim):
            if d not in axes:
                new_order[d] = counter
                counter += 1
        out = self(x)
        out_pad = DimShuffle(out.type.ndim, tuple(new_order))(out)
        gz_pad = DimShuffle(gz.type.ndim, tuple(new_order))(gz)
        mask = cast(eq(x, tb.fill(x, out_pad)), x.type.dtype)
        gx = mul(mask, tb.fill(x, gz_pad))
        return [gx]

    def __str__(self):
        ax = "" if self.axis is None else f"{{axis={list(self.axis)}}}"
        return f"Max{ax}"


class Min(CAReduce):
    def __init__(self, axis=None):
        super().__init__(aes.ops.minimum, axis=axis)

    def grad(self, inputs, output_grads):
        # min(x) = -max(-x): backprop through that identity
        (x,) = inputs
        (gz,) = output_grads
        return [neg(Max(axis=self.axis).grad([neg(x)], [neg(gz)])[0])]

    def __str__(self):
        ax = "" if self.axis is None else f"{{axis={list(self.axis)}}}"
        return f"Min{ax}"


class All(CAReduce):
    def __init__(self, axis=None):
        super().__init__(aes.ops.and_, axis=axis, dtype="bool")

    def make_node(self, inp):
        inp = as_tensor_variable(inp)
        if inp.type.dtype != "bool":
            inp = neq(inp, constant(0, dtype="int8"))
        return super().make_node(inp)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0])]

    def __str__(self):
        ax = "" if self.axis is None else f"{{axis={list(self.axis)}}}"
        return f"All{ax}"


class Any(CAReduce):
    def __init__(self, axis=None):
        super().__init__(aes.ops.or_, axis=axis, dtype="bool")

    def make_node(self, inp):
        inp = as_tensor_variable(inp)
        if inp.type.dtype != "bool":
            inp = neq(inp, constant(0, dtype="int8"))
        return super().make_node(inp)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0])]

    def __str__(self):
        ax = "" if self.axis is None else f"{{axis={list(self.axis)}}}"
        return f"Any{ax}"


def _reduce(op_cls, x, axis, keepdims, **kwargs):
    x = as_tensor_variable(x)
    res = op_cls(axis=axis, **kwargs)(x)
    if keepdims:
        axes = op_cls(axis=axis, **kwargs)._normalized_axes(x.type.ndim)
        new_order = []
        counter = 0
        for d in range(x.type.ndim):
            if d in axes:
                new_order.append("x")
            else:
                new_order.append(counter)
                counter += 1
        res = DimShuffle(res.type.ndim, tuple(new_order))(res)
    return res


def sum(x, axis=None, dtype=None, keepdims=False, acc_dtype=None):
    return _reduce(Sum, x, axis, keepdims, dtype=dtype, acc_dtype=acc_dtype)


def prod(x, axis=None, dtype=None, keepdims=False, acc_dtype=None, no_zeros_in_input=False):
    return _reduce(Prod, x, axis, keepdims, dtype=dtype, acc_dtype=acc_dtype)


def max(x, axis=None, keepdims=False):
    return _reduce(Max, x, axis, keepdims)


def min(x, axis=None, keepdims=False):
    return _reduce(Min, x, axis, keepdims)


def all(x, axis=None, keepdims=False):
    return _reduce(All, x, axis, keepdims)


def any(x, axis=None, keepdims=False):
    return _reduce(Any, x, axis, keepdims)


def mean(x, axis=None, dtype=None, keepdims=False, acc_dtype=None):
    """Mean (reference ``math.py:1495``) built as sum/size."""
    x = as_tensor_variable(x)
    s = sum(x, axis=axis, dtype=acc_dtype, keepdims=keepdims, acc_dtype=acc_dtype)
    if axis is None:
        axes = list(range(x.type.ndim))
    elif isinstance(axis, (int, np.integer)):
        axes = [int(axis) % x.type.ndim]
    else:
        axes = [int(a) % x.type.ndim for a in axis]
    from aesara_tpu.tensor.shape import shape_tuple

    shp = shape_tuple(x)
    n = constant(1, dtype="int64")
    for a in axes:
        n = mul(n, shp[a])
    if dtype is None:
        dtype = s.type.dtype if s.type.dtype not in discrete_dtypes else config.floatX
    res = true_div(cast(s, dtype) if s.type.dtype in discrete_dtypes else s, cast(n, dtype))
    return cast(res, dtype) if res.type.dtype != dtype else res


def var(x, axis=None, ddof=0, keepdims=False, corrected=False):
    x = as_tensor_variable(x)
    m = mean(x, axis=axis, keepdims=True)
    centered = sub(x, m)
    sq = mean(sqr(centered), axis=axis, keepdims=keepdims)
    if ddof:
        from aesara_tpu.tensor.shape import shape_tuple

        if axis is None:
            axes = list(range(x.type.ndim))
        elif isinstance(axis, (int, np.integer)):
            axes = [int(axis) % x.type.ndim]
        else:
            axes = [int(a) % x.type.ndim for a in axis]
        shp = shape_tuple(x)
        n = constant(1, dtype="int64")
        for a in axes:
            n = mul(n, shp[a])
        nf = cast(n, sq.type.dtype)
        sq = mul(sq, true_div(nf, sub(nf, constant(float(ddof)))))
    return sq


def std(x, axis=None, ddof=0, keepdims=False):
    return sqrt(var(x, axis=axis, ddof=ddof, keepdims=keepdims))


def ptp(x, axis=None):
    return sub(max(x, axis=axis), min(x, axis=axis))


def norm(x, L=2, axis=None, keepdims=False):
    x = as_tensor_variable(x)
    if L == 1:
        return sum(abs(x), axis=axis, keepdims=keepdims)
    if L == 2:
        # complex: sum of |z|^2 (real), NOT sum of z^2 — numpy contract
        sq = sqr(abs(x)) if x.type.dtype.startswith("complex") else sqr(x)
        return sqrt(sum(sq, axis=axis, keepdims=keepdims))
    if np.isinf(L):
        if L > 0:
            return max(abs(x), axis=axis, keepdims=keepdims)
        return min(abs(x), axis=axis, keepdims=keepdims)
    return pow(sum(pow(abs(x), constant(float(L))), axis=axis, keepdims=keepdims),
               constant(1.0 / float(L)))


# ---------------------------------------------------------------------------
# argmax / max_and_argmax
# ---------------------------------------------------------------------------

class Argmax(Op):
    """Argmax over given axes (reference ``math.py:342``)."""

    __props__ = ("axis",)

    def __init__(self, axis):
        if axis is None:
            self.axis = None
        elif isinstance(axis, (int, np.integer)):
            self.axis = (int(axis),)
        else:
            self.axis = tuple(sorted(int(a) for a in axis))

    def _axes(self, ndim):
        if self.axis is None:
            return tuple(range(ndim))
        for a in self.axis:
            if not (-ndim <= a < ndim):
                raise ValueError(
                    f"axis {a} out of range for ndim {ndim}"
                )
        return tuple(sorted(a % ndim for a in self.axis))

    def make_node(self, x):
        x = as_tensor_variable(x)
        axes = self._axes(x.type.ndim)
        out_shape = tuple(s for d, s in enumerate(x.type.shape) if d not in axes)
        return Apply(self, [x], [TensorType("int64", out_shape)()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        axes = self._axes(x.ndim)
        if len(axes) == x.ndim:
            res = np.argmax(x.ravel())
        elif len(axes) == 1:
            res = np.argmax(x, axis=axes[0])
        else:
            # move reduced axes to the end, flatten them
            keep = [d for d in range(x.ndim) if d not in axes]
            trans = np.transpose(x, keep + list(axes))
            new_shape = trans.shape[: len(keep)] + (-1,)
            res = np.argmax(trans.reshape(new_shape), axis=-1)
        output_storage[0][0] = np.asarray(res, dtype=np.int64)

    def infer_shape(self, fgraph, node, input_shapes):
        (ishape,) = input_shapes
        axes = self._axes(node.inputs[0].type.ndim)
        return [tuple(s for d, s in enumerate(ishape) if d not in axes)]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0])]

    def __str__(self):
        return f"Argmax{{axis={self.axis}}}"


def argmax(x, axis=None, keepdims=False):
    x = as_tensor_variable(x)
    res = Argmax(axis)(x)
    if keepdims:
        axes = Argmax(axis)._axes(x.type.ndim)
        new_order = []
        counter = 0
        for d in range(x.type.ndim):
            if d in axes:
                new_order.append("x")
            else:
                new_order.append(counter)
                counter += 1
        res = DimShuffle(res.type.ndim, tuple(new_order))(res)
    return res


def argmin(x, axis=None, keepdims=False):
    x = as_tensor_variable(x)
    dt = x.type.dtype
    if dt == "bool" or dt.startswith(("int", "uint")):
        # ~x = -x-1 (signed) / MAX-x (unsigned): exactly monotone-
        # reversed with NO overflow — neg wraps for uints and INT_MIN
        # (review finding: argmin(uint8 [0,1,2]) returned 1)
        return argmax(invert(x), axis=axis, keepdims=keepdims)
    return argmax(neg(x), axis=axis, keepdims=keepdims)


def max_and_argmax(x, axis=None, keepdims=False):
    """Both max and argmax (reference ``math.py:126`` MaxAndArgmax)."""
    return (max(x, axis=axis, keepdims=keepdims), argmax(x, axis=axis, keepdims=keepdims))


# ---------------------------------------------------------------------------
# dot / matmul — the MXU path
# ---------------------------------------------------------------------------

class Dot(Op):
    """Vector/matrix product for ndim ≤ 2 (reference ``math.py:1879``).

    The reference's Gemm/Dot22/Gemv/Ger BLAS pipeline (``tensor/blas.py``)
    collapses on TPU into this single op lowered to ``lax.dot_general`` on
    the MXU with ``preferred_element_type`` from config.
    """

    __props__ = ()

    def make_node(self, x, y):
        x, y = as_tensor_variable(x), as_tensor_variable(y)
        if x.type.ndim not in (1, 2) or y.type.ndim not in (1, 2):
            raise TypeError(
                f"Dot supports ndim 1/2, got {x.type.ndim} and {y.type.ndim}; "
                "use tensordot/matmul"
            )
        if x.type.ndim == 1 and y.type.ndim == 1:
            out_shape = ()
        elif x.type.ndim == 2 and y.type.ndim == 1:
            out_shape = (x.type.shape[0],)
        elif x.type.ndim == 1 and y.type.ndim == 2:
            out_shape = (y.type.shape[1],)
        else:
            out_shape = (x.type.shape[0], y.type.shape[1])
        # static inner-dim check
        xi = x.type.shape[-1]
        yi = y.type.shape[0] if y.type.ndim > 0 else None
        if x.type.ndim and y.type.ndim and xi is not None and yi is not None and xi != yi:
            raise TypeError(f"Dot inner dims mismatch: {xi} vs {yi}")
        out_dtype = upcast(x.type.dtype, y.type.dtype)
        return Apply(self, [x, y], [TensorType(out_dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        x, y = inputs
        out_dtype = _np_dtype(node.outputs[0].type.dtype)
        output_storage[0][0] = np.asarray(np.dot(x, y)).astype(out_dtype, copy=False)

    def infer_shape(self, fgraph, node, input_shapes):
        xs, ys = input_shapes
        x, y = node.inputs
        if x.type.ndim == 1 and y.type.ndim == 1:
            return [()]
        if x.type.ndim == 2 and y.type.ndim == 1:
            return [(xs[0],)]
        if x.type.ndim == 1 and y.type.ndim == 2:
            return [(ys[1],)]
        return [(xs[0], ys[1])]

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        xdim, ydim, gdim = x.type.ndim, y.type.ndim, gz.type.ndim
        if xdim == 2 and ydim == 2:
            gx, gy = dot(gz, y.T), dot(x.T, gz)
        elif xdim == 1 and ydim == 2:
            gx, gy = dot(gz, y.T), outer(x, gz)
        elif xdim == 2 and ydim == 1:
            gx, gy = outer(gz, y), dot(x.T, gz)
        else:  # 1, 1
            gx, gy = mul(gz, y), mul(gz, x)
        if gx.type.dtype != x.type.dtype:
            gx = cast(gx, x.type.dtype)
        if gy.type.dtype != y.type.dtype:
            gy = cast(gy, y.type.dtype)
        return [gx, gy]

    def R_op(self, inputs, eval_points):
        x, y = inputs
        ex, ey = eval_points
        terms = []
        if ex is not None:
            terms.append(self(ex, y))
        if ey is not None:
            terms.append(self(x, ey))
        if not terms:
            return [None]
        res = terms[0]
        for t in terms[1:]:
            res = add(res, t)
        return [res]

    def __str__(self):
        return "dot"


_dot = Dot()


class BatchedDot(Op):
    """Batched matrix product over a leading batch dim (reference
    ``tensor/blas.py:2179``) — lowers to one MXU ``dot_general`` with batch
    dimensions instead of a host loop."""

    __props__ = ()

    def make_node(self, x, y):
        x, y = as_tensor_variable(x), as_tensor_variable(y)
        if x.type.ndim not in (2, 3) or y.type.ndim not in (2, 3):
            raise TypeError("BatchedDot needs ndim 2 or 3 inputs")
        out_dtype = upcast(x.type.dtype, y.type.dtype)
        xs, ys = x.type.shape, y.type.shape
        batch = xs[0] if xs[0] is not None else ys[0]
        if x.type.ndim == 3 and y.type.ndim == 3:
            out_shape = (batch, xs[1], ys[2])
        elif x.type.ndim == 3 and y.type.ndim == 2:
            out_shape = (batch, xs[1])
        elif x.type.ndim == 2 and y.type.ndim == 3:
            out_shape = (batch, ys[2])
        else:
            out_shape = (batch,)
        return Apply(self, [x, y], [TensorType(out_dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        x, y = inputs
        out_dtype = _np_dtype(node.outputs[0].type.dtype)
        if x.ndim == 3 and y.ndim == 3:
            res = np.matmul(x, y)
        elif x.ndim == 3 and y.ndim == 2:
            res = np.einsum("bij,bj->bi", x, y)
        elif x.ndim == 2 and y.ndim == 3:
            res = np.einsum("bi,bij->bj", x, y)
        else:
            res = np.einsum("bi,bi->b", x, y)
        output_storage[0][0] = np.asarray(res).astype(out_dtype, copy=False)

    def infer_shape(self, fgraph, node, input_shapes):
        xs, ys = input_shapes
        x, y = node.inputs
        if x.type.ndim == 3 and y.type.ndim == 3:
            return [(xs[0], xs[1], ys[2])]
        if x.type.ndim == 3 and y.type.ndim == 2:
            return [(xs[0], xs[1])]
        if x.type.ndim == 2 and y.type.ndim == 3:
            return [(xs[0], ys[2])]
        return [(xs[0],)]

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        xdim, ydim = x.type.ndim, y.type.ndim
        if xdim == 3 and ydim == 3:
            gx = batched_dot(gz, y.dimshuffle(0, 2, 1))
            gy = batched_dot(x.dimshuffle(0, 2, 1), gz)
        elif xdim == 3 and ydim == 2:
            gx = mul(gz.dimshuffle(0, 1, "x"), y.dimshuffle(0, "x", 1))
            gy = batched_dot(x.dimshuffle(0, 2, 1), gz)
        elif xdim == 2 and ydim == 3:
            gx = batched_dot(gz, y.dimshuffle(0, 2, 1))
            gy = mul(x.dimshuffle(0, 1, "x"), gz.dimshuffle(0, "x", 1))
        else:
            gx = mul(gz.dimshuffle(0, "x"), y)
            gy = mul(gz.dimshuffle(0, "x"), x)
        if gx.type.dtype != x.type.dtype:
            gx = cast(gx, x.type.dtype)
        if gy.type.dtype != y.type.dtype:
            gy = cast(gy, y.type.dtype)
        return [gx, gy]

    def R_op(self, inputs, eval_points):
        # bilinear product rule: d(x·y)[vx, vy] = vx·y + x·vy
        x, y = inputs
        vx, vy = eval_points
        terms = []
        if vx is not None:
            terms.append(batched_dot(vx, y))
        if vy is not None:
            terms.append(batched_dot(x, vy))
        if not terms:
            return [None]
        return [terms[0] if len(terms) == 1 else add(*terms)]

    def __str__(self):
        return "batched_dot"


_batched_dot = BatchedDot()


def _is_sparse_variable(v) -> bool:
    t = getattr(v, "type", None)
    return t is not None and type(t).__name__ == "SparseTensorType"


def dot(x, y):
    """NumPy dot semantics (reference ``tensor/math.py`` dense_dot); a
    sparse operand routes to the sparse dot (reference ``math.py:2032``
    ``dot`` dispatches through ``__dot__``/``__rdot__``, which sparse
    variables override)."""
    if _is_sparse_variable(x) or _is_sparse_variable(y):
        from aesara_tpu.sparse.basic import dot as sparse_dot

        return sparse_dot(x, y)
    x, y = as_tensor_variable(x), as_tensor_variable(y)
    if x.type.ndim == 0 or y.type.ndim == 0:
        return mul(x, y)
    if x.type.ndim > 2 or y.type.ndim > 2:
        return tensordot(x, y, [[x.type.ndim - 1], [np.maximum(y.type.ndim - 2, 0)]])
    return _dot(x, y)


def batched_dot(x, y):
    return _batched_dot(x, y)


def batched_tensordot(x, y, axes=2):
    return _tensordot_as_dot(x, y, axes, batched=True)


def outer(x, y):
    x, y = as_tensor_variable(x), as_tensor_variable(y)
    if x.type.ndim != 1:
        x = x.flatten()
    if y.type.ndim != 1:
        y = y.flatten()
    return _dot(x.dimshuffle(0, "x"), y.dimshuffle("x", 0))


def matmul(x, y):
    """numpy.matmul semantics (reference ``math.py:2871`` MatMul)."""
    x, y = as_tensor_variable(x), as_tensor_variable(y)
    if x.type.ndim == 0 or y.type.ndim == 0:
        raise ValueError("matmul does not accept scalars")
    if x.type.ndim <= 2 and y.type.ndim <= 2:
        return _dot(x, y)
    if x.type.ndim == y.type.ndim == 3:
        return _batched_dot(x, y)
    # general stacked case: broadcast batch dims, flatten, batched_dot, restore
    nd = int(np.maximum(x.type.ndim, y.type.ndim))
    xx = tb.atleast_Nd(x, nd) if x.type.ndim >= 2 else tb.atleast_Nd(
        x.dimshuffle("x", 0), nd
    )
    yy = tb.atleast_Nd(y, nd) if y.type.ndim >= 2 else tb.atleast_Nd(
        y.dimshuffle(0, "x"), nd
    )
    from aesara_tpu.tensor.shape import shape_tuple, reshape

    xshape = shape_tuple(xx)
    yshape = shape_tuple(yy)
    batch = [maximum(a, b) for a, b in zip(xshape[:-2], yshape[:-2])]
    bx = xx * tb.ones(tuple(batch) + (1, 1), dtype=xx.type.dtype) if xx.type.ndim else xx
    by = yy * tb.ones(tuple(batch) + (1, 1), dtype=yy.type.dtype)
    nbatch = batch[0]
    for b in batch[1:]:
        nbatch = mul(nbatch, b)
    fx = reshape(bx, [nbatch, xshape[-2], xshape[-1]], ndim=3)
    fy = reshape(by, [nbatch, yshape[-2], yshape[-1]], ndim=3)
    out = _batched_dot(fx, fy)
    res = reshape(out, list(batch) + [xshape[-2], yshape[-1]], ndim=nd)
    if x.type.ndim == 1:
        res = res[..., 0, :]
    if y.type.ndim == 1:
        res = res[..., 0]
    return res


def tensordot(a, b, axes=2):
    """numpy.tensordot via transpose+reshape+Dot (reference ``math.py``)."""
    return _tensordot_as_dot(a, b, axes, batched=False)


def _tensordot_as_dot(a, b, axes, batched: bool):
    a, b = as_tensor_variable(a), as_tensor_variable(b)
    if isinstance(axes, (int, np.integer)):
        n = int(axes)
        # a's contraction axes are its LAST n dims (already full-ndim
        # coordinates — shifting them past the end wrapped onto the
        # batch axis, review finding); b's are its first n NON-batch dims
        a_last = list(range(a.type.ndim - n, a.type.ndim))
        b_first = list(range(1, 1 + n)) if batched else list(range(n))
        axes = [a_last, b_first]
    a_axes = [int(ax) % a.type.ndim for ax in np.atleast_1d(axes[0])]
    b_axes = [int(ax) % b.type.ndim for ax in np.atleast_1d(axes[1])]
    if len(a_axes) != len(b_axes):
        raise ValueError("tensordot axes must have equal length")
    batch_off = 1 if batched else 0
    a_free = [d for d in range(batch_off, a.type.ndim) if d not in a_axes]
    b_free = [d for d in range(batch_off, b.type.ndim) if d not in b_axes]
    at = a.dimshuffle(*( ([0] if batched else []) + a_free + a_axes))
    bt = b.dimshuffle(*( ([0] if batched else []) + b_axes + b_free))
    from aesara_tpu.tensor.shape import reshape, shape_tuple

    ashape = shape_tuple(at)
    bshape = shape_tuple(bt)
    nfa = len(a_free)
    nca = len(a_axes)
    one = constant(1, dtype="int64")

    def prod_dims(dims):
        r = one
        for d in dims:
            r = mul(r, d)
        return r

    if batched:
        am = reshape(at, [ashape[0], prod_dims(ashape[1:1 + nfa]), prod_dims(ashape[1 + nfa:])], ndim=3)
        bm = reshape(bt, [bshape[0], prod_dims(bshape[1:1 + nca]), prod_dims(bshape[1 + nca:])], ndim=3)
        out = _batched_dot(am, bm)
        final = [ashape[0]] + [ashape[1 + i] for i in range(nfa)] + \
                [bshape[1 + nca + i] for i in range(len(b_free))]
        return reshape(out, final, ndim=len(final))
    am = reshape(at, [prod_dims(ashape[:nfa]), prod_dims(ashape[nfa:])], ndim=2)
    bm = reshape(bt, [prod_dims(bshape[:nca]), prod_dims(bshape[nca:])], ndim=2)
    out = _dot(am, bm)
    final = [ashape[i] for i in range(nfa)] + [bshape[nca + i] for i in range(len(b_free))]
    if not final:
        from aesara_tpu.tensor.shape import reshape as _r

        return reshape(out, [], ndim=0)
    return reshape(out, final, ndim=len(final))


def dense_dot(x, y):
    return dot(x, y)


# --- BLAS-call parity helpers (reference tensor/blas.py Gemv:231, Ger:330,
# Gemm:872) — on TPU these are just dot_general compositions; the names
# exist so BLAS-era user code ports unchanged.

def gemv(z, alpha, a, x, beta):
    """beta*z + alpha*dot(a, x) as one fused Gemv node (tensor/blas.py)."""
    from aesara_tpu.tensor import blas

    return blas.gemv(z, alpha, a, x, beta)


def ger(z, alpha, x, y):
    """rank-1 update z + alpha*outer(x, y) as one fused Ger node."""
    from aesara_tpu.tensor import blas

    return blas.ger(z, alpha, x, y)


def gemm(z, alpha, a, b, beta):
    """beta*z + alpha*dot(a, b) as one fused Gemm node — the canonical
    MXU multiply-accumulate (tensor/blas.py)."""
    from aesara_tpu.tensor import blas

    return blas.gemm(z, alpha, a, b, beta)


def convolve(x, kernel, mode: str = "full"):
    """1-d convolution of two vectors (reference ``tensor/math.py``
    Convolve:3005 — np.convolve semantics).  Built from the MXU-friendly
    conv primitive: pad per mode, flip the kernel, slide."""
    from aesara_tpu.tensor.nnet.abstract_conv import conv2d
    from aesara_tpu.tensor.shape import shape_padleft

    x = as_tensor_variable(x)
    kernel = as_tensor_variable(kernel)
    if x.type.ndim != 1 or kernel.type.ndim != 1:
        raise TypeError("convolve expects two vectors")
    # lift to NCHW with H=1: x -> (1,1,1,N), kernel -> (1,1,1,K)
    xi = x.dimshuffle("x", "x", "x", 0)
    ki = kernel.dimshuffle("x", "x", "x", 0)
    if mode in ("full", "valid"):
        res = conv2d(xi, ki, border_mode=mode)
        return res.dimshuffle(3)
    if mode == "same":
        # np 'same' = centre slice of 'full', length max(N, K) — computed
        # symbolically; the shape arithmetic folds to static under jit
        full = conv2d(xi, ki, border_mode="full").dimshuffle(3)
        n = x.shape[0]
        k = kernel.shape[0]
        start = (minimum(n, k) - 1) // 2
        return full[start: start + maximum(n, k)]
    raise ValueError(f"unknown convolve mode {mode!r}")


# --- reference __all__ completions (tensor/math.py tail) ---------------------

true_divide = true_div
floor_divide = int_div
power = pow
divmod = divmod_


def ceil_intdiv(a, b):
    """ceil(a / b) for ints (reference ``ceil_intdiv``)."""
    return -int_div(-as_tensor_variable(a), b)


def largest(*args):
    """Variadic elementwise max (reference ``largest``)."""
    if len(args) == 1:
        return as_tensor_variable(args[0])
    res = args[0]
    for a in args[1:]:
        res = maximum(res, a)
    return res


def smallest(*args):
    if len(args) == 1:
        return as_tensor_variable(args[0])
    res = args[0]
    for a in args[1:]:
        res = minimum(res, a)
    return res


def chi2sf(x, k):
    """Chi-square survival function: Q(k/2, x/2) (reference ``chi2sf``)."""
    return gammaincc(true_div(k, constant(2.0)), true_div(x, constant(2.0)))


def cov(m, y=None, rowvar=True, bias=False, ddof=None):
    """Covariance matrix, np.cov semantics (reference ``cov``)."""
    m = as_tensor_variable(m)
    if m.type.ndim == 1:
        m = m.dimshuffle("x", 0)
    if not rowvar:
        m = m.T
    if y is not None:
        y = as_tensor_variable(y)
        if y.type.ndim == 1:
            y = y.dimshuffle("x", 0)
        if not rowvar:
            y = y.T
        from aesara_tpu.tensor.basic import join

        m = join(0, m, y)
    ddof_ = (1 if not bias else 0) if ddof is None else ddof
    n = m.shape[1]
    mean_ = mean(m, axis=1, keepdims=True)
    centered = m - mean_
    return dot(centered, centered.T) / cast(n - ddof_, centered.dtype)


erfcx = _ew(aes.math.erfcx, "erfcx")
owens_t = _ew(aes.math.owens_t, "owens_t")
hyp2f1_der = _ew(aes.math.hyp2f1_der, "hyp2f1_der")
