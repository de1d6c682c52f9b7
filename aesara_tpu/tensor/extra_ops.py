"""Extra array ops (reference ``aesara/tensor/extra_ops.py``: CumOp:283,
Repeat:637, Unique:1152, SearchsortedOp:102, UnravelIndex:1283,
RavelMultiIndex:1362, FillDiagonal:879, BroadcastTo:1630, Bartlett:822,
CpuContiguous:40)."""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.scalar.ops import _np_dtype, discrete_dtypes
from aesara_tpu.tensor.basic import as_tensor_variable, cast, constant
from aesara_tpu.tensor.type import TensorType


__all__ = [
    "CumOp", "cumsum", "cumprod", "Repeat", "repeat", "Unique", "unique",
    "SearchsortedOp", "searchsorted", "UnravelIndex", "unravel_index",
    "RavelMultiIndex", "ravel_multi_index", "FillDiagonal", "fill_diagonal",
    "FillDiagonalOffset", "fill_diagonal_offset", "BroadcastTo", "broadcast_to",
    "Bartlett", "bartlett", "CpuContiguous", "cpu_contiguous",
    "squeeze", "diff", "bincount", "compress", "to_one_hot", "broadcast_arrays",
]


class CumOp(Op):
    """cumsum/cumprod (reference ``extra_ops.py:283``)."""

    __props__ = ("axis", "mode")

    def __init__(self, axis: Optional[int] = None, mode: str = "add"):
        if mode not in ("add", "mul"):
            raise ValueError("mode must be add or mul")
        self.axis = axis if axis is None else int(axis)
        self.mode = mode

    def make_node(self, x):
        x = as_tensor_variable(x)
        # strict bounds: a 0-d input admits NO explicit axis (reference
        # raises for axis >= ndim; numpy's (1,) result would contradict
        # the 0-d output type — review finding)
        if self.axis is not None and not (
            -x.type.ndim <= self.axis < x.type.ndim
        ):
            raise ValueError(
                f"cum{self.mode}: axis {self.axis} out of range for "
                f"{x.type.ndim}-d input"
            )
        if self.axis is None:
            total = 1
            known = all(s is not None for s in x.type.shape)
            shape = (int(np.prod(x.type.shape)) if known and x.type.ndim else None,)
            if x.type.ndim == 0:
                shape = (1,)
            out_t = TensorType(x.type.dtype, shape)
        else:
            out_t = x.type
        return Apply(self, [x], [out_t()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        fn = np.cumsum if self.mode == "add" else np.cumprod
        output_storage[0][0] = fn(x, axis=self.axis).astype(x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        (xs,) = input_shapes
        if self.axis is None:
            from aesara_tpu.tensor.math import prod as tprod

            if len(xs) == 0:
                return [(constant(1, dtype="int64"),)]
            total = xs[0]
            for s in xs[1:]:
                total = total * s
            return [(total,)]
        return [xs]

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        if self.mode == "add":
            axis = self.axis
            if axis is None:
                from aesara_tpu.tensor.shape import reshape, shape as tshape

                flat_g = cumsum(gz[::-1])[::-1]
                return [reshape(flat_g, tshape(x), ndim=x.type.ndim)]
            rev = [slice(None)] * x.type.ndim
            rev[axis] = slice(None, None, -1)
            rev = tuple(rev)
            return [cumsum(gz[rev], axis=axis)[rev]]
        # cumprod gradient (reference CumOp.grad "mul" branch):
        # dx = flip(cumsum(flip(gz * cumprod(x)))) / x — valid for x != 0
        # (the zero-input case is undefined in the reference too)
        axis = self.axis
        prod_out = cumprod(x, axis=axis)
        if axis is None:
            from aesara_tpu.tensor.shape import reshape, shape as tshape

            flat = (gz.reshape((-1,)) * prod_out)
            g = cumsum(flat[::-1])[::-1] / x.reshape((-1,))
            return [reshape(g, tshape(x), ndim=x.type.ndim)]
        rev = [slice(None)] * x.type.ndim
        rev[axis] = slice(None, None, -1)
        rev = tuple(rev)
        g = cumsum((gz * prod_out)[rev], axis=axis)[rev] / x
        return [g]

    def __str__(self):
        name = "CumSum" if self.mode == "add" else "CumProd"
        return f"{name}{{axis={self.axis}}}"


class CumsumOp(Op):
    """Back-compat constructor (reference ``CumsumOp``): instantiating it
    yields a ``CumOp(mode="add")``, so old pickles and isinstance checks
    keep working."""

    def __new__(cls, axis=None):
        return CumOp(axis, "add")


class CumprodOp(Op):
    """Back-compat constructor (reference ``CumprodOp``) → ``CumOp(mode="mul")``."""

    def __new__(cls, axis=None):
        return CumOp(axis, "mul")


def cumsum(x, axis=None):
    return CumOp(axis, "add")(x)


def cumprod(x, axis=None):
    return CumOp(axis, "mul")(x)


class Repeat(Op):
    """numpy.repeat (reference ``extra_ops.py:637``)."""

    __props__ = ("axis",)

    def __init__(self, axis: Optional[int] = None):
        self.axis = axis if axis is None else int(axis)

    def make_node(self, x, repeats):
        from aesara_tpu.graph.ir import Constant

        x = as_tensor_variable(x)
        # scalar-constant repeats: the output extent is statically known
        # (n·k) — keep it static so XLA keeps its tiling.  Inspect the
        # value BEFORE the int64 cast wraps it in an Elemwise.
        pre = as_tensor_variable(repeats)
        k = None
        if isinstance(pre, Constant) and pre.type.ndim == 0:
            k = int(pre.data)
        repeats = cast(pre, "int64")
        if self.axis is None:
            n = x.type.shape[0] if x.type.ndim == 1 else None
            shape = (n * k if (k is not None and n is not None) else None,)
        else:
            shape = list(x.type.shape)
            n = shape[self.axis]
            shape[self.axis] = (
                n * k if (k is not None and n is not None) else None
            )
        return Apply(self, [x, repeats], [TensorType(x.type.dtype, tuple(shape))()])

    def perform(self, node, inputs, output_storage):
        x, repeats = inputs
        output_storage[0][0] = np.repeat(x, repeats, axis=self.axis)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType, grad_not_implemented

        x, repeats = inputs
        (gz,) = output_grads
        from aesara_tpu.tensor.shape import reshape, shape as tshape
        from aesara_tpu.tensor.math import sum as tsum

        # scalar repeats: reshape gz to (..., n, r, ...) and sum over r
        if repeats.type.ndim == 0:
            if self.axis is None:
                from aesara_tpu.gradient import grad_not_implemented as gni

                return [gni(self, 0, x, "repeat grad with axis=None"),
                        DisconnectedType()()]
            ax = self.axis
            new_shape = [tshape(x)[d] for d in range(x.type.ndim)]
            new_shape.insert(ax + 1, repeats)
            g = reshape(gz, new_shape, ndim=x.type.ndim + 1)
            return [tsum(g, axis=ax + 1), DisconnectedType()()]
        return [grad_not_implemented(self, 0, x, "repeat grad with vector repeats"),
                DisconnectedType()()]


def repeat(x, repeats, axis=None):
    x = as_tensor_variable(x)
    if axis is None and x.type.ndim != 1:
        x = x.flatten()
    return Repeat(axis if axis is None else int(axis) % max(x.type.ndim, 1))(x, repeats)


class Unique(Op):
    """numpy.unique — data-dependent output shape: py-mode only under XLA
    (reference ``extra_ops.py:1152``)."""

    __props__ = ("return_index", "return_inverse", "return_counts", "axis")

    def __init__(self, return_index=False, return_inverse=False,
                 return_counts=False, axis=None):
        self.return_index = bool(return_index)
        self.return_inverse = bool(return_inverse)
        self.return_counts = bool(return_counts)
        self.axis = axis if axis is None else int(axis)

    def make_node(self, x):
        x = as_tensor_variable(x)
        if self.axis is None:
            out_ndim = 1
        else:
            out_ndim = x.type.ndim
        outs = [TensorType(x.type.dtype, (None,) * out_ndim)()]
        if self.return_index:
            outs.append(TensorType("int64", (None,))())
        if self.return_inverse:
            outs.append(TensorType("int64", (None,))())
        if self.return_counts:
            outs.append(TensorType("int64", (None,))())
        return Apply(self, [x], outs)

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        res = np.unique(
            x, return_index=self.return_index,
            return_inverse=self.return_inverse,
            return_counts=self.return_counts, axis=self.axis,
        )
        if not isinstance(res, tuple):
            res = (res,)
        for storage, r in zip(output_storage, res):
            storage[0] = np.asarray(r)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0])]


def unique(x, return_index=False, return_inverse=False, return_counts=False, axis=None):
    res = Unique(return_index, return_inverse, return_counts, axis)(x)
    return res


class SearchsortedOp(Op):
    """(reference ``extra_ops.py:102``)"""

    __props__ = ("side",)

    def __init__(self, side="left"):
        if side not in ("left", "right"):
            raise ValueError("side must be left/right")
        self.side = side

    def make_node(self, x, v, sorter=None):
        x = as_tensor_variable(x)
        v = as_tensor_variable(v)
        inputs = [x, v]
        if sorter is not None:
            inputs.append(cast(as_tensor_variable(sorter), "int64"))
        return Apply(self, inputs, [TensorType("int64", v.type.shape)()])

    def perform(self, node, inputs, output_storage):
        x, v, *rest = inputs
        sorter = rest[0] if rest else None
        output_storage[0][0] = np.searchsorted(
            x, v, side=self.side, sorter=sorter
        ).astype(np.int64)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[1]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, i, inp) for i, inp in enumerate(inputs)]


def searchsorted(x, v, side="left", sorter=None):
    return SearchsortedOp(side)(x, v, sorter)


class UnravelIndex(Op):
    """(reference ``extra_ops.py:1283``)"""

    __props__ = ("order",)

    def __init__(self, order="C"):
        self.order = order

    def make_node(self, indices, dims):
        indices = cast(as_tensor_variable(indices), "int64")
        dims = cast(as_tensor_variable(dims), "int64")
        from aesara_tpu.tensor.basic import get_vector_length

        n = get_vector_length(dims)
        return Apply(
            self, [indices, dims],
            [TensorType("int64", indices.type.shape)() for _ in range(n)],
        )

    def perform(self, node, inputs, output_storage):
        indices, dims = inputs
        res = np.unravel_index(indices, tuple(dims), order=self.order)
        for storage, r in zip(output_storage, res):
            storage[0] = np.asarray(r, dtype=np.int64)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, i, inp) for i, inp in enumerate(inputs)]


def unravel_index(indices, dims, order="C"):
    res = UnravelIndex(order)(indices, dims)
    return res if isinstance(res, (list, tuple)) else (res,)


class RavelMultiIndex(Op):
    """(reference ``extra_ops.py:1362``)"""

    __props__ = ("mode", "order")

    def __init__(self, mode="raise", order="C"):
        self.mode = mode
        self.order = order

    def make_node(self, *inp):
        *multi_index, dims = [cast(as_tensor_variable(i), "int64") for i in inp]
        return Apply(
            self, list(multi_index) + [dims],
            [TensorType("int64", multi_index[0].type.shape)()],
        )

    def perform(self, node, inputs, output_storage):
        *multi_index, dims = inputs
        output_storage[0][0] = np.ravel_multi_index(
            tuple(multi_index), tuple(dims), mode=self.mode, order=self.order
        ).astype(np.int64)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, i, inp) for i, inp in enumerate(inputs)]


def ravel_multi_index(multi_index, dims, mode="raise", order="C"):
    return RavelMultiIndex(mode, order)(*multi_index, dims)


class FillDiagonal(Op):
    """(reference ``extra_ops.py:879``)"""

    __props__ = ()

    def make_node(self, a, val):
        a = as_tensor_variable(a)
        val = cast(as_tensor_variable(val), a.type.dtype)
        return Apply(self, [a, val], [a.type()])

    def perform(self, node, inputs, output_storage):
        a, val = inputs
        out = a.copy()
        np.fill_diagonal(out, val)
        output_storage[0][0] = out

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def grad(self, inputs, output_grads):
        a, val = inputs
        (gz,) = output_grads
        from aesara_tpu.tensor.basic import diagonal, zeros
        from aesara_tpu.tensor.math import sum as tsum

        ga = fill_diagonal(gz, 0.0)
        if val.type.ndim == 0:
            gval = tsum(diagonal(gz))
            gval = cast(gval, val.type.dtype)
        else:
            gval = diagonal(gz)
        return [ga, gval]


_fill_diagonal = FillDiagonal()


def fill_diagonal(a, val):
    return _fill_diagonal(a, val)


class FillDiagonalOffset(Op):
    """(reference ``extra_ops.py`` fill_diagonal_offset)"""

    __props__ = ("offset",)

    def __init__(self, offset=0):
        self.offset = int(offset)

    def make_node(self, a, val):
        a = as_tensor_variable(a)
        val = as_tensor_variable(val)
        if val.type.dtype != a.type.dtype:
            val = cast(val, a.type.dtype)
        return Apply(self, [a, val], [a.type()])

    def perform(self, node, inputs, output_storage):
        a, val = inputs
        out = a.copy()
        k = self.offset
        n = min(out.shape[0], out.shape[1] - k) if k >= 0 else min(
            out.shape[0] + k, out.shape[1]
        )
        idx = np.arange(max(n, 0))
        if k >= 0:
            out[idx, idx + k] = val
        else:
            out[idx - k, idx] = val
        output_storage[0][0] = out

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.tensor.basic import diagonal

        a, val = inputs
        (gz,) = output_grads
        ga = FillDiagonalOffset(self.offset)(gz, constant(0, dtype=gz.type.dtype))
        gval = diagonal(gz, offset=self.offset)
        if val.type.ndim == 0:
            from aesara_tpu.tensor.math import sum as tsum

            gval = cast(tsum(gval), val.type.dtype)
        return [ga, gval]


def fill_diagonal_offset(a, val, offset=0):
    return FillDiagonalOffset(offset)(a, val)


class BroadcastTo(Op):
    """(reference ``extra_ops.py:1630``)"""

    __props__ = ()
    view_map = {0: [0]}

    def make_node(self, x, *shape):
        from aesara_tpu.tensor.basic import _normalize_shape_args

        x = as_tensor_variable(x)
        shape_vars, static = _normalize_shape_args(shape)
        return Apply(self, [x] + shape_vars, [TensorType(x.type.dtype, static)()])

    def perform(self, node, inputs, output_storage):
        x, *shape = inputs
        output_storage[0][0] = np.broadcast_to(x, tuple(int(s) for s in shape))

    def infer_shape(self, fgraph, node, input_shapes):
        return [tuple(node.inputs[1:])]

    def connection_pattern(self, node):
        return [[True]] + [[False]] * (len(node.inputs) - 1)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.math import sum as tsum
        from aesara_tpu.tensor.shape import specify_shape

        x, *shape = inputs
        (gz,) = output_grads
        n_extra = gz.type.ndim - x.type.ndim
        g = tsum(gz, axis=list(range(n_extra))) if n_extra else gz
        to_sum = [d for d in range(x.type.ndim) if x.type.shape[d] == 1]
        if to_sum:
            g = tsum(g, axis=to_sum, keepdims=True)
        if g.type.shape != x.type.shape:
            g = specify_shape(g, x.type.shape)
        return [g] + [DisconnectedType()() for _ in shape]


def broadcast_to(x, shape):
    if not isinstance(shape, (list, tuple)):
        shape = (shape,)
    return BroadcastTo()(x, *shape)


def broadcast_arrays(*args):
    # broadcast each arg against all others via second/fill
    from aesara_tpu.tensor.basic import fill

    args = [as_tensor_variable(a) for a in args]
    out = []
    for a in args:
        t = a
        for b in args:
            if b is not a:
                t = fill(b, t)
        out.append(t)
    return out


class Bartlett(Op):
    """(reference ``extra_ops.py:822``)"""

    __props__ = ()

    def make_node(self, m):
        m = cast(as_tensor_variable(m), "int64")
        return Apply(self, [m], [TensorType("float64", (None,))()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.bartlett(int(inputs[0])).astype(np.float64)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0])]


bartlett = Bartlett()


class CpuContiguous(Op):
    """Force contiguity (reference ``extra_ops.py:40``) — identity on XLA
    (buffers are always dense)."""

    __props__ = ()
    view_map = {}

    def make_node(self, x):
        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.ascontiguousarray(inputs[0])

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        return [output_grads[0]]


cpu_contiguous = CpuContiguous()


# --- graph-level conveniences ----------------------------------------------------

def squeeze(x, axis=None):
    x = as_tensor_variable(x)
    if axis is None:
        axes = [d for d in range(x.type.ndim) if x.type.shape[d] == 1]
    elif isinstance(axis, (int, np.integer)):
        axes = [int(axis) % x.type.ndim]
    else:
        axes = [int(a) % x.type.ndim for a in axis]
    # explicit axes assert the dim is 1 at runtime (numpy semantics) even
    # when the static shape doesn't know it yet
    if any(x.type.shape[a] is None for a in axes):
        from aesara_tpu.tensor.shape import specify_shape

        spec = [1 if d in axes else None for d in range(x.type.ndim)]
        x = specify_shape(x, spec)
    from aesara_tpu.tensor.elemwise import DimShuffle

    keep = [d for d in range(x.type.ndim) if d not in axes]
    return DimShuffle(x.type.ndim, tuple(keep))(x)


def diff(x, n: int = 1, axis: int = -1):
    x = as_tensor_variable(x)
    for _ in range(n):
        ax = axis % x.type.ndim
        sl1 = [slice(None)] * x.type.ndim
        sl2 = [slice(None)] * x.type.ndim
        sl1[ax] = slice(1, None)
        sl2[ax] = slice(None, -1)
        x = x[tuple(sl1)] - x[tuple(sl2)]
    return x


def bincount(x, weights=None, minlength=None):
    """Via inc_subtensor scatter-add (XLA-friendly when minlength given)."""
    from aesara_tpu.tensor.basic import zeros
    from aesara_tpu.tensor.math import max as tmax
    from aesara_tpu.tensor.subtensor import AdvancedIncSubtensor1

    x = cast(as_tensor_variable(x), "int64")
    if minlength is not None and isinstance(minlength, (int, np.integer)):
        # static-shape contract for XLA: minlength is the exact output
        # length, GUARDED so values >= minlength raise loudly instead of
        # silently miscounting (numpy would grow the array — omit
        # minlength for that dynamic-shape behavior on the py path;
        # review finding: the old code scatter-crashed or miscounted)
        from aesara_tpu.raise_op import Assert
        from aesara_tpu.tensor.math import lt as tlt, all as tall

        guard = Assert(
            "bincount: a value >= minlength was seen; with a static "
            "minlength the output cannot grow — drop minlength (py "
            "path) or raise it"
        )
        x = guard(x, tall(tlt(tmax(x), int(minlength))))
        length = int(minlength)
    else:
        # numpy grow semantics: max(max(x)+1, minlength) — dynamic
        # output length (py path, like Unique)
        length = cast(tmax(x) + 1, "int64")
        if minlength is not None:
            from aesara_tpu.tensor.math import maximum as tmaximum

            length = tmaximum(
                length, cast(as_tensor_variable(minlength), "int64")
            )
    # negative values would WRAP through the scatter (numpy raises);
    # guard like numpy does
    from aesara_tpu.raise_op import Assert as _Assert
    from aesara_tpu.tensor.math import all as _tall, ge as _tge

    x = _Assert("bincount: negative values not allowed")(
        x, _tall(_tge(x, 0)))
    if weights is None:
        out = zeros((length,), dtype="int64")
        from aesara_tpu.tensor.basic import ones_like

        return AdvancedIncSubtensor1()(out, ones_like(x, dtype="int64"), x)
    out = zeros((length,), dtype=as_tensor_variable(weights).type.dtype)
    return AdvancedIncSubtensor1()(out, weights, x)


def compress(condition, x, axis=None):
    """Boolean selection — dynamic shape, py-mode only."""
    from aesara_tpu.tensor.basic import flatnonzero

    x = as_tensor_variable(x)
    idx = flatnonzero(as_tensor_variable(condition))
    if axis is None:
        return x.flatten()[idx]
    from aesara_tpu.tensor.subtensor import take

    return take(x, idx, axis=axis)


def to_one_hot(y, nb_class, dtype=None):
    from aesara_tpu.tensor.basic import arange, expand_dims
    from aesara_tpu.tensor.math import eq as teq

    y = cast(as_tensor_variable(y), "int64")
    res = teq(expand_dims(y, -1), arange(nb_class))
    return cast(res, dtype or "float32")


def linspace(start, stop, num=50, endpoint=True, dtype=None):
    """np.linspace composition (reference ``extra_ops.linspace``)."""
    from aesara_tpu.tensor.basic import arange, as_tensor_variable, cast

    start = as_tensor_variable(start)
    stop = as_tensor_variable(stop)
    div = (num - 1) if endpoint else num
    step = (stop - start) / div
    res = start + arange(0, num) * step
    return cast(res, dtype) if dtype else res


def logspace(start, stop, num=50, base=10.0, endpoint=True, dtype=None):
    from aesara_tpu.tensor.math import pow as t_pow

    return t_pow(base, linspace(start, stop, num, endpoint, dtype))


def geomspace(start, stop, num=50, endpoint=True, dtype=None):
    from aesara_tpu.tensor.math import exp, log

    return exp(linspace(log(start), log(stop), num, endpoint, dtype))


def broadcast_shape(*arrays, arrays_are_shapes: bool = False):
    """The broadcast result shape of the arguments (reference
    ``broadcast_shape``)."""
    from aesara_tpu.tensor.basic import as_tensor_variable
    from aesara_tpu.tensor.math import maximum

    if arrays_are_shapes:
        shapes = [tuple(a) for a in arrays]
    else:
        shapes = [tuple(as_tensor_variable(a).shape[i]
                        for i in range(as_tensor_variable(a).type.ndim))
                  for a in arrays]
    nd = max((len(s) for s in shapes), default=0)
    out = []
    for d in range(nd):
        dims = [s[len(s) - nd + d] for s in shapes if len(s) - nd + d >= 0]
        r = dims[0]
        for e in dims[1:]:
            r = maximum(r, e)
        out.append(r)
    return tuple(out)


__all__ += ["linspace", "logspace", "geomspace", "broadcast_shape", "CumsumOp", "CumprodOp"]
