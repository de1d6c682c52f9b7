"""Tensor construction and structural ops.

Re-design of the reference's ``aesara/tensor/basic.py`` (TensorFromScalar
:539, Alloc:1389, MakeVector:1629, Join:2142, Split:1882, Eye:1257,
Tri:982, ARange:2867, ExtractDiag:3327, AllocDiag:3487,
PermuteRowElements:3111, Nonzero:839, Choose:3773).  gen-C implementations
are replaced by XLA lowerings in ``aesara_tpu.link.jax.dispatch.tensor``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from aesara_tpu import scalar as aes
from aesara_tpu.config import config
from aesara_tpu.graph.ir import Apply, Constant, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.scalar.ops import ScalarConstant, ScalarType, ScalarVariable, _np_dtype, discrete_dtypes, upcast
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.type import TensorType
from aesara_tpu.tensor.var import TensorConstant, TensorVariable


__all__ = [
    "as_tensor_variable", "as_tensor", "constant", "cast",
    "TensorFromScalar", "ScalarFromTensor", "tensor_from_scalar", "scalar_from_tensor",
    "Alloc", "AllocEmpty", "alloc", "empty", "fill", "full", "full_like",
    "zeros", "ones", "zeros_like", "ones_like",
    "MakeVector", "make_vector", "as_tensor_or_list",
    "Join", "join", "concatenate", "stack", "horizontal_stack", "vertical_stack",
    "Split", "split",
    "Eye", "eye", "identity_like", "Tri", "tri", "tril", "triu",
    "ARange", "arange",
    "ExtractDiag", "diagonal", "AllocDiag", "diag",
    "transpose", "flatten", "tensor_copy", "switch", "where",
    "get_scalar_constant_value", "get_vector_length", "extract_constant",
    "Nonzero", "nonzero", "nonzero_values", "flatnonzero",
    "PermuteRowElements", "permute_row_elements", "inverse_permutation",
    "Choose", "choose", "swapaxes", "moveaxis", "expand_dims", "atleast_1d",
    "atleast_2d", "atleast_Nd", "NotScalarConstantError",
]


class NotScalarConstantError(Exception):
    """get_scalar_constant_value failed (reference ``exceptions.py``)."""


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

def as_tensor_variable(x, name=None, ndim=None) -> TensorVariable:
    """Coerce ``x`` into a TensorVariable (reference ``basic.py:63``)."""
    if isinstance(x, Variable):
        if isinstance(x.type, TensorType):
            if ndim is not None and x.type.ndim != ndim:
                if x.type.ndim < ndim:
                    pad = ("x",) * (ndim - x.type.ndim) + tuple(range(x.type.ndim))
                    x = DimShuffle(x.type.ndim, pad)(x)
                else:
                    raise ValueError(f"cannot reduce ndim of {x} to {ndim}")
            return x
        if isinstance(x.type, ScalarType):
            return tensor_from_scalar(x)
        from aesara_tpu.tensor.shape import Shape

        raise TypeError(f"cannot convert {x} of type {x.type} to a TensorVariable")
    if isinstance(x, (list, tuple)) and any(isinstance(e, Variable) for e in x):
        return stack(list(x))
    if isinstance(x, (np.ndarray, np.generic, int, float, bool, complex, list, tuple)):
        return constant(x, name=name, ndim=ndim)
    if isinstance(x, np.bool_):
        return constant(bool(x), name=name)
    raise TypeError(f"cannot convert {x!r} to a TensorVariable")


as_tensor = as_tensor_variable


_constant_cache: dict = {}


def constant(x, name=None, ndim=None, dtype=None) -> TensorConstant:
    """Make a TensorConstant (reference ``basic.py`` constant).

    Bare python ints/floats get minimal dtypes (int8…int64 / floatX) so
    literals don't upcast expressions.
    """
    if isinstance(x, TensorConstant):
        if (
            (name is None or x.name == name)
            and (ndim is None or x.type.ndim == ndim)
            and (dtype is None or x.type.dtype == dtype)
        ):
            return x
        x = x.data
    if dtype is None and not isinstance(x, (np.ndarray, np.generic)):
        if isinstance(x, bool):
            dtype = "bool"
        elif isinstance(x, int):
            dtype = ("int8" if -128 <= x < 128 else
                     "int16" if -(2**15) <= x < 2**15 else
                     "int32" if -(2**31) <= x < 2**31 else "int64")
        elif isinstance(x, float):
            dtype = config.floatX
    arr = np.asarray(x, dtype=_np_dtype(dtype) if isinstance(dtype, str) else dtype)
    if ndim is not None:
        if arr.ndim > ndim:
            extra = arr.ndim - ndim
            if arr.shape[:extra] != (1,) * extra:
                raise ValueError(f"cannot reduce constant to ndim {ndim}")
            arr = arr.reshape(arr.shape[extra:])
        while arr.ndim < ndim:
            arr = arr[None]
    ttype = TensorType(str(arr.dtype) if arr.dtype.name != "bool" else "bool", arr.shape)
    return TensorConstant(ttype, arr, name=name)


def cast(x, dtype: str):
    """Symbolic dtype conversion (Elemwise over scalar Cast)."""
    if dtype == "floatX":
        dtype = config.floatX
    x = as_tensor_variable(x)
    if x.type.dtype == dtype:
        return x
    if x.type.dtype.startswith("complex") and not str(dtype).startswith("complex"):
        raise TypeError("cannot cast complex to real; use real()/imag()")
    return Elemwise(aes.ops.Cast(ScalarType(dtype)))(x)


# ---------------------------------------------------------------------------
# scalar <-> 0d tensor bridges
# ---------------------------------------------------------------------------

class TensorFromScalar(Op):
    """ScalarType value → 0-d tensor (reference ``basic.py:539``)."""

    __props__ = ()

    def make_node(self, s):
        if not isinstance(s.type, ScalarType):
            raise TypeError("input must be a scalar-typed variable")
        return Apply(self, [s], [TensorType(s.type.dtype, ())()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(inputs[0])

    def infer_shape(self, fgraph, node, input_shapes):
        return [()]

    def grad(self, inputs, output_grads):
        (s,) = inputs
        (gz,) = output_grads
        if s.type.dtype in discrete_dtypes:
            from aesara_tpu.gradient import grad_undefined

            return [grad_undefined(self, 0, s)]
        return [scalar_from_tensor(gz)]


class ScalarFromTensor(Op):
    """0-d tensor → ScalarType value."""

    __props__ = ()
    view_map = {0: [0]}

    def make_node(self, t):
        t = as_tensor_variable(t)
        if t.type.ndim != 0:
            raise TypeError("input must be a 0-d tensor")
        return Apply(self, [t], [ScalarType(t.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(inputs[0])[()]

    def infer_shape(self, fgraph, node, input_shapes):
        return [()]

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [tensor_from_scalar(gz)]


tensor_from_scalar = TensorFromScalar()
scalar_from_tensor = ScalarFromTensor()


# ---------------------------------------------------------------------------
# fill / alloc
# ---------------------------------------------------------------------------

fill = Elemwise(aes.ops.second, name="fill")
"""fill(template, value): value broadcast to template's shape."""


def ones_like(x, dtype=None):
    x = as_tensor_variable(x)
    res = fill(x, constant(1, dtype=dtype or x.type.dtype))
    return res


def zeros_like(x, dtype=None):
    x = as_tensor_variable(x)
    return fill(x, constant(0, dtype=dtype or x.type.dtype))


# attach zeros_like/ones_like to Variable for generic graph code
TensorVariable.zeros_like = lambda self, dtype=None: zeros_like(self, dtype)
TensorVariable.ones_like = lambda self, dtype=None: ones_like(self, dtype)
ScalarVariable.zeros_like = lambda self, dtype=None: aes.ops.second(
    self, aes.ops.constant(0, dtype=dtype or self.type.dtype)
)


class Alloc(Op):
    """Broadcast a value to a runtime shape (reference ``basic.py:1389``)."""

    __props__ = ()

    def make_node(self, value, *shape):
        value = as_tensor_variable(value)
        shape_vars, static_shape = _normalize_shape_args(shape)
        if value.type.ndim > len(static_shape):
            raise TypeError(
                f"Alloc value ndim {value.type.ndim} exceeds target "
                f"ndim {len(static_shape)}"
            )
        # value dims must broadcast into the target
        vshape = value.type.shape
        offset = len(static_shape) - len(vshape)
        for d, s in enumerate(vshape):
            t = static_shape[offset + d]
            if s is not None and s != 1 and t is not None and s != t:
                raise TypeError(f"Alloc cannot broadcast dim {d} ({s} → {t})")
        otype = TensorType(value.type.dtype, static_shape)
        return Apply(self, [value] + shape_vars, [otype()])

    def perform(self, node, inputs, output_storage):
        value, *shape = inputs
        target = tuple(int(s) for s in shape)
        # static-only broadcasting (the Elemwise contract): a runtime-1
        # dim whose STATIC size is unknown must not silently broadcast —
        # the gradient only sums over static-1 dims (review finding)
        vstatic = node.inputs[0].type.shape
        off = len(target) - np.ndim(value)
        for d in range(np.ndim(value)):
            vs = np.shape(value)[d]
            if vs != target[off + d] and not (vs == 1 and vstatic[d] == 1):
                raise ValueError(
                    f"Alloc: value dim {d} (size {vs}) cannot broadcast to "
                    f"{target[off + d]}: declare the dim statically 1 "
                    f"(static-only broadcasting)"
                )
        output_storage[0][0] = np.broadcast_to(value, target).copy()

    def infer_shape(self, fgraph, node, input_shapes):
        return [tuple(node.inputs[1:])]

    def connection_pattern(self, node):
        return [[True]] + [[False]] * (len(node.inputs) - 1)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.math import sum as tsum

        value, *shape = inputs
        (gz,) = output_grads
        grads = [DisconnectedType()() for _ in shape]
        if value.type.dtype in discrete_dtypes:
            from aesara_tpu.gradient import grad_undefined

            return [grad_undefined(self, 0, value)] + grads
        n_extra = gz.type.ndim - value.type.ndim
        gv = tsum(gz, axis=list(range(n_extra))) if n_extra else gz
        # sum over dims where value was broadcast
        to_sum = [
            d for d in range(value.type.ndim) if value.type.shape[d] == 1
        ]
        if to_sum:
            gv = tsum(gv, axis=to_sum, keepdims=True)
        from aesara_tpu.tensor.shape import specify_shape

        if gv.type.shape != value.type.shape:
            gv = specify_shape(gv, value.type.shape)
        return [gv] + grads


    def R_op(self, inputs, eval_points):
        if eval_points[0] is None:
            return [None]
        return [self.make_node(eval_points[0], *inputs[1:]).outputs[0]]
    def do_constant_folding(self, fgraph, node):
        # folding Allocs materializes big arrays; only fold when consumed
        # by ops that need the value (reference heuristic)
        clients = fgraph.clients.get(node.outputs[0], [])
        return len(clients) <= 1


alloc = Alloc()


class AllocEmpty(Op):
    """Uninitialized output buffer of a given shape (ref ``basic.py:3833``).
    On the XLA path this becomes zeros (XLA has no uninitialized values)."""

    __props__ = ("dtype",)

    def __init__(self, dtype: str):
        self.dtype = dtype if dtype != "floatX" else config.floatX

    def make_node(self, *shape):
        shape_vars, static_shape = _normalize_shape_args(shape)
        return Apply(self, shape_vars, [TensorType(self.dtype, static_shape)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.empty(
            tuple(int(s) for s in inputs), dtype=_np_dtype(self.dtype)
        )

    def infer_shape(self, fgraph, node, input_shapes):
        return [tuple(node.inputs)]

    def connection_pattern(self, node):
        return [[False]] * len(node.inputs)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        return [DisconnectedType()() for _ in inputs]

    def do_constant_folding(self, fgraph, node):
        return False


def empty(shape, dtype=None):
    if not isinstance(shape, (list, tuple)):
        shape = (shape,)
    return AllocEmpty(dtype or config.floatX)(*shape)


def _normalize_shape_args(shape):
    """Coerce shape args to int64 0-d tensors; extract static values."""
    if len(shape) == 1 and isinstance(shape[0], (list, tuple)):
        shape = tuple(shape[0])
    if len(shape) == 1 and isinstance(shape[0], Variable) and shape[0].type.ndim == 1:
        # vector shape argument: unpack if length is known
        vec = shape[0]
        n = vec.type.shape[0]
        if n is None:
            try:
                n = get_vector_length(vec)
            except ValueError:
                raise TypeError("shape vector must have a known static length")
        shape = tuple(vec[i] for i in range(n))
    shape_vars = []
    static_shape = []
    for s in shape:
        if isinstance(s, (int, np.integer)):
            static_shape.append(int(s))
            shape_vars.append(constant(int(s), dtype="int64"))
            continue
        s = as_tensor_variable(s)
        if s.type.ndim != 0 or s.type.dtype not in discrete_dtypes:
            raise TypeError(f"shape entries must be integer scalars, got {s.type}")
        try:
            static_shape.append(int(get_scalar_constant_value(s)))
        except NotScalarConstantError:
            static_shape.append(None)
        shape_vars.append(cast(s, "int64"))
    return shape_vars, tuple(static_shape)


def full(shape, fill_value, dtype=None):
    fill_value = as_tensor_variable(fill_value)
    if dtype:
        fill_value = cast(fill_value, dtype)
    if not isinstance(shape, (list, tuple)):
        shape = (shape,)
    return alloc(fill_value, *shape)


def full_like(a, fill_value, dtype=None):
    res = fill(as_tensor_variable(a), as_tensor_variable(fill_value))
    if dtype:
        res = cast(res, dtype)
    return res


def zeros(shape, dtype=None):
    return full(shape, constant(0, dtype=dtype or config.floatX))


def ones(shape, dtype=None):
    return full(shape, constant(1, dtype=dtype or config.floatX))


# ---------------------------------------------------------------------------
# MakeVector / Join / Split / stack
# ---------------------------------------------------------------------------

class MakeVector(Op):
    """Pack N scalars into a length-N vector (reference ``basic.py:1629``)."""

    __props__ = ("dtype",)

    def __init__(self, dtype: str = "int64"):
        self.dtype = dtype

    def make_node(self, *inputs):
        inputs = [as_tensor_variable(i) for i in inputs]
        for i in inputs:
            if i.type.ndim != 0:
                raise TypeError("MakeVector inputs must be scalars")
            if i.type.dtype != self.dtype and not np.can_cast(
                _np_dtype(i.type.dtype), _np_dtype(self.dtype)
            ):
                raise TypeError(
                    f"MakeVector({self.dtype}) got {i.type.dtype}"
                )
        inputs = [cast(i, self.dtype) for i in inputs]
        return Apply(self, inputs, [TensorType(self.dtype, (len(inputs),))()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(inputs, dtype=_np_dtype(self.dtype))

    def infer_shape(self, fgraph, node, input_shapes):
        return [(len(node.inputs),)]

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        grads = []
        for i, inp in enumerate(inputs):
            if inp.type.dtype in discrete_dtypes:
                from aesara_tpu.gradient import grad_undefined

                grads.append(grad_undefined(self, i, inp))
            else:
                grads.append(cast(gz[i], inp.type.dtype))
        return grads


make_vector = MakeVector()


def as_tensor_or_list(x):
    return x


class Join(Op):
    """Concatenate along an axis (reference ``basic.py:2142``)."""

    __props__ = ()

    def make_node(self, axis, *tensors):
        if not tensors:
            raise ValueError("Join needs at least one tensor")
        tensors = [as_tensor_variable(t) for t in tensors]
        ndim = tensors[0].type.ndim
        for t in tensors:
            if t.type.ndim != ndim:
                raise TypeError("all Join inputs must have the same ndim")
        out_dtype = upcast(*[t.type.dtype for t in tensors])
        tensors = [cast(t, out_dtype) for t in tensors]
        try:
            static_axis = int(get_scalar_constant_value(as_tensor_variable(axis)))
        except NotScalarConstantError:
            static_axis = None
        if static_axis is not None:
            if not (-ndim <= static_axis < max(ndim, 1)):
                raise ValueError(
                    f"Join axis {static_axis} out of range for ndim {ndim}"
                )
            if static_axis < 0:
                static_axis += ndim
        out_shape = []
        if static_axis is None:
            # ANY dim may be the concatenated one — no static size can
            # be claimed (review finding: keeping per-dim sizes typed
            # the output smaller than the runtime result)
            out_shape = [None] * ndim
        else:
            for d in range(ndim):
                if d == static_axis:
                    sizes = [t.type.shape[d] for t in tensors]
                    out_shape.append(
                        sum(sizes) if all(s is not None for s in sizes) else None
                    )
                else:
                    dims = {t.type.shape[d] for t in tensors if t.type.shape[d] is not None}
                    if len(dims) > 1:
                        raise TypeError(
                            f"Join inputs disagree on dim {d}: {dims}"
                        )
                    out_shape.append(next(iter(dims)) if len(dims) == 1 else None)
        axis_var = cast(as_tensor_variable(axis), "int64")
        return Apply(
            self, [axis_var] + tensors, [TensorType(out_dtype, tuple(out_shape))()]
        )

    def perform(self, node, inputs, output_storage):
        axis, *tensors = inputs
        output_storage[0][0] = np.concatenate(tensors, axis=int(axis))

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.math import add as tadd

        axis = node.inputs[0]
        n = len(node.inputs) - 1
        first = input_shapes[1]
        ndim = len(first)
        try:
            ax = int(get_scalar_constant_value(axis))
            if ax < 0:
                ax += ndim
        except NotScalarConstantError:
            from aesara_tpu.tensor.shape import shape as tshape

            return [tuple(tshape(node.outputs[0])[d] for d in range(ndim))]
        out = list(first)
        total = first[ax]
        for ish in input_shapes[2:]:
            total = tadd(total, ish[ax])
        out[ax] = total
        return [tuple(out)]

    def connection_pattern(self, node):
        return [[False]] + [[True]] * (len(node.inputs) - 1)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.shape import shape as tshape

        axis, *tensors = inputs
        (gz,) = output_grads
        rval = [DisconnectedType()()]
        if tensors[0].type.dtype in discrete_dtypes:
            from aesara_tpu.gradient import grad_undefined

            return rval + [grad_undefined(self, i + 1, t) for i, t in enumerate(tensors)]
        sizes = [tshape(t)[axis] for t in tensors]
        splits = split(gz, stack(sizes), len(tensors), axis=axis)
        if len(tensors) == 1:
            splits = [splits]
        out = []
        for t, g in zip(tensors, splits):
            if g.type.dtype != t.type.dtype and t.type.dtype not in discrete_dtypes:
                g = cast(g, t.type.dtype)
            out.append(g)
        return rval + out


    def R_op(self, inputs, eval_points):
        # linear in every tensor input: join the tangents
        from aesara_tpu.tensor.basic import zeros_like

        evs = eval_points[1:]
        if all(e is None for e in evs):
            return [None]
        evs = [zeros_like(t) if e is None else e
               for e, t in zip(evs, inputs[1:])]
        return [self.make_node(inputs[0], *evs).outputs[0]]

join_ = Join()


def join(axis, *tensors):
    if len(tensors) == 1:
        return as_tensor_variable(tensors[0])
    return join_(axis, *tensors)


def concatenate(tensors, axis=0):
    return join(axis, *tensors)


def stack(tensors, axis: int = 0):
    """Stack along a new axis (reference ``basic.py`` stack)."""
    if not isinstance(tensors, (list, tuple)):
        raise TypeError("stack expects a list of tensors")
    tensors = list(tensors)
    if not tensors:
        raise ValueError("empty stack")
    elems = [as_tensor_variable(t) for t in tensors]
    if all(e.type.ndim == 0 for e in elems) and axis == 0:
        dtype = upcast(*[e.type.dtype for e in elems])
        return MakeVector(dtype)(*elems)
    ndim = elems[0].type.ndim
    if axis < 0:
        axis += ndim + 1
    expanded = [
        DimShuffle(e.type.ndim, tuple(range(axis)) + ("x",) + tuple(range(axis, ndim)))(e)
        for e in elems
    ]
    return join(axis, *expanded)


def horizontal_stack(*args):
    return concatenate([atleast_2d(a) for a in args], axis=1)


def vertical_stack(*args):
    return concatenate([atleast_2d(a) for a in args], axis=0)


class Split(Op):
    """Split along an axis into pieces of given lengths (ref ``basic.py:1882``)."""

    __props__ = ("len_splits",)

    def __init__(self, len_splits: int):
        self.len_splits = int(len_splits)

    def make_node(self, x, axis, splits):
        x = as_tensor_variable(x)
        axis = cast(as_tensor_variable(axis), "int64")
        splits = cast(as_tensor_variable(splits), "int64")
        if splits.type.ndim != 1:
            raise TypeError("splits must be a vector")
        try:
            static_axis = int(get_scalar_constant_value(axis))
            if static_axis < 0:
                static_axis += x.type.ndim
        except NotScalarConstantError:
            static_axis = None
        out_types = []
        for i in range(self.len_splits):
            shape = list(x.type.shape)
            if static_axis is not None:
                try:
                    sizes = get_underlying_constant_vector(splits)
                    shape[static_axis] = int(sizes[i])
                except (NotScalarConstantError, TypeError, IndexError):
                    shape[static_axis] = None
            else:
                shape = [None] * x.type.ndim
            out_types.append(TensorType(x.type.dtype, tuple(shape))())
        return Apply(self, [x, axis, splits], out_types)

    def perform(self, node, inputs, output_storage):
        x, axis, splits = inputs
        if len(splits) != self.len_splits:
            raise ValueError("wrong number of splits")
        if np.sum(splits) != x.shape[int(axis)]:
            raise ValueError(
                f"split sizes {splits} do not sum to axis length {x.shape[int(axis)]}"
            )
        offsets = np.cumsum(splits[:-1])
        for storage, piece in zip(
            output_storage, np.split(x, offsets, axis=int(axis))
        ):
            storage[0] = piece

    def infer_shape(self, fgraph, node, input_shapes):
        xshape, _, _ = input_shapes
        axis = node.inputs[1]
        splits = node.inputs[2]
        out = []
        for i in range(self.len_splits):
            out.append(
                tuple(
                    switch(eq_idx(d, axis), splits[i], xshape[d])
                    for d in range(node.inputs[0].type.ndim)
                )
            )
        return out

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        x, axis, splits = inputs
        # replace undefined (disconnected) output grads with zeros
        outs = self(*inputs, return_list=True)
        gouts = [
            g if not isinstance(g.type, DisconnectedType) else o.zeros_like()
            for g, o in zip(output_grads, outs)
        ]
        return [
            join(axis, *gouts),
            DisconnectedType()(),
            DisconnectedType()(),
        ]


    def R_op(self, inputs, eval_points):
        if eval_points[0] is None:
            return [None] * self.len_splits
        return self.make_node(eval_points[0], *inputs[1:]).outputs
    def connection_pattern(self, node):
        return [[True] * self.len_splits, [False] * self.len_splits,
                [False] * self.len_splits]


def split(x, splits_size, n_splits, axis=0):
    out = Split(int(n_splits))(x, axis, splits_size)
    if n_splits == 1:
        return [out] if not isinstance(out, list) else out
    return out


def eq_idx(d, axis):
    from aesara_tpu.tensor.math import eq as teq

    return teq(constant(d, dtype="int64"), axis)


def get_underlying_constant_vector(v):
    """Constant value of a vector graph (through MakeVector/constants)."""
    if isinstance(v, Constant):
        return np.asarray(v.data)
    if v.owner is not None and isinstance(v.owner.op, MakeVector):
        return np.asarray([get_scalar_constant_value(i) for i in v.owner.inputs])
    if v.owner is not None and isinstance(v.owner.op, Elemwise) and isinstance(
        v.owner.op.scalar_op, aes.ops.Cast
    ):
        return get_underlying_constant_vector(v.owner.inputs[0])
    raise NotScalarConstantError(str(v))


# ---------------------------------------------------------------------------
# Eye / Tri / ARange
# ---------------------------------------------------------------------------

class Eye(Op):
    """Identity-like matrix (reference ``basic.py:1257``)."""

    __props__ = ("dtype",)

    def __init__(self, dtype=None):
        self.dtype = dtype or config.floatX

    def make_node(self, n, m, k):
        n, m, k = [cast(as_tensor_variable(a), "int64") for a in (n, m, k)]
        static = []
        for a in (n, m):
            try:
                static.append(int(get_scalar_constant_value(a)))
            except NotScalarConstantError:
                static.append(None)
        return Apply(self, [n, m, k], [TensorType(self.dtype, tuple(static))()])

    def perform(self, node, inputs, output_storage):
        n, m, k = inputs
        output_storage[0][0] = np.eye(int(n), int(m), int(k), dtype=_np_dtype(self.dtype))

    def infer_shape(self, fgraph, node, input_shapes):
        return [(node.inputs[0], node.inputs[1])]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        return [DisconnectedType()() for _ in inputs]


def eye(n, m=None, k=0, dtype=None):
    if m is None:
        m = n
    return Eye(dtype)(n, m, k)


def identity_like(x, dtype=None):
    x = as_tensor_variable(x)
    from aesara_tpu.tensor.shape import shape as tshape

    return eye(tshape(x)[0], tshape(x)[1], 0, dtype or x.type.dtype)


class Tri(Op):
    """Lower-triangle-of-ones matrix (reference ``basic.py:982``)."""

    __props__ = ("dtype",)

    def __init__(self, dtype=None):
        self.dtype = dtype or config.floatX

    def make_node(self, n, m, k):
        n, m, k = [cast(as_tensor_variable(a), "int64") for a in (n, m, k)]
        static = []
        for a in (n, m):
            try:
                static.append(int(get_scalar_constant_value(a)))
            except NotScalarConstantError:
                static.append(None)
        return Apply(self, [n, m, k], [TensorType(self.dtype, tuple(static))()])

    def perform(self, node, inputs, output_storage):
        n, m, k = inputs
        output_storage[0][0] = np.tri(int(n), int(m), int(k), dtype=_np_dtype(self.dtype))

    def infer_shape(self, fgraph, node, input_shapes):
        return [(node.inputs[0], node.inputs[1])]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        return [DisconnectedType()() for _ in inputs]


def tri(n, m=None, k=0, dtype=None):
    if m is None:
        m = n
    return Tri(dtype)(n, m, k)


def tril(m, k=0):
    m = as_tensor_variable(m)
    from aesara_tpu.tensor.shape import shape as tshape

    mask = tri(tshape(m)[-2], tshape(m)[-1], k, dtype=m.type.dtype)
    return m * mask


def triu(m, k=0):
    m = as_tensor_variable(m)
    from aesara_tpu.tensor.shape import shape as tshape

    mask = tri(tshape(m)[-2], tshape(m)[-1], k - 1, dtype=m.type.dtype)
    return m * (constant(1, dtype=m.type.dtype) - mask)


class ARange(Op):
    """numpy.arange (reference ``basic.py:2867``)."""

    __props__ = ("dtype",)

    def __init__(self, dtype: str):
        self.dtype = dtype

    def make_node(self, start, stop, step):
        start, stop, step = [as_tensor_variable(a) for a in (start, stop, step)]
        static_len = None
        try:
            s0 = get_scalar_constant_value(start)
            s1 = get_scalar_constant_value(stop)
            s2 = get_scalar_constant_value(step)
            static_len = max(0, int(np.ceil((float(s1) - float(s0)) / float(s2))))
        except NotScalarConstantError:
            pass
        return Apply(
            self, [start, stop, step], [TensorType(self.dtype, (static_len,))()]
        )

    def perform(self, node, inputs, output_storage):
        start, stop, step = inputs
        output_storage[0][0] = np.arange(
            start, stop, step, dtype=_np_dtype(self.dtype)
        )

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.math import ceil as tceil, maximum as tmaximum, true_div

        start, stop, step = node.inputs
        length = cast(
            tceil(true_div(cast(stop, "float64") - cast(start, "float64"),
                           cast(step, "float64"))),
            "int64",
        )
        return [(tmaximum(length, constant(0, dtype="int64")),)]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        return [DisconnectedType()() for _ in inputs]


def arange(start, stop=None, step=1, dtype=None):
    if stop is None:
        start, stop = 0, start
    if dtype is None:
        dtypes = []
        for a in (start, stop, step):
            if isinstance(a, Variable):
                dtypes.append(a.type.dtype)
            else:
                dtypes.append(np.asarray(a).dtype.name)
        dtype = upcast(*dtypes)
        if dtype.startswith("float"):
            pass
        elif config.intX == "int32":
            dtype = upcast(dtype, "int32")
        else:
            dtype = upcast(dtype, "int64")
    return ARange(dtype)(start, stop, step)


# ---------------------------------------------------------------------------
# diagonal
# ---------------------------------------------------------------------------

class ExtractDiag(Op):
    """numpy.diagonal (reference ``basic.py:3327``)."""

    __props__ = ("offset", "axis1", "axis2")
    view_map = {0: [0]}

    def __init__(self, offset=0, axis1=0, axis2=1):
        self.offset = int(offset)
        self.axis1 = int(axis1)
        self.axis2 = int(axis2)

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim < 2:
            raise TypeError("ExtractDiag needs ndim >= 2")
        ax1, ax2 = self.axis1 % x.type.ndim, self.axis2 % x.type.ndim
        rest = [s for d, s in enumerate(x.type.shape) if d not in (ax1, ax2)]
        s1, s2 = x.type.shape[ax1], x.type.shape[ax2]
        if s1 is not None and s2 is not None:
            if self.offset >= 0:
                dlen = max(0, min(s1, s2 - self.offset))
            else:
                dlen = max(0, min(s1 + self.offset, s2))
        else:
            dlen = None
        return Apply(self, [x], [TensorType(x.type.dtype, tuple(rest) + (dlen,))()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = np.diagonal(x, self.offset, self.axis1, self.axis2).copy()

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.math import maximum as tmaximum, minimum as tminimum

        (ishape,) = input_shapes
        ndim = node.inputs[0].type.ndim
        ax1, ax2 = self.axis1 % ndim, self.axis2 % ndim
        rest = [s for d, s in enumerate(ishape) if d not in (ax1, ax2)]
        off = constant(self.offset, dtype="int64")
        zero = constant(0, dtype="int64")
        if self.offset >= 0:
            dlen = tminimum(ishape[ax1], ishape[ax2] - off)
        else:
            dlen = tminimum(ishape[ax1] + off, ishape[ax2])
        return [tuple(rest) + (tmaximum(dlen, zero),)]

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        if x.type.ndim != 2:
            raise NotImplementedError("ExtractDiag grad only for matrices")
        from aesara_tpu.tensor.shape import shape as tshape
        from aesara_tpu.tensor.extra_ops import fill_diagonal_offset

        ax1, ax2 = self.axis1 % 2, self.axis2 % 2
        swapped = (ax1, ax2) == (1, 0)
        # diagonal(x, off, 1, 0) == diagonal(x.T, off): scatter into the
        # transposed frame and transpose back (review finding: the grad
        # ignored the axis order and filled the wrong diagonal)
        sh = tshape(x)
        if swapped:
            zero = zeros((sh[1], sh[0]), dtype=gz.type.dtype)
            g = fill_diagonal_offset(zero, gz, self.offset).T
        else:
            zero = zeros((sh[0], sh[1]), dtype=gz.type.dtype)
            g = fill_diagonal_offset(zero, gz, self.offset)
        return [cast(g, x.type.dtype)]


def diagonal(x, offset=0, axis1=0, axis2=1):
    return ExtractDiag(offset, axis1, axis2)(x)


class AllocDiag(Op):
    """Vector → diagonal matrix (reference ``basic.py:3487``)."""

    __props__ = ("offset", "axis1", "axis2")

    def __init__(self, offset=0, axis1=0, axis2=1):
        self.offset = int(offset)
        self.axis1 = int(axis1)
        self.axis2 = int(axis2)

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim < 1:
            raise TypeError("AllocDiag needs ndim >= 1")
        n = x.type.shape[-1]
        d = None if n is None else n + abs(self.offset)
        out_shape = x.type.shape[:-1] + (d, d)
        return Apply(self, [x], [TensorType(x.type.dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        if x.ndim == 1:
            res = np.diag(x, self.offset)
        else:
            n = x.shape[-1] + abs(self.offset)
            res = np.zeros(x.shape[:-1] + (n, n), dtype=x.dtype)
            idx = np.arange(x.shape[-1])
            if self.offset >= 0:
                res[..., idx, idx + self.offset] = x
            else:
                res[..., idx - self.offset, idx] = x
        output_storage[0][0] = res

    def infer_shape(self, fgraph, node, input_shapes):
        (ishape,) = input_shapes
        d = ishape[-1] + constant(abs(self.offset), dtype="int64")
        return [tuple(ishape[:-1]) + (d, d)]

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [diagonal(gz, self.offset, self.axis1, self.axis2)]


def diag(v, k=0):
    v = as_tensor_variable(v)
    if v.type.ndim == 1:
        return AllocDiag(k)(v)
    elif v.type.ndim >= 2:
        return diagonal(v, offset=k)
    raise ValueError("diag needs vector or matrix")


# ---------------------------------------------------------------------------
# structural conveniences
# ---------------------------------------------------------------------------

def transpose(x, axes=None):
    x = as_tensor_variable(x)
    if axes is None:
        axes = tuple(range(x.type.ndim - 1, -1, -1))
    return DimShuffle(x.type.ndim, tuple(axes))(x)


def swapaxes(x, axis1, axis2):
    x = as_tensor_variable(x)
    order = list(range(x.type.ndim))
    order[axis1], order[axis2] = order[axis2], order[axis1]
    return DimShuffle(x.type.ndim, tuple(order))(x)


def moveaxis(x, source, destination):
    x = as_tensor_variable(x)
    src = tuple(int(s) % x.type.ndim for s in np.atleast_1d(source))
    dst = tuple(int(d) % x.type.ndim for d in np.atleast_1d(destination))
    order = [n for n in range(x.type.ndim) if n not in src]
    for d, s in sorted(zip(dst, src)):
        order.insert(d, s)
    return DimShuffle(x.type.ndim, tuple(order))(x)


def expand_dims(x, axis):
    x = as_tensor_variable(x)
    if isinstance(axis, int):
        axis = (axis,)
    out_ndim = x.type.ndim + len(axis)
    # numpy contract: out-of-range axes raise, they don't wrap (the
    # bare ``a % out_ndim`` silently mapped axis 5 of a 2-d input to 2 —
    # review-wave finding; the reference's shape_padaxis raises too,
    # /root/reference/aesara/tensor/shape.py:858)
    for a in axis:
        if not -out_ndim <= a < out_ndim:
            raise IndexError(
                f"expand_dims: axis {a} is out of bounds "
                f"[-{out_ndim}, {out_ndim})")
    axis = tuple(a % out_ndim for a in axis)
    if len(set(axis)) != len(axis):
        # numpy contract (np.expand_dims): repeated axes — including a
        # positive/negative alias pair — raise, they don't collapse
        raise ValueError("repeated axis in expand_dims")
    pattern = []
    it = iter(range(x.type.ndim))
    for d in range(out_ndim):
        pattern.append("x" if d in axis else next(it))
    return DimShuffle(x.type.ndim, tuple(pattern))(x)


def atleast_Nd(x, n: int):
    x = as_tensor_variable(x)
    if x.type.ndim >= n:
        return x
    pad = ("x",) * (n - x.type.ndim) + tuple(range(x.type.ndim))
    return DimShuffle(x.type.ndim, pad)(x)


def atleast_1d(x):
    return atleast_Nd(x, 1)


def atleast_2d(x):
    return atleast_Nd(x, 2)


def flatten(x, ndim: int = 1):
    x = as_tensor_variable(x)
    if not (1 <= ndim <= x.type.ndim):
        # reference basic.py flatten: ndim must be in [1, x.ndim]
        raise ValueError(
            f"flatten ndim {ndim} out of range for input ndim {x.type.ndim}"
        )
    if ndim == x.type.ndim:
        return x
    from aesara_tpu.tensor.shape import reshape, shape as tshape
    from aesara_tpu.tensor.math import prod as tprod

    static = x.type.shape
    if ndim > 1 and all(s is not None for s in static[: ndim - 1]):
        # leading extents statically known: emit a CONSTANT target so
        # reshape's static inference resolves the -1 (XLA tiling wants
        # fully-static shapes whenever the graph can provide them)
        return reshape(x, tuple(static[: ndim - 1]) + (-1,), ndim=ndim)
    if ndim == 1:
        newshape = (tprod(tshape(x)),)
    else:
        lead = [tshape(x)[i] for i in range(ndim - 1)]
        newshape = tuple(lead) + (constant(-1, dtype="int64"),)
    return reshape(x, stack([cast(as_tensor_variable(s), "int64") for s in newshape]), ndim=ndim)


def switch(cond, ift, iff):
    return Elemwise(aes.ops.switch)(cond, ift, iff)


where = switch


def tensor_copy(x):
    """Graph-level identity that forces a copy at execution (DeepCopyOp)."""
    from aesara_tpu.compile.ops import deep_copy_op

    return deep_copy_op(as_tensor_variable(x))


# ---------------------------------------------------------------------------
# constant extraction
# ---------------------------------------------------------------------------

def get_scalar_constant_value(
    v, elemwise: bool = True, only_process_constants: bool = False, max_recur: int = 10
):
    """Return the python scalar behind a constant scalar graph, walking
    through DimShuffle/Elemwise/Alloc/etc. (reference ``basic.py:327``)."""
    from aesara_tpu.tensor.shape import Shape_i

    while max_recur > 0:
        max_recur -= 1
        if v is None:
            raise NotScalarConstantError("None")
        if isinstance(v, (int, float, np.number)):
            return np.asarray(v)[()]
        if isinstance(v, np.ndarray):
            if v.size != 1:
                raise NotScalarConstantError(str(v))
            return v.reshape(())[()]
        if isinstance(v, Constant):
            data = np.asarray(v.data)
            if data.size != 1:
                unique = getattr(v, "unique_value", None)
                if unique is not None:
                    return unique
                raise NotScalarConstantError(str(v))
            return data.reshape(())[()]
        if only_process_constants or v.owner is None:
            raise NotScalarConstantError(str(v))
        op = v.owner.op
        if isinstance(op, (TensorFromScalar, ScalarFromTensor)):
            v = v.owner.inputs[0]
            continue
        if isinstance(op, DimShuffle):
            v = v.owner.inputs[0]
            continue
        if isinstance(op, Alloc):
            v = v.owner.inputs[0]
            continue
        if elemwise and isinstance(op, Elemwise):
            scalar_op = op.scalar_op
            if isinstance(scalar_op, aes.ops.Cast):
                inner = get_scalar_constant_value(
                    v.owner.inputs[0], elemwise, only_process_constants, max_recur
                )
                return np.asarray(inner).astype(_np_dtype(v.type.dtype))[()]
            if isinstance(scalar_op, aes.ops.Second):
                v = v.owner.inputs[1]
                continue
            try:
                vals = [
                    get_scalar_constant_value(i, elemwise, only_process_constants, max_recur)
                    for i in v.owner.inputs
                ]
            except NotScalarConstantError:
                raise NotScalarConstantError(str(v))
            res = scalar_op.impl(*vals)
            return np.asarray(res).astype(_np_dtype(v.type.dtype))[()]
        from aesara_tpu.tensor.subtensor import Subtensor

        if isinstance(op, Subtensor) and v.owner.inputs[0].owner is not None:
            inner = v.owner.inputs[0].owner
            if isinstance(inner.op, MakeVector) and len(op.idx_list) == 1 and isinstance(op.idx_list[0], int):
                v = inner.inputs[op.idx_list[0]]
                continue
        raise NotScalarConstantError(str(v))
    raise NotScalarConstantError("max recursion")


def extract_constant(x, elemwise=True, only_process_constants=False):
    try:
        return get_scalar_constant_value(x, elemwise, only_process_constants)
    except NotScalarConstantError:
        return x


def get_vector_length(v) -> int:
    """Static length of a symbolic vector (reference ``basic.py``)."""
    v = as_tensor_variable(v)
    if v.type.ndim != 1:
        raise TypeError("not a vector")
    if v.type.shape[0] is not None:
        return int(v.type.shape[0])
    if isinstance(v, Constant):
        return len(v.data)
    if v.owner is not None and isinstance(v.owner.op, MakeVector):
        return len(v.owner.inputs)
    from aesara_tpu.tensor.shape import Shape

    if v.owner is not None and isinstance(v.owner.op, Shape):
        return v.owner.inputs[0].type.ndim
    raise ValueError(f"length of {v} not known statically")


# ---------------------------------------------------------------------------
# Nonzero / Choose / PermuteRowElements
# ---------------------------------------------------------------------------

class Nonzero(Op):
    """Indices of nonzero elements (reference ``basic.py:839``).

    Dynamic output shape: runs on the py path; XLA requires a static size,
    so the jax lowering raises with guidance to use mask-based patterns.
    """

    __props__ = ()

    def make_node(self, a):
        a = as_tensor_variable(a)
        if a.type.ndim == 0:
            raise ValueError("nonzero of 0-d tensor")
        return Apply(
            self,
            [a],
            [TensorType("int64", (None,))() for _ in range(a.type.ndim)],
        )

    def perform(self, node, inputs, output_storage):
        res = np.nonzero(inputs[0])
        for storage, r in zip(output_storage, res):
            storage[0] = r.astype(np.int64)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0])]


_nonzero = Nonzero()


def nonzero(a, return_matrix: bool = False):
    res = _nonzero(a)
    if isinstance(res, Variable):
        res = [res]
    if return_matrix:
        return stack(list(res), axis=0)
    return tuple(res)


def nonzero_values(a):
    a = as_tensor_variable(a)
    from aesara_tpu.tensor.subtensor import take_slice

    return a.flatten()[nonzero(a.flatten())[0]]


def flatnonzero(a):
    a = as_tensor_variable(a)
    return nonzero(a.flatten())[0]


class PermuteRowElements(Op):
    """Permute elements of each row by index vectors (ref ``basic.py:3111``)."""

    __props__ = ("inverse",)

    def __init__(self, inverse: bool = False):
        self.inverse = bool(inverse)

    def make_node(self, x, y):
        x = as_tensor_variable(x)
        y = cast(as_tensor_variable(y), "int64")
        ndim = max(x.type.ndim, y.type.ndim)
        out_shape = (None,) * ndim
        return Apply(self, [x, y], [TensorType(x.type.dtype, out_shape)()])

    def _permute(self, x, y):
        if self.inverse:
            res = np.empty_like(x)
            res[..., y] = x  # simplistic; used for 1d rows below
            return res
        return x[..., y]

    def perform(self, node, inputs, output_storage):
        x, y = inputs
        shape = np.broadcast_shapes(x.shape, y.shape)
        xb = np.broadcast_to(x, shape)
        yb = np.broadcast_to(y, shape)
        out = np.empty(shape, dtype=x.dtype)
        flat_x = xb.reshape(-1, shape[-1])
        flat_y = yb.reshape(-1, shape[-1])
        flat_o = out.reshape(-1, shape[-1])
        for i in range(flat_x.shape[0]):
            if self.inverse:
                flat_o[i][flat_y[i]] = flat_x[i]
            else:
                flat_o[i] = flat_x[i][flat_y[i]]
        output_storage[0][0] = out

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.math import maximum as tmaximum

        xs, ys = input_shapes
        nd = node.outputs[0].type.ndim
        xs = (constant(1, dtype="int64"),) * (nd - len(xs)) + tuple(xs)
        ys = (constant(1, dtype="int64"),) * (nd - len(ys)) + tuple(ys)
        return [tuple(tmaximum(a, b) for a, b in zip(xs, ys))]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        x, y = inputs
        (gz,) = output_grads
        gx = PermuteRowElements(not self.inverse)(gz, y)
        # collapse any broadcast dims of x
        if gx.type.ndim > x.type.ndim:
            from aesara_tpu.tensor.math import sum as tsum

            gx = tsum(gx, axis=list(range(gx.type.ndim - x.type.ndim)))
        return [gx, grad_undefined(self, 1, y)]


def permute_row_elements(x, y, inverse=False):
    return PermuteRowElements(bool(inverse))(x, y)


def inverse_permutation(perm):
    return permute_row_elements(arange(as_tensor_variable(perm).shape[-1]), perm, inverse=True)


class Choose(Op):
    """numpy.choose (reference ``basic.py:3773``)."""

    __props__ = ("mode",)

    def __init__(self, mode: str = "raise"):
        self.mode = mode

    def make_node(self, a, choices):
        a = as_tensor_variable(a)
        choices = as_tensor_variable(choices)
        out_shape = (None,) * (choices.type.ndim - 1)
        return Apply(self, [a, choices], [TensorType(choices.type.dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        a, choices = inputs
        output_storage[0][0] = np.choose(a, choices, mode=self.mode)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, i, inp) for i, inp in enumerate(inputs)]


def choose(a, choices, mode="raise"):
    return Choose(mode)(a, choices)


# --- reference __all__ completions (tensor/basic.py tail) --------------------

second = fill
extract_diag = diagonal


def atleast_3d(*args):
    res = []
    for a in args:
        a = as_tensor_variable(a)
        if a.type.ndim == 0:
            a = a.dimshuffle("x", "x", "x")
        elif a.type.ndim == 1:
            a = a.dimshuffle("x", 0, "x")
        elif a.type.ndim == 2:
            a = a.dimshuffle("x", 0, 1)
        res.append(a)
    return res if len(res) > 1 else res[0]


def empty_like(x, dtype=None):
    x = as_tensor_variable(x)
    from aesara_tpu.tensor.shape import shape as _shape

    return AllocEmpty(dtype or x.type.dtype)(*[x.shape[i] for i in range(x.type.ndim)])


def is_flat(var, ndim=1):
    """True iff ``var`` has exactly ``ndim`` dims (reference ``is_flat``)."""
    return as_tensor_variable(var).type.ndim == ndim


def roll(x, shift, axis=None):
    """np.roll semantics via modular arange indexing — works for
    symbolic shifts (reference ``roll``)."""
    x = as_tensor_variable(x)
    if axis is None:
        flat = x.reshape((mul_scalars([x.shape[i] for i in range(x.type.ndim)]),))
        return roll(flat, shift, 0).reshape(x.shape)
    n = x.shape[axis]
    idx = (arange(0, n) - shift) % n
    from aesara_tpu.tensor.subtensor import take

    return take(x, idx, axis=axis)


def mul_scalars(xs):
    from aesara_tpu.tensor.math import mul as tmul

    res = xs[0]
    for e in xs[1:]:
        res = tmul(res, e)
    return res


def tile(x, reps, ndim=None):
    """np.tile with a static reps tuple (reference ``tile``)."""
    x = as_tensor_variable(x)
    if isinstance(reps, (int, np.integer)):
        reps = (int(reps),)
    reps = tuple(int(r) for r in reps)
    nd = max(len(reps), x.type.ndim) if ndim is None else ndim
    while x.type.ndim < nd:
        x = x.dimshuffle(*(["x"] + list(range(x.type.ndim))))
    reps = (1,) * (nd - len(reps)) + reps
    for axis, r in enumerate(reps):
        if r == 1:
            continue
        if r < 0:
            raise ValueError("tile reps must be non-negative")
        if r == 0:
            # numpy semantics: a zero rep empties that axis
            index = tuple(
                slice(0, 0) if d == axis else slice(None) for d in range(nd)
            )
            x = x[index]
        else:
            x = join(axis, *([x] * r))
    return x


def take_along_axis(arr, indices, axis=-1):
    """np.take_along_axis for matching-rank int indices (reference)."""
    arr = as_tensor_variable(arr)
    indices = as_tensor_variable(indices)
    nd = arr.type.ndim
    ax = axis % nd
    index = []
    for d in range(nd):
        if d == ax:
            index.append(indices)
        else:
            shp = ["x"] * nd
            shp[d] = 0
            index.append(arange(0, indices.shape[d]).dimshuffle(*shp))
    return arr[tuple(index)]


def tril_indices(n, k=0, m=None):
    """Symbolic tril indices via Nonzero(Tri) (reference ``tril_indices``)."""
    from aesara_tpu.tensor.math import ge as t_ge

    m = n if m is None else m
    r = arange(0, n).dimshuffle(0, "x")
    c = arange(0, m).dimshuffle("x", 0)
    return nonzero(t_ge(r + k, c))


def tril_indices_from(a, k=0):
    a = as_tensor_variable(a)
    return tril_indices(a.shape[0], k=k, m=a.shape[1])


def triu_indices(n, k=0, m=None):
    from aesara_tpu.tensor.math import le as t_le

    m = n if m is None else m
    r = arange(0, n).dimshuffle(0, "x")
    c = arange(0, m).dimshuffle("x", 0)
    return nonzero(t_le(r + k, c))


def triu_indices_from(a, k=0):
    a = as_tensor_variable(a)
    return triu_indices(a.shape[0], k=k, m=a.shape[1])


def stacklists(arg):
    """Recursively stack nested lists into one tensor (reference
    ``stacklists``)."""
    if isinstance(arg, (tuple, list)):
        return stack([stacklists(a) for a in arg], axis=0)
    return as_tensor_variable(arg)


def transfer(var, target):
    """Device transfer is the linker's job under XLA; identity
    (reference ``transfer`` moved data host<->device)."""
    return as_tensor_variable(var)


def default(x, default_value):
    """Use ``default_value`` when ``x`` is not provided at call time
    (reference ``Default`` op used with In())."""
    from aesara_tpu.compile.io import In

    x = as_tensor_variable(x)
    return In(x, value=np.asarray(default_value))


class _GridBase:
    def __init__(self, sparse_grid):
        self.sparse = sparse_grid

    def __getitem__(self, key):
        if not isinstance(key, tuple):
            key = (key,)
        ranges = []
        for sl in key:
            start = 0 if sl.start is None else sl.start
            step = 1 if sl.step is None else sl.step
            ranges.append(arange(start, sl.stop, step))
        nd = len(ranges)
        outs = []
        for i, r in enumerate(ranges):
            order = ["x"] * nd
            order[i] = 0
            outs.append(r.dimshuffle(*order))
        if self.sparse:
            return outs if nd > 1 else outs[0]
        # dense: broadcast all to the full grid
        from aesara_tpu.tensor.math import add as t_add

        full = outs[0]
        for o in outs[1:]:
            full = t_add(full, o * 0)
        dense = [o + full * 0 for o in outs]
        return dense if nd > 1 else dense[0]


mgrid = _GridBase(sparse_grid=False)
ogrid = _GridBase(sparse_grid=True)

__all__ += [
    "second", "extract_diag", "atleast_3d", "empty_like", "is_flat",
    "roll", "tile", "take_along_axis", "tril_indices", "tril_indices_from",
    "triu_indices", "triu_indices_from", "stacklists", "transfer",
    "default", "mgrid", "ogrid",
]
