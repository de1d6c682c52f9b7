"""Indexing ops: ``Subtensor``/``IncSubtensor`` (basic slicing) and the
advanced (fancy/boolean) variants.

Re-design of the reference's ``aesara/tensor/subtensor.py`` (Subtensor:682,
IncSubtensor:1454, AdvancedSubtensor1:1925, AdvancedIncSubtensor1:2128,
AdvancedSubtensor:2543, AdvancedIncSubtensor:2647).  Index lists use the
reference's encoding: static entries are ints/slices, symbolic entries are
a placeholder consumed from the node inputs in order.  XLA lowerings map
to ``lax.slice``/``dynamic_slice``/gather/scatter.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np

from aesara_tpu.graph.ir import Apply, Constant, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.scalar.ops import _np_dtype, discrete_dtypes
from aesara_tpu.tensor.basic import (
    NotScalarConstantError,
    as_tensor_variable,
    cast,
    constant,
    get_scalar_constant_value,
)
from aesara_tpu.tensor.type import TensorType


__all__ = [
    "Subtensor", "IncSubtensor", "AdvancedSubtensor", "AdvancedIncSubtensor",
    "AdvancedSubtensor1", "AdvancedIncSubtensor1",
    "set_subtensor", "inc_subtensor", "take", "take_slice",
    "indices_from_subtensor", "get_idx_list", "SYM",
    "DynamicSlice", "DynamicIncSubtensor",
]


class _Sym:
    """Placeholder in an idx_list meaning 'consume the next node input'."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "SYM"

    def __reduce__(self):
        return (_Sym, ())


SYM = _Sym()


def _norm_entry(e, inputs: list):
    """Normalize one index entry: return (encoded, consumed_inputs)."""
    if isinstance(e, (int, np.integer)):
        return int(e), []
    if e is None:
        raise TypeError("newaxis must be handled before Subtensor")
    if isinstance(e, Variable):
        v = as_tensor_variable(e)
        if v.type.ndim != 0:
            raise TypeError("basic index entries must be scalars")
        if v.type.dtype not in discrete_dtypes:
            raise TypeError(f"index must be integer, got {v.type.dtype}")
        if isinstance(v, Constant):
            return int(v.data), []
        return SYM, [cast(v, "int64")]
    raise TypeError(f"invalid index entry {e!r}")


def encode_indices(idx) -> Tuple[tuple, list]:
    """Encode a tuple of slices/ints/symbolic-scalars into (idx_list, inputs)."""
    idx_list = []
    inputs: list = []
    for e in idx:
        if isinstance(e, slice):
            parts = []
            for p in (e.start, e.stop, e.step):
                if p is None:
                    parts.append(None)
                else:
                    enc, cons = _norm_entry(p, inputs)
                    parts.append(enc)
                    inputs.extend(cons)
            idx_list.append(slice(*parts))
        else:
            enc, cons = _norm_entry(e, inputs)
            idx_list.append(enc)
            inputs.extend(cons)
    return tuple(idx_list), inputs


def indices_from_subtensor(op_inputs, idx_list):
    """Rebuild the concrete index tuple from node inputs + idx_list."""
    it = iter(op_inputs)

    def get(e):
        if e is SYM:
            return next(it)
        return e

    out = []
    for e in idx_list:
        if isinstance(e, slice):
            out.append(slice(get(e.start), get(e.stop), get(e.step)))
        else:
            out.append(get(e))
    return tuple(out)


def get_idx_list(inputs, idx_list):
    return indices_from_subtensor(inputs[1:], idx_list)


def _static_slice_len(length, sl: slice):
    """Static output length of a basic slice over a (possibly None) dim."""
    start, stop, step = sl.start, sl.stop, sl.step
    if any(e is SYM for e in (start, stop, step)):
        return None
    if length is None:
        # numpy/XLA CLAMP slices to the runtime extent, so a bounded
        # slice over an unknown dim has no static length — x[0:5] on a
        # length-3 input yields 3, not 5 (review finding)
        return None
    return len(range(*sl.indices(length)))


class Subtensor(Op):
    """Basic (NumPy view) slicing (reference ``subtensor.py:682``)."""

    __props__ = ("idx_list",)
    view_map = {0: [0]}

    def __init__(self, idx_list):
        self.idx_list = tuple(idx_list)

    def make_node(self, x, *inputs):
        x = as_tensor_variable(x)
        if len(self.idx_list) > x.type.ndim:
            raise IndexError("too many indices")
        inputs = [cast(as_tensor_variable(i), "int64") for i in inputs]
        out_shape = []
        for d, e in enumerate(self.idx_list):
            s = x.type.shape[d]
            if isinstance(e, slice):
                out_shape.append(_static_slice_len(s, e))
            # integer index drops the dim
        out_shape.extend(x.type.shape[len(self.idx_list):])
        return Apply(
            self, [x] + inputs, [TensorType(x.type.dtype, tuple(out_shape))()]
        )

    def perform(self, node, inputs, output_storage):
        x, *index_inputs = inputs
        idx = indices_from_subtensor([int(i) for i in index_inputs], self.idx_list)
        output_storage[0][0] = x[idx]

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor import math as tm
        from aesara_tpu.tensor.basic import switch

        xshape = input_shapes[0]
        idx = indices_from_subtensor(node.inputs[1:], self.idx_list)
        out = []
        for d, e in enumerate(idx):
            if isinstance(e, slice):
                out.append(_symbolic_slice_len(xshape[d], e))
        out.extend(xshape[len(idx):])
        return [tuple(out)]

    def connection_pattern(self, node):
        return [[True]] + [[False]] * (len(node.inputs) - 1)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.basic import zeros_like

        x, *index_inputs = inputs
        (gz,) = output_grads
        rest = [DisconnectedType()() for _ in index_inputs]
        if x.type.dtype in discrete_dtypes:
            from aesara_tpu.gradient import grad_undefined

            return [grad_undefined(self, 0, x)] + rest
        gx = IncSubtensor(self.idx_list)(zeros_like(x), gz, *index_inputs)
        return [gx] + rest


    def R_op(self, inputs, eval_points):
        # gather is linear: gather the tangent
        if eval_points[0] is None:
            return [None]
        return self.make_node(eval_points[0], *inputs[1:]).outputs
    def __str__(self):
        parts = []
        for e in self.idx_list:
            if isinstance(e, slice):
                def f(v):
                    return "" if v is None else ("?" if v is SYM else str(v))

                parts.append(f"{f(e.start)}:{f(e.stop)}:{f(e.step)}")
            else:
                parts.append("?" if e is SYM else str(e))
        return f"Subtensor{{{', '.join(parts)}}}"


def _symbolic_slice_len(dim, sl: slice):
    """Symbolic length of slice ``sl`` over symbolic dim size ``dim``
    (CPython ``slice.indices`` semantics)."""
    from aesara_tpu.tensor import math as tm
    from aesara_tpu.tensor.basic import switch

    def norm(v):
        if isinstance(v, int):
            return constant(v, dtype="int64")
        return cast(as_tensor_variable(v), "int64")

    zero = constant(0, dtype="int64")
    one = constant(1, dtype="int64")
    dim = cast(as_tensor_variable(dim), "int64")
    step = norm(sl.step) if sl.step is not None else one
    pos_step = tm.ge(step, zero)

    lower = switch(pos_step, zero, -one)
    upper = switch(pos_step, dim, dim - one)

    def resolve(v, default_pos, default_neg):
        if v is None:
            return switch(pos_step, default_pos, default_neg)
        v = norm(v)
        return switch(
            tm.lt(v, zero),
            tm.maximum(v + dim, lower),
            tm.minimum(v, upper),
        )

    start_c = resolve(sl.start, zero, dim - one)
    stop_c = resolve(sl.stop, dim, -one)
    astep = tm.abs(step)
    diff = switch(pos_step, stop_c - start_c, start_c - stop_c)
    length = tm.int_div(diff + astep - one, astep)
    return tm.maximum(length, zero)


class IncSubtensor(Op):
    """x with x[idx] set/incremented by y (reference ``subtensor.py:1454``).

    Never in-place at the IR level; the XLA lowering uses
    ``.at[...].set/add`` and buffer donation supplies in-place semantics.
    """

    __props__ = ("idx_list", "set_instead_of_inc", "inplace")

    def __init__(self, idx_list, set_instead_of_inc: bool = False, inplace: bool = False):
        self.idx_list = tuple(idx_list)
        self.set_instead_of_inc = bool(set_instead_of_inc)
        self.inplace = bool(inplace)
        if inplace:
            self.destroy_map = {0: [0]}

    def make_node(self, x, y, *inputs):
        x = as_tensor_variable(x)
        y = as_tensor_variable(y)
        if y.type.dtype != x.type.dtype:
            y = cast(y, x.type.dtype)
        inputs = [cast(as_tensor_variable(i), "int64") for i in inputs]
        return Apply(self, [x, y] + inputs, [x.type()])

    def perform(self, node, inputs, output_storage):
        x, y, *index_inputs = inputs
        idx = indices_from_subtensor([int(i) for i in index_inputs], self.idx_list)
        out = x if self.inplace else x.copy()
        if self.set_instead_of_inc:
            out[idx] = y
        else:
            out[idx] += y
        output_storage[0][0] = out

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def connection_pattern(self, node):
        return [[True], [True]] + [[False]] * (len(node.inputs) - 2)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        x, y, *index_inputs = inputs
        (gz,) = output_grads
        rest = [DisconnectedType()() for _ in index_inputs]
        sub_gz = Subtensor(self.idx_list)(gz, *index_inputs)
        gy = _sum_grad_over_bcasted_dims(y, sub_gz)
        if self.set_instead_of_inc:
            gx = IncSubtensor(self.idx_list, set_instead_of_inc=True)(
                gz, _zeros_slice(gz, self.idx_list, index_inputs), *index_inputs
            )
        else:
            gx = gz
        return [gx, gy] + rest


    def R_op(self, inputs, eval_points):
        # linear in (x, y): apply to the tangents (None -> zeros)
        from aesara_tpu.tensor.basic import zeros_like

        ex, ey = eval_points[0], eval_points[1]
        if ex is None and ey is None:
            return [None]
        ex = zeros_like(inputs[0]) if ex is None else ex
        ey = zeros_like(inputs[1]) if ey is None else ey
        return [self.make_node(ex, ey, *inputs[2:]).outputs[0]]
    def __str__(self):
        verb = "Set" if self.set_instead_of_inc else "Inc"
        inner = Subtensor(self.idx_list).__str__()
        return f"{verb}{inner[3:]}" if inner.startswith("Sub") else f"{verb}Subtensor"


def _zeros_slice(gz, idx_list, index_inputs):
    from aesara_tpu.tensor.basic import zeros_like

    return zeros_like(Subtensor(idx_list)(gz, *index_inputs))


def _sum_grad_over_bcasted_dims(y, gy):
    """Sum gy down to y's shape when y was broadcast into the target slice."""
    from aesara_tpu.tensor import math as tm

    if gy.type.ndim > y.type.ndim:
        gy = tm.sum(gy, axis=list(range(gy.type.ndim - y.type.ndim)))
    to_sum = [
        d for d in range(y.type.ndim)
        if y.type.shape[d] == 1 and gy.type.shape[d] != 1
    ]
    if to_sum:
        gy = tm.sum(gy, axis=to_sum, keepdims=True)
    from aesara_tpu.tensor.shape import specify_shape

    if gy.type.shape != y.type.shape:
        try:
            gy = specify_shape(gy, y.type.shape)
        except TypeError:
            pass
    return gy


def set_subtensor(x, y, tolerate_inplace_aliasing=False):
    """x must be a Subtensor/AdvancedSubtensor expression; returns the base
    tensor with that region replaced by ``y``."""
    return inc_subtensor(x, y, set_instead_of_inc=True)


def inc_subtensor(x, y, inplace=False, set_instead_of_inc=False,
                  tolerate_inplace_aliasing=False, ignore_duplicates=False):
    """Increment (or set) the indexed region (reference ``subtensor.py``)."""
    if x.owner is None:
        raise TypeError("x must be the result of indexing")
    op = x.owner.op
    if isinstance(op, Subtensor):
        base, *index_inputs = x.owner.inputs
        return IncSubtensor(op.idx_list, set_instead_of_inc=set_instead_of_inc)(
            base, y, *index_inputs
        )
    if isinstance(op, AdvancedSubtensor1):
        base, ilist = x.owner.inputs
        return AdvancedIncSubtensor1(set_instead_of_inc=set_instead_of_inc)(
            base, y, ilist
        )
    if isinstance(op, AdvancedSubtensor):
        base, *index_inputs = x.owner.inputs
        return AdvancedIncSubtensor(
            op.idx_list, set_instead_of_inc=set_instead_of_inc,
            ignore_duplicates=ignore_duplicates,
        )(base, y, *index_inputs)
    from aesara_tpu.tensor.elemwise import DimShuffle

    if isinstance(op, DimShuffle) and op.is_transpose:
        # push through transposes: inc(x.T, y) = inc(x, y.T).T
        inner = inc_subtensor(
            x.owner.inputs[0],
            DimShuffle(y.type.ndim, tuple(np.argsort(op.shuffle)))(y)
            if y.type.ndim == len(op.shuffle) else y,
            set_instead_of_inc=set_instead_of_inc,
        )
        return inner
    raise TypeError(f"cannot inc_subtensor through {op}")


# ---------------------------------------------------------------------------
# advanced indexing
# ---------------------------------------------------------------------------

class AdvancedSubtensor1(Op):
    """x[int_vector] along axis 0 (reference ``subtensor.py:1925``).

    ``sparse_grad=True`` (set via ``aesara_tpu.sparse.sparse_grad``)
    makes the gradient a sparse matrix of the gathered rows instead of a
    dense zeros + scatter (reference sparse/__init__.py sparse_grad)."""

    __props__ = ("sparse_grad",)

    def __init__(self, sparse_grad: bool = False):
        self.sparse_grad = bool(sparse_grad)

    def make_node(self, x, ilist):
        x = as_tensor_variable(x)
        ilist = as_tensor_variable(ilist)
        if ilist.type.dtype not in discrete_dtypes or ilist.type.dtype == "bool":
            # float indices must not silently truncate (reference
            # subtensor.py:1925 make_node requires an integer vector)
            raise TypeError(
                f"index must be integers, got {ilist.type.dtype}"
            )
        ilist = cast(ilist, "int64")
        if ilist.type.ndim != 1:
            raise TypeError("index must be a vector")
        if x.type.ndim == 0:
            raise TypeError("cannot index a scalar")
        out_shape = (ilist.type.shape[0],) + x.type.shape[1:]
        return Apply(self, [x, ilist], [TensorType(x.type.dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        x, i = inputs
        output_storage[0][0] = x.take(i, axis=0)

    def infer_shape(self, fgraph, node, input_shapes):
        xshape, ishape = input_shapes
        return [(ishape[0],) + tuple(xshape[1:])]

    def connection_pattern(self, node):
        return [[True], [False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.basic import zeros_like

        x, ilist = inputs
        (gz,) = output_grads
        if self.sparse_grad and x.type.ndim == 2:
            from aesara_tpu.sparse.basic import ConstructSparseFromList

            gx = ConstructSparseFromList()(x, gz, ilist)
        else:
            gx = AdvancedIncSubtensor1()(zeros_like(x), gz, ilist)
        return [gx, DisconnectedType()()]


    def R_op(self, inputs, eval_points):
        # gather is linear: gather the tangent
        if eval_points[0] is None:
            return [None]
        return self.make_node(eval_points[0], *inputs[1:]).outputs
    def __str__(self):
        return "AdvancedSubtensor1"


class AdvancedIncSubtensor1(Op):
    """inc/set x[int_vector] by y (reference ``subtensor.py:2128``)."""

    __props__ = ("inplace", "set_instead_of_inc")

    def __init__(self, inplace: bool = False, set_instead_of_inc: bool = False):
        self.inplace = bool(inplace)
        self.set_instead_of_inc = bool(set_instead_of_inc)
        if inplace:
            self.destroy_map = {0: [0]}

    def make_node(self, x, y, ilist):
        x = as_tensor_variable(x)
        y = as_tensor_variable(y)
        if y.type.dtype != x.type.dtype:
            y = cast(y, x.type.dtype)
        ilist = cast(as_tensor_variable(ilist), "int64")
        return Apply(self, [x, y, ilist], [x.type()])

    def perform(self, node, inputs, output_storage):
        x, y, i = inputs
        out = x if self.inplace else x.copy()
        if self.set_instead_of_inc:
            out[i] = y
        else:
            np.add.at(out, i, y)
        output_storage[0][0] = out

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def connection_pattern(self, node):
        return [[True], [True], [False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        x, y, ilist = inputs
        (gz,) = output_grads
        gy = AdvancedSubtensor1()(gz, ilist)
        gy = _sum_grad_over_bcasted_dims(y, gy)
        if self.set_instead_of_inc:
            from aesara_tpu.tensor.basic import zeros_like

            gx = AdvancedIncSubtensor1(set_instead_of_inc=True)(
                gz, zeros_like(gy), ilist
            )
        else:
            gx = gz
        return [gx, gy, DisconnectedType()()]


    def R_op(self, inputs, eval_points):
        # linear in (x, y): apply to the tangents (None -> zeros)
        from aesara_tpu.tensor.basic import zeros_like

        ex, ey = eval_points[0], eval_points[1]
        if ex is None and ey is None:
            return [None]
        ex = zeros_like(inputs[0]) if ex is None else ex
        ey = zeros_like(inputs[1]) if ey is None else ey
        return [self.make_node(ex, ey, *inputs[2:]).outputs[0]]
    def __str__(self):
        verb = "Set" if self.set_instead_of_inc else "Inc"
        return f"Advanced{verb}Subtensor1"


class AdvancedSubtensor(Op):
    """General fancy indexing (reference ``subtensor.py:2543``).

    ``idx_list`` encodes the static structure: slices (with SYM markers),
    ints, or the marker ``'array'`` meaning an index-array input is
    consumed.  Boolean masks are converted to integer arrays upstream.
    """

    __props__ = ("idx_list",)

    def __init__(self, idx_list):
        self.idx_list = tuple(idx_list)

    def make_node(self, x, *inputs):
        x = as_tensor_variable(x)
        inputs = [as_tensor_variable(i) for i in inputs]
        for i in inputs:
            if i.type.dtype not in discrete_dtypes:
                # float/complex indices must fail at BUILD, not truncate
                # (reference subtensor.py: advanced indices are int/bool)
                raise TypeError(
                    f"advanced index must be integer or boolean, "
                    f"got {i.type.dtype}"
                )
        out_ndim = _fancy_output_ndim(x, self.idx_list, inputs)
        return Apply(
            self,
            [x] + [cast(i, "int64") if i.type.dtype in discrete_dtypes and i.type.dtype != "bool" else i for i in inputs],
            [TensorType(x.type.dtype, (None,) * out_ndim)()],
        )

    def perform(self, node, inputs, output_storage):
        x, *idx_inputs = inputs
        idx = _decode_fancy(self.idx_list, idx_inputs)
        output_storage[0][0] = np.asarray(x[idx])

    def connection_pattern(self, node):
        return [[True]] + [[False]] * (len(node.inputs) - 1)

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.shape import shape as tshape

        out = tshape(node.outputs[0])
        return [tuple(out[i] for i in range(node.outputs[0].type.ndim))]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.basic import zeros_like

        x, *idx_inputs = inputs
        (gz,) = output_grads
        gx = AdvancedIncSubtensor(self.idx_list)(zeros_like(x), gz, *idx_inputs)
        return [gx] + [DisconnectedType()() for _ in idx_inputs]


    def R_op(self, inputs, eval_points):
        # gather is linear: gather the tangent
        if eval_points[0] is None:
            return [None]
        return self.make_node(eval_points[0], *inputs[1:]).outputs
    def __str__(self):
        return "AdvancedSubtensor"


class AdvancedIncSubtensor(Op):
    """General fancy inc/set (reference ``subtensor.py:2647``)."""

    __props__ = ("idx_list", "set_instead_of_inc", "ignore_duplicates")

    def __init__(self, idx_list, set_instead_of_inc=False, ignore_duplicates=False):
        self.idx_list = tuple(idx_list)
        self.set_instead_of_inc = bool(set_instead_of_inc)
        self.ignore_duplicates = bool(ignore_duplicates)

    def make_node(self, x, y, *inputs):
        x = as_tensor_variable(x)
        y = as_tensor_variable(y)
        if y.type.dtype != x.type.dtype:
            y = cast(y, x.type.dtype)
        inputs = [as_tensor_variable(i) for i in inputs]
        for i in inputs:
            if i.type.dtype not in discrete_dtypes:
                raise TypeError(
                    f"advanced index must be integer or boolean, "
                    f"got {i.type.dtype}"
                )
        return Apply(self, [x, y] + list(inputs), [x.type()])

    def perform(self, node, inputs, output_storage):
        x, y, *idx_inputs = inputs
        idx = _decode_fancy(self.idx_list, idx_inputs)
        out = x.copy()
        if self.set_instead_of_inc or self.ignore_duplicates:
            if self.set_instead_of_inc:
                out[idx] = y
            else:
                out[idx] += y
        else:
            np.add.at(out, idx, y)
        output_storage[0][0] = out

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def connection_pattern(self, node):
        return [[True], [True]] + [[False]] * (len(node.inputs) - 2)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.basic import zeros_like

        x, y, *idx_inputs = inputs
        (gz,) = output_grads
        gy = AdvancedSubtensor(self.idx_list)(gz, *idx_inputs)
        gy = _sum_grad_over_bcasted_dims(y, gy)
        if self.set_instead_of_inc:
            gx = AdvancedIncSubtensor(self.idx_list, set_instead_of_inc=True)(
                gz, zeros_like(gy), *idx_inputs
            )
        else:
            gx = gz
        return [gx, gy] + [DisconnectedType()() for _ in idx_inputs]

    def __str__(self):
        verb = "Set" if self.set_instead_of_inc else "Inc"
        return f"Advanced{verb}Subtensor"


ARRAY = "array"


def _decode_fancy(idx_list, idx_inputs):
    it = iter(idx_inputs)
    out = []

    def get_scalar(e):
        if e is SYM:
            return int(next(it))
        return e

    for e in idx_list:
        if e == ARRAY:
            arr = np.asarray(next(it))
            out.append(arr)
        elif isinstance(e, slice):
            out.append(slice(get_scalar(e.start), get_scalar(e.stop), get_scalar(e.step)))
        else:
            out.append(get_scalar(e))
    return tuple(out)


def _fancy_output_ndim(x, idx_list, array_inputs) -> int:
    """NumPy advanced-indexing result rank (static shapes all None)."""
    arr_vars = _collect_array_vars(idx_list, array_inputs)
    consumed_dims = 0
    n_slices = 0
    for e in idx_list:
        if isinstance(e, slice):
            n_slices += 1
            consumed_dims += 1
        else:  # ARRAY marker or integer index
            consumed_dims += 1
    bcast_ndim = 0
    if arr_vars:
        # broadcast rank of the index arrays (bool mask of rank k indexes k
        # dims but contributes 1 result dim)
        bcast_ndim = int(
            np.max([1 if a.type.dtype == "bool" else a.type.ndim for a in arr_vars])
        )
        for a in arr_vars:
            if a.type.dtype == "bool":
                consumed_dims += a.type.ndim - 1
    rest = x.type.ndim - consumed_dims
    return bcast_ndim + n_slices + max(rest, 0)


def _iter_array_inputs(idx_list, inputs):
    it = iter(inputs)
    res = []
    for e in idx_list:
        if e == ARRAY:
            res.append(next(it))
        elif isinstance(e, slice):
            for p in (e.start, e.stop, e.step):
                if p is SYM:
                    next(it)
        elif e is SYM:
            next(it)
    return res


def _collect_array_vars(idx_list, inputs):
    return _iter_array_inputs(idx_list, inputs)


# ---------------------------------------------------------------------------
# user-facing indexing
# ---------------------------------------------------------------------------

def take_slice(x, args):
    """Implements ``TensorVariable.__getitem__`` (reference ``var.py``
    __getitem__ → Subtensor/AdvancedSubtensor dispatch)."""
    x = as_tensor_variable(x)
    if not isinstance(args, tuple):
        args = (args,)

    # symbolic slices (SliceType, reference tensor/type_other.py): a
    # MakeSlice output unpacks back to its components; a SliceConstant
    # folds to its python slice
    def _unwrap_slice(a):
        from aesara_tpu.graph.ir import Constant as _Const
        from aesara_tpu.tensor.type_other import MakeSlice, NoneTypeT, SliceType

        if not (hasattr(a, "type") and isinstance(a.type, SliceType)):
            return a
        if isinstance(a, _Const):
            return a.data
        if a.owner is not None and isinstance(a.owner.op, MakeSlice):
            parts = [
                None if isinstance(p.type, NoneTypeT) else p
                for p in a.owner.inputs
            ]
            # MakeSlice.perform pads TRAILING Nones: make_slice(2) is
            # slice(start=2), not slice(stop=2) as bare slice(*parts)
            # would give (review finding)
            while len(parts) < 3:
                parts.append(None)
            return slice(*parts)
        raise NotImplementedError(
            "free symbolic slice variables are not indexable; build "
            "them with make_slice(start, stop, step)")

    args = tuple(_unwrap_slice(a) for a in args)

    # expand Ellipsis — a rank-k boolean mask consumes k input dims
    # (review finding: counting it as 1 made '...' over-expand)
    n_real = sum(
        (_bool_ndim(a) if _is_bool_array(a) else 1)
        for a in args
        if a is not None and a is not Ellipsis
    )
    new_args = []
    for a in args:
        if a is Ellipsis:
            new_args.extend([slice(None)] * (x.type.ndim - n_real))
        else:
            new_args.append(a)
    args = new_args

    # extract newaxis positions (relative to the output)
    newaxis_pos = []
    stripped = []
    out_dim = 0
    for a in args:
        if a is None:
            newaxis_pos.append(out_dim)
            out_dim += 1
        else:
            stripped.append(a)
            if isinstance(a, slice) or _is_array_like(a):
                out_dim += 1  # approximation for position bookkeeping
    args = stripped

    if len([a for a in args if not _is_bool_array(a)]) + sum(
        _bool_ndim(a) for a in args if _is_bool_array(a)
    ) > x.type.ndim:
        raise IndexError(f"too many indices for {x.type}")

    advanced = any(_is_array_like(a) for a in args)
    if not advanced:
        if all(isinstance(a, slice) and a == slice(None) for a in args):
            res = x
        else:
            idx_list, inputs = encode_indices(args)
            res = Subtensor(idx_list)(x, *inputs)
    else:
        # single integer-vector index + leading position → AdvancedSubtensor1
        arr_positions = [i for i, a in enumerate(args) if _is_array_like(a)]
        if (
            len(arr_positions) == 1
            and arr_positions[0] == 0
            and not _is_bool_array(args[0])
            and _array_ndim(args[0]) == 1
            and all(isinstance(a, slice) and a == slice(None) for a in args[1:])
        ):
            res = AdvancedSubtensor1()(x, args[0])
        else:
            idx_list = []
            inputs = []
            for a in args:
                if _is_array_like(a):
                    idx_list.append(ARRAY)
                    v = as_tensor_variable(a)
                    if v.type.dtype == "bool":
                        pass  # kept as bool; perform handles it
                    inputs.append(v)
                elif isinstance(a, slice):
                    parts = []
                    for p in (a.start, a.stop, a.step):
                        if p is None:
                            parts.append(None)
                        else:
                            enc, cons = _norm_entry(p, inputs)
                            parts.append(enc)
                            inputs.extend(cons)
                    idx_list.append(slice(*parts))
                else:
                    enc, cons = _norm_entry(a, inputs)
                    idx_list.append(enc)
                    inputs.extend(cons)
            res = AdvancedSubtensor(tuple(idx_list))(x, *inputs)

    if newaxis_pos:
        from aesara_tpu.tensor.basic import expand_dims

        res = expand_dims(res, tuple(newaxis_pos))
    return res


def _is_array_like(a) -> bool:
    if isinstance(a, (list, np.ndarray)):
        return True
    if isinstance(a, Variable) and getattr(a.type, "ndim", 0) >= 1:
        return True
    if isinstance(a, Variable) and getattr(a.type, "dtype", "") == "bool":
        return True
    return False


def _is_bool_array(a) -> bool:
    if isinstance(a, np.ndarray) and a.dtype == np.bool_:
        return True
    if isinstance(a, Variable) and getattr(a.type, "dtype", None) == "bool" and a.type.ndim >= 1:
        return True
    return False


def _bool_ndim(a) -> int:
    if isinstance(a, np.ndarray):
        return a.ndim
    return a.type.ndim


def _array_ndim(a) -> int:
    if isinstance(a, Variable):
        return a.type.ndim
    return np.asarray(a).ndim


def take(x, indices, axis=None, mode="raise"):
    """numpy.take (reference ``subtensor.py`` take)."""
    x = as_tensor_variable(x)
    indices = as_tensor_variable(indices)
    if axis is None:
        flat = x.flatten()
        if indices.type.ndim == 1:
            return AdvancedSubtensor1()(flat, indices)
        from aesara_tpu.tensor.shape import reshape, shape_tuple

        res = AdvancedSubtensor1()(flat, indices.flatten())
        return reshape(res, shape_tuple(indices), ndim=indices.type.ndim)
    axis = int(axis) % x.type.ndim
    if axis == 0 and indices.type.ndim == 1:
        return AdvancedSubtensor1()(x, indices)
    full = [slice(None)] * axis + [indices]
    return take_slice(x, tuple(full))


# ---------------------------------------------------------------------------
# Dynamic (runtime-offset, static-length) slicing
# ---------------------------------------------------------------------------
#
# XLA requires static output shapes, so ``x[i*B:(i+1)*B]`` with a symbolic
# ``i`` cannot compile as a generic Subtensor.  But whenever the slice
# LENGTH is statically known (the tutorial minibatch idiom, KV-cache
# windows, ring buffers), the access is exactly ``lax.dynamic_slice``: a
# runtime offset with a compile-time window.  These two ops carry that
# static window, and a specialize rewrite (``tensor/rewriting/subtensor.py::
# local_affine_slice_to_dynamic``) converts eligible Subtensor/IncSubtensor
# nodes automatically — so the reference's logistic_sgd.py-style
# ``givens={x: data[index*B:(index+1)*B]}`` pattern compiles into ONE XLA
# program instead of failing on traced slice bounds.
#
# Semantics note (documented divergence from NumPy): runtime starts are
# CLAMPED into ``[0, dim - length]`` exactly like ``lax.dynamic_slice`` —
# (after wrapping a negative start once, jax-style), and an overhanging
# window slides back
# instead of shortening (a shorter result would be a dynamic shape, which
# XLA cannot express).  In-range accesses are identical to NumPy.
# Reference counterpart behaviorally: ``aesara/tensor/subtensor.py``
# Subtensor over symbolic scalars (executes any offset via per-node C code).


class DynamicSlice(Op):
    """Slice with runtime start offsets and static window ``lengths``.

    ``lengths`` is a tuple over the leading axes: an ``int`` means "window
    of that size starting at the next symbolic input"; ``None`` means the
    full axis is kept.  Trailing axes are kept whole.
    """

    __props__ = ("lengths",)

    def __init__(self, lengths):
        self.lengths = tuple(
            int(l) if l is not None else None for l in lengths
        )
        if not any(l is not None for l in self.lengths):
            raise ValueError("DynamicSlice needs at least one sized axis")

    def make_node(self, x, *starts):
        x = as_tensor_variable(x)
        n_dyn = sum(1 for l in self.lengths if l is not None)
        if len(starts) != n_dyn:
            raise ValueError(
                f"DynamicSlice{self.lengths} expects {n_dyn} starts, got {len(starts)}"
            )
        if len(self.lengths) > x.type.ndim:
            raise IndexError("too many dynamic-slice axes")
        starts = [cast(as_tensor_variable(s), "int64") for s in starts]
        if any(s.type.ndim != 0 for s in starts):
            raise TypeError("dynamic-slice starts must be scalars")
        out_shape = [
            (l if l is not None else x.type.shape[d])
            for d, l in enumerate(self.lengths)
        ]
        out_shape.extend(x.type.shape[len(self.lengths):])
        return Apply(
            self, [x] + starts, [TensorType(x.type.dtype, tuple(out_shape))()]
        )

    def _clamped_index(self, xshape, starts):
        it = iter(starts)
        idx = []
        for d, l in enumerate(self.lengths):
            if l is None:
                idx.append(slice(None))
            else:
                s = int(next(it))
                if s < 0:
                    # jax.lax.dynamic_slice wraps negative starts before
                    # clamping; mirror it so py oracle == XLA
                    s += xshape[d]
                s = min(max(s, 0), max(xshape[d] - l, 0))
                idx.append(slice(s, s + l))
        return tuple(idx)

    def perform(self, node, inputs, output_storage):
        x, *starts = inputs
        idx = self._clamped_index(x.shape, starts)
        output_storage[0][0] = np.asarray(x[idx])

    def infer_shape(self, fgraph, node, input_shapes):
        xshape = input_shapes[0]
        out = [
            (constant(l, dtype="int64") if l is not None else xshape[d])
            for d, l in enumerate(self.lengths)
        ]
        out.extend(xshape[len(self.lengths):])
        return [tuple(out)]

    def connection_pattern(self, node):
        return [[True]] + [[False]] * (len(node.inputs) - 1)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.basic import zeros_like

        x, *starts = inputs
        (gz,) = output_grads
        rest = [DisconnectedType()() for _ in starts]
        if x.type.dtype in discrete_dtypes:
            from aesara_tpu.gradient import grad_undefined

            return [grad_undefined(self, 0, x)] + rest
        gx = DynamicIncSubtensor(self.lengths)(zeros_like(x), gz, *starts)
        return [gx] + rest

    def R_op(self, inputs, eval_points):
        if eval_points[0] is None:
            return [None]
        return self.make_node(eval_points[0], *inputs[1:]).outputs

    def __str__(self):
        parts = [("?:?+%d" % l) if l is not None else ":" for l in self.lengths]
        return f"DynamicSlice{{{', '.join(parts)}}}"


class DynamicIncSubtensor(Op):
    """Set/add a static-length window of ``x`` at runtime offsets.

    The scatter dual of :class:`DynamicSlice`; lowers to
    ``lax.dynamic_update_slice`` (set) or slice-add-update (inc).  Same
    clamped-start semantics.
    """

    __props__ = ("lengths", "set_instead_of_inc", "inplace")

    def __init__(self, lengths, set_instead_of_inc: bool = False, inplace: bool = False):
        self.lengths = tuple(
            int(l) if l is not None else None for l in lengths
        )
        self.set_instead_of_inc = bool(set_instead_of_inc)
        self.inplace = bool(inplace)
        if inplace:
            self.destroy_map = {0: [0]}

    def make_node(self, x, y, *starts):
        x = as_tensor_variable(x)
        y = as_tensor_variable(y)
        n_dyn = sum(1 for l in self.lengths if l is not None)
        if len(starts) != n_dyn:
            raise ValueError(
                f"DynamicIncSubtensor{self.lengths} expects {n_dyn} starts"
            )
        starts = [cast(as_tensor_variable(s), "int64") for s in starts]
        if y.type.ndim != x.type.ndim:
            raise TypeError(
                f"window rank {y.type.ndim} must equal target rank {x.type.ndim}"
            )
        return Apply(self, [x, y] + starts, [x.type()])

    def perform(self, node, inputs, output_storage):
        x, y, *starts = inputs
        idx = DynamicSlice._clamped_index(self, x.shape, starts)
        out = x if self.inplace else x.copy()
        if self.set_instead_of_inc:
            out[idx] = y
        else:
            out[idx] += y
        output_storage[0][0] = out

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def connection_pattern(self, node):
        return [[True], [True]] + [[False]] * (len(node.inputs) - 2)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.basic import zeros_like

        x, y, *starts = inputs
        (gz,) = output_grads
        rest = [DisconnectedType()() for _ in starts]
        if self.set_instead_of_inc:
            gx = DynamicIncSubtensor(self.lengths, set_instead_of_inc=True)(
                gz, zeros_like(y), *starts
            )
        else:
            gx = gz
        gy = DynamicSlice(self.lengths)(gz, *starts)
        return [gx, gy] + rest

    def __str__(self):
        kind = "Set" if self.set_instead_of_inc else "Inc"
        parts = [("?:?+%d" % l) if l is not None else ":" for l in self.lengths]
        return f"Dynamic{kind}Subtensor{{{', '.join(parts)}}}"
