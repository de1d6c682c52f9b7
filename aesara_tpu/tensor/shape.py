"""Shape ops: ``Shape``, ``Shape_i``, ``SpecifyShape``, ``Reshape``.

Re-design of the reference's ``aesara/tensor/shape.py`` (Shape:47,
Shape_i:189, SpecifyShape:381, Reshape:589, Unbroadcast:939).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.graph.ir import Apply, Constant, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.type import TensorType


__all__ = [
    "Shape", "Shape_i", "SpecifyShape", "Reshape", "Unbroadcast",
    "shape", "shape_i", "specify_shape", "reshape", "shape_padleft",
    "shape_padright", "shape_padaxis", "unbroadcast", "shape_tuple",
]


class Shape(Op):
    """Runtime shape as an int64 vector (reference ``shape.py:47``)."""

    __props__ = ()

    def make_node(self, x):
        from aesara_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        return Apply(self, [x], [TensorType("int64", (x.type.ndim,))()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(np.shape(inputs[0]), dtype=np.int64)

    def infer_shape(self, fgraph, node, input_shapes):
        return [(node.inputs[0].type.ndim,)]

    def connection_pattern(self, node):
        return [[False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        return [DisconnectedType()()]


    def R_op(self, inputs, eval_points):
        return [None]  # integer output: no tangent

_shape_op = Shape()


def shape(x):
    """Symbolic shape vector; folds known dims where possible."""
    from aesara_tpu.tensor.basic import as_tensor_variable

    x = as_tensor_variable(x)
    return _shape_op(x)


def shape_tuple(x) -> tuple:
    """Tuple of per-dim symbolic sizes (static dims as constants)."""
    from aesara_tpu.tensor.basic import as_tensor_variable, constant

    x = as_tensor_variable(x)
    return tuple(
        constant(s, dtype="int64") if s is not None else shape_i(x, d)
        for d, s in enumerate(x.type.shape)
    )


class Shape_i(Op):
    """One dimension of a runtime shape (reference ``shape.py:189``)."""

    __props__ = ("i",)

    def __init__(self, i: int):
        self.i = int(i)

    def make_node(self, x):
        from aesara_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        if not (0 <= self.i < x.type.ndim):
            raise ValueError(f"axis {self.i} out of range for {x.type}")
        return Apply(self, [x], [TensorType("int64", ())()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(np.shape(inputs[0])[self.i], dtype=np.int64)

    def infer_shape(self, fgraph, node, input_shapes):
        return [()]

    def connection_pattern(self, node):
        return [[False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        return [DisconnectedType()()]


    def R_op(self, inputs, eval_points):
        return [None]  # integer output: no tangent
    def __str__(self):
        return f"Shape_i{{{self.i}}}"


def shape_i(x, i: int):
    """Fold to a constant when the static shape knows dim i."""
    from aesara_tpu.tensor.basic import as_tensor_variable, constant

    x = as_tensor_variable(x)
    s = x.type.shape[i]
    if s is not None:
        return constant(s, dtype="int64")
    return Shape_i(i)(x)


class SpecifyShape(Op):
    """Assert/attach static shape info at runtime (reference ``shape.py:381``)."""

    __props__ = ()
    view_map = {0: [0]}

    def make_node(self, x, *shape):
        from aesara_tpu.tensor.basic import (
            NotScalarConstantError,
            as_tensor_variable,
            cast,
            constant,
            get_scalar_constant_value,
        )

        x = as_tensor_variable(x)
        if len(shape) != x.type.ndim:
            raise ValueError(
                f"SpecifyShape: got {len(shape)} dims for ndim {x.type.ndim}"
            )
        shape_vars = []
        static = []
        for d, s in enumerate(shape):
            if s is None:
                static.append(x.type.shape[d])
                shape_vars.append(constant(-1, dtype="int64"))
                continue
            if isinstance(s, (int, np.integer)):
                static.append(int(s))
                shape_vars.append(constant(int(s), dtype="int64"))
                continue
            s = as_tensor_variable(s)
            try:
                static.append(int(get_scalar_constant_value(s)))
            except NotScalarConstantError:
                static.append(x.type.shape[d])
            shape_vars.append(cast(s, "int64"))
        # merge with existing knowledge
        merged = []
        for d, (old, new) in enumerate(zip(x.type.shape, static)):
            if old is not None and new is not None and old != new:
                raise TypeError(
                    f"SpecifyShape conflict at dim {d}: {old} vs {new}"
                )
            merged.append(new if new is not None else old)
        out_type = TensorType(x.type.dtype, tuple(merged))
        return Apply(self, [x] + shape_vars, [out_type()])

    def perform(self, node, inputs, output_storage):
        x, *shp = inputs
        for d, s in enumerate(shp):
            s = int(s)
            if s != -1 and x.shape[d] != s:
                raise AssertionError(
                    f"SpecifyShape: dim {d} is {x.shape[d]}, expected {s}"
                )
        output_storage[0][0] = x

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.basic import constant

        xshape = input_shapes[0]
        out = []
        for d, s in enumerate(node.outputs[0].type.shape):
            if s is not None:
                out.append(constant(s, dtype="int64"))
            else:
                out.append(xshape[d])
        return [tuple(out)]

    def connection_pattern(self, node):
        return [[True]] + [[False]] * (len(node.inputs) - 1)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        (gz,) = output_grads
        return [gz] + [DisconnectedType()() for _ in inputs[1:]]


    def R_op(self, inputs, eval_points):
        # linear in the data input: re-apply on the tangent
        if eval_points[0] is None:
            return [None]
        return self.make_node(eval_points[0], *inputs[1:]).outputs

_specify_shape = SpecifyShape()


def specify_shape(x, shape):
    if not isinstance(shape, (list, tuple)):
        shape = (shape,)
    return _specify_shape(x, *shape)


class Reshape(Op):
    """numpy.reshape with symbolic target shape (reference ``shape.py:589``)."""

    __props__ = ("ndim",)
    view_map = {0: [0]}

    def __init__(self, ndim: int):
        self.ndim = int(ndim)

    def make_node(self, x, shp):
        from aesara_tpu.tensor.basic import (
            NotScalarConstantError,
            as_tensor_variable,
            cast,
            get_scalar_constant_value,
            get_underlying_constant_vector,
            stack,
        )

        x = as_tensor_variable(x)
        if isinstance(shp, (list, tuple)):
            shp = stack([cast(as_tensor_variable(s), "int64") for s in shp]) \
                if shp else as_tensor_variable(np.asarray([], dtype="int64"))
        shp = cast(as_tensor_variable(shp), "int64")
        if shp.type.ndim != 1:
            raise TypeError("reshape target must be a vector")
        static = [None] * self.ndim
        try:
            vals = get_underlying_constant_vector(shp)
            for d, v in enumerate(vals):
                static[d] = int(v) if int(v) != -1 else None
        except NotScalarConstantError:
            # partially-known: extract the constant elements of a
            # MakeVector target individually (a grad-graph reshape to
            # (n, 1) keeps its static trailing 1 this way, which the
            # sparse BSS bridge's narrow-rhs gate relies on)
            mk = shp.owner
            from aesara_tpu.tensor.basic import MakeVector

            if mk is not None and isinstance(mk.op, MakeVector) and len(
                mk.inputs
            ) == self.ndim:
                for d, el in enumerate(mk.inputs):
                    try:
                        v = int(get_scalar_constant_value(el))
                        static[d] = v if v != -1 else None
                    except NotScalarConstantError:
                        pass
            elif (
                mk is not None
                and isinstance(mk.op, Shape)
                and mk.inputs[0].type.ndim == self.ndim
            ):
                # reshape(g, shape(x)): inherit x's static dims (the
                # grad-of-reshape construction)
                static = list(mk.inputs[0].type.shape)
        # resolve a single -1 when total size is known
        if (
            static.count(None) == 1
            and all(s is not None for s in x.type.shape)
        ):
            total = int(np.prod([s for s in x.type.shape])) if x.type.ndim else 1
            known = int(np.prod([s for s in static if s is not None])) if any(
                s is not None for s in static
            ) else 1
            if known > 0 and total % known == 0:
                static[static.index(None)] = total // known
        out_type = TensorType(x.type.dtype, tuple(static))
        return Apply(self, [x, shp], [out_type()])

    def perform(self, node, inputs, output_storage):
        x, shp = inputs
        output_storage[0][0] = np.reshape(x, tuple(int(s) for s in shp))

    def infer_shape(self, fgraph, node, input_shapes):
        from aesara_tpu.tensor.basic import constant, switch
        from aesara_tpu.tensor.math import eq, prod as tprod, true_div
        from aesara_tpu.tensor.basic import cast as tcast

        xshape = input_shapes[0]
        shp = node.inputs[1]
        out = []
        # total elements of input
        if len(xshape):
            total = xshape[0]
            for s in xshape[1:]:
                total = total * s
        else:
            total = constant(1, dtype="int64")
        if self.ndim == 0:
            return [()]
        known_prod = constant(1, dtype="int64")
        for d in range(self.ndim):
            known_prod = known_prod * switch(eq(shp[d], -1), constant(1, dtype="int64"), shp[d])
        for d in range(self.ndim):
            out.append(
                switch(
                    eq(shp[d], -1),
                    tcast(true_div(total, known_prod), "int64"),
                    shp[d],
                )
            )
        return [tuple(out)]

    def connection_pattern(self, node):
        return [[True], [False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        x, _ = inputs
        (gz,) = output_grads
        return [reshape(gz, shape(x), ndim=x.type.ndim), DisconnectedType()()]


    def R_op(self, inputs, eval_points):
        # linear in the data input: re-apply on the tangent
        if eval_points[0] is None:
            return [None]
        return self.make_node(eval_points[0], *inputs[1:]).outputs
    def __str__(self):
        return f"Reshape{{{self.ndim}}}"


def reshape(x, newshape, ndim: Optional[int] = None):
    from aesara_tpu.tensor.basic import as_tensor_variable, get_vector_length

    if ndim is None:
        if isinstance(newshape, (list, tuple)):
            ndim = len(newshape)
        else:
            newshape = as_tensor_variable(newshape)
            try:
                ndim = get_vector_length(newshape)
            except ValueError:
                raise ValueError(
                    "reshape: cannot infer output ndim; pass ndim explicitly"
                )
    return Reshape(int(ndim))(x, newshape)


def shape_padleft(t, n_ones: int = 1):
    from aesara_tpu.tensor.elemwise import DimShuffle
    from aesara_tpu.tensor.basic import as_tensor_variable

    t = as_tensor_variable(t)
    pattern = ("x",) * n_ones + tuple(range(t.type.ndim))
    return DimShuffle(t.type.ndim, pattern)(t)


def shape_padright(t, n_ones: int = 1):
    from aesara_tpu.tensor.elemwise import DimShuffle
    from aesara_tpu.tensor.basic import as_tensor_variable

    t = as_tensor_variable(t)
    pattern = tuple(range(t.type.ndim)) + ("x",) * n_ones
    return DimShuffle(t.type.ndim, pattern)(t)


def shape_padaxis(t, axis: int):
    from aesara_tpu.tensor.basic import expand_dims

    return expand_dims(t, axis)


class Unbroadcast(Op):
    """Erase static-1 info on given dims (reference ``shape.py:939``) —
    needed when joining branches whose shapes differ in 1-ness."""

    __props__ = ("axes",)
    view_map = {0: [0]}

    def __init__(self, *axis):
        self.axes = tuple(sorted(int(a) for a in axis))

    def make_node(self, x):
        from aesara_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        shape = list(x.type.shape)
        for a in self.axes:
            if a >= x.type.ndim:
                raise ValueError(f"axis {a} out of range")
            shape[a] = None
        return Apply(self, [x], [TensorType(x.type.dtype, tuple(shape))()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [specify_shape(gz, x.type.shape)]


    def R_op(self, inputs, eval_points):
        if eval_points[0] is None:
            return [None]
        return self.make_node(eval_points[0]).outputs

def unbroadcast(x, *axes):
    from aesara_tpu.tensor.basic import as_tensor_variable

    x = as_tensor_variable(x)
    real = [a for a in axes if x.type.shape[a] == 1]
    if not real:
        return x
    return Unbroadcast(*real)(x)


def shape_i_op(i: int):
    """Shape_i factory (reference ``shape.py shape_i_op``)."""
    return Shape_i(i)


def specify_broadcastable(x, *axes):
    """Assert the given axes have extent 1 (reference
    ``specify_broadcastable``): SpecifyShape with 1s at those axes."""
    from aesara_tpu.tensor.basic import as_tensor_variable

    x = as_tensor_variable(x)
    shp = [1 if d in axes or (d - x.type.ndim) in axes else None
           for d in range(x.type.ndim)]
    return specify_shape(x, shp)


__all__ += ["shape_i_op", "specify_broadcastable"]
