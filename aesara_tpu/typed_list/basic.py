"""Typed-list ops (reference ``aesara/typed_list/basic.py:69-645``)."""

from __future__ import annotations

import copy

import numpy as np

from aesara_tpu.graph.ir import Apply, Constant, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.type import TensorType
from aesara_tpu.typed_list.type import TypedListType


def _as_list_variable(x):
    if isinstance(x, Variable):
        if not isinstance(x.type, TypedListType):
            raise TypeError(f"{x} is not a typed list")
        return x
    raise TypeError("expected a TypedList variable")


class GetItem(Op):
    view_map = {0: [0]}
    __props__ = ("static_slice",)

    def __init__(self, static_slice=None):
        # (start, stop, step) of a python slice, or None for int indexing
        self.static_slice = static_slice

    def make_node(self, x, index=None):
        x = _as_list_variable(x)
        from aesara_tpu.tensor.basic import as_tensor_variable, cast

        if isinstance(index, slice):
            for part in (index.start, index.stop, index.step):
                if part is not None and not isinstance(part, (int,)):
                    raise TypeError(
                        "typed-list slices must have static int bounds"
                    )
            op = GetItem(
                static_slice=(index.start, index.stop, index.step)
            )
            return Apply(op, [x], [x.type()])
        if self.static_slice is not None and index is None:
            return Apply(self, [x], [x.type()])
        index = cast(as_tensor_variable(index), "int64")
        return Apply(self, [x, index], [x.type.ttype()])

    def perform(self, node, inputs, output_storage):
        if len(inputs) == 1:
            # review finding: slice bounds were discarded (every sliced
            # read returned the whole list)
            output_storage[0][0] = list(inputs[0])[slice(*self.static_slice)]
        else:
            output_storage[0][0] = inputs[0][int(inputs[1])]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, v) for i, v in enumerate(inputs)]


def getitem(x, index):
    return GetItem()(x, index)


class Append(Op):
    __props__ = ()

    def make_node(self, x, elem):
        x = _as_list_variable(x)
        elem = x.type.ttype.filter_variable(elem, allow_convert=True)
        return Apply(self, [x, elem], [x.type()])

    def perform(self, node, inputs, output_storage):
        lst, e = inputs
        output_storage[0][0] = list(lst) + [e]


def append(x, elem):
    return Append()(x, elem)


class Extend(Op):
    __props__ = ()

    def make_node(self, x, other):
        x = _as_list_variable(x)
        other = _as_list_variable(other)
        if x.type != other.type:
            raise TypeError("extend needs lists of the same type")
        return Apply(self, [x, other], [x.type()])

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        output_storage[0][0] = list(a) + list(b)


def extend(x, other):
    return Extend()(x, other)


class Insert(Op):
    __props__ = ()

    def make_node(self, x, index, elem):
        x = _as_list_variable(x)
        from aesara_tpu.tensor.basic import as_tensor_variable, cast

        index = cast(as_tensor_variable(index), "int64")
        elem = x.type.ttype.filter_variable(elem, allow_convert=True)
        return Apply(self, [x, index, elem], [x.type()])

    def perform(self, node, inputs, output_storage):
        lst, idx, e = inputs
        res = list(lst)
        res.insert(int(idx), e)
        output_storage[0][0] = res


def insert(x, index, elem):
    return Insert()(x, index, elem)


class Remove(Op):
    __props__ = ()

    def make_node(self, x, elem):
        x = _as_list_variable(x)
        elem = x.type.ttype.filter_variable(elem, allow_convert=True)
        return Apply(self, [x, elem], [x.type()])

    def perform(self, node, inputs, output_storage):
        lst, e = inputs
        res = list(lst)
        for i, v in enumerate(res):
            if np.array_equal(np.asarray(v), np.asarray(e)):
                del res[i]
                break
        else:
            raise ValueError("value not in list")
        output_storage[0][0] = res


def remove(x, elem):
    return Remove()(x, elem)


class Reverse(Op):
    __props__ = ()

    def make_node(self, x):
        x = _as_list_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = list(reversed(inputs[0]))


def reverse(x):
    return Reverse()(x)


class Length(Op):
    __props__ = ()

    def make_node(self, x):
        x = _as_list_variable(x)
        return Apply(self, [x], [TensorType("int64", ())()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.int64(len(inputs[0]))


def length(x):
    return Length()(x)


class Count(Op):
    __props__ = ()

    def make_node(self, x, elem):
        x = _as_list_variable(x)
        elem = x.type.ttype.filter_variable(elem, allow_convert=True)
        return Apply(self, [x, elem], [TensorType("int64", ())()])

    def perform(self, node, inputs, output_storage):
        lst, e = inputs
        output_storage[0][0] = np.int64(
            sum(1 for v in lst if np.array_equal(np.asarray(v), np.asarray(e)))
        )


def count(x, elem):
    return Count()(x, elem)


class MakeList(Op):
    __props__ = ()

    def make_node(self, *elems):
        if not elems:
            raise ValueError("make_list needs at least one element")
        from aesara_tpu.tensor.basic import as_tensor_variable

        elems = [as_tensor_variable(e) if not isinstance(e, Variable) else e
                 for e in elems]
        t0 = elems[0].type
        for e in elems[1:]:
            if e.type != t0:
                raise TypeError("make_list elements must share a type")
        return Apply(self, list(elems), [TypedListType(t0)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = list(inputs)


def make_list(elems):
    return MakeList()(*elems)


from aesara_tpu.typed_list.type import (  # noqa: E402  (single definition)
    TypedListConstant,
    TypedListVariable,
)


class Index(Op):
    """Position of an element in the list (reference ``Index`` op)."""

    __props__ = ()

    def make_node(self, lst, e):
        from aesara_tpu.tensor.type import TensorType

        lst = _as_list_variable(lst)
        e = lst.type.ttype.filter_variable(e, allow_convert=True)
        return Apply(self, [lst, e], [TensorType("int64", ())()])

    def perform(self, node, inputs, output_storage):
        lst, e = inputs
        for i, item in enumerate(lst):
            if np.array_equal(np.asarray(item), np.asarray(e)):
                output_storage[0][0] = np.asarray(i, dtype="int64")
                return
        raise ValueError("element not in the typed list")


def index_(x, elem):
    return Index()(x, elem)





#: reference helper name
as_typed_list = _as_list_variable
