"""Sort/argsort/topk (reference ``aesara/tensor/sort.py``: SortOp:27,
ArgSortOp:160, TopKOp:309)."""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable, cast
from aesara_tpu.tensor.type import TensorType


__all__ = ["SortOp", "sort", "ArgSortOp", "argsort", "TopKOp", "topk",
           "argtopk", "topk_and_argtopk"]


class SortOp(Op):
    """(reference ``sort.py:27``)"""

    __props__ = ("kind", "order")

    def __init__(self, kind="quicksort", order=None):
        self.kind = kind
        self.order = order

    def make_node(self, x, axis):
        x = as_tensor_variable(x)
        axis = cast(as_tensor_variable(axis), "int64")
        return Apply(self, [x, axis], [x.type()])

    def perform(self, node, inputs, output_storage):
        x, axis = inputs
        output_storage[0][0] = np.sort(x, int(axis), self.kind, self.order)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def grad(self, inputs, output_grads):
        # route grads back through the inverse permutation
        from aesara_tpu.gradient import DisconnectedType

        x, axis = inputs
        (gz,) = output_grads
        idx = ArgSortOp(self.kind, self.order)(x, axis)
        from aesara_tpu.tensor.basic import arange, expand_dims
        from aesara_tpu.tensor.subtensor import take_slice

        if x.type.ndim == 1:
            from aesara_tpu.tensor.basic import zeros_like
            from aesara_tpu.tensor.subtensor import AdvancedIncSubtensor1

            gx = AdvancedIncSubtensor1()(zeros_like(x), gz, idx)
            return [gx, DisconnectedType()()]
        # ndim > 1: gx = gz gathered by the inverse permutation along
        # axis; argsort(argsort(x)) ranks each element, i.e. where its
        # cotangent landed in the sorted output
        from aesara_tpu.tensor.basic import (
            NotScalarConstantError,
            get_scalar_constant_value,
            take_along_axis,
        )

        try:
            static_axis = int(get_scalar_constant_value(axis))
        except NotScalarConstantError:
            from aesara_tpu.gradient import grad_not_implemented

            return [
                grad_not_implemented(
                    self, 0, x, "sort grad needs a constant axis"
                ),
                DisconnectedType()(),
            ]
        ranks = ArgSortOp(self.kind, self.order)(idx, axis)
        gx = take_along_axis(gz, ranks, axis=static_axis)
        return [gx, DisconnectedType()()]


def sort(x, axis=-1, kind="quicksort", order=None):
    if axis is None:
        # numpy semantics: flatten, then sort (review finding: None
        # crashed in make_node)
        x = as_tensor_variable(x).flatten()
        axis = 0
    return SortOp(kind, order)(x, axis)


class ArgSortOp(Op):
    """(reference ``sort.py:160``)"""

    __props__ = ("kind", "order")

    def __init__(self, kind="quicksort", order=None):
        self.kind = kind
        self.order = order

    def make_node(self, x, axis):
        x = as_tensor_variable(x)
        axis = cast(as_tensor_variable(axis), "int64")
        return Apply(self, [x, axis], [TensorType("int64", x.type.shape)()])

    def perform(self, node, inputs, output_storage):
        x, axis = inputs
        output_storage[0][0] = np.argsort(x, int(axis), self.kind, self.order).astype(np.int64)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType, grad_undefined

        return [grad_undefined(self, 0, inputs[0]), DisconnectedType()()]


def argsort(x, axis=-1, kind="quicksort", order=None):
    if axis is None:
        x = as_tensor_variable(x).flatten()
        axis = 0
    return ArgSortOp(kind, order)(x, axis)


class TopKOp(Op):
    """top-k values and/or indices along the last axis
    (reference ``sort.py:309``)."""

    __props__ = ("axis", "sorted", "return_values", "return_indices", "idx_dtype")

    def __init__(self, axis=-1, sorted=True, return_values=True,
                 return_indices=True, idx_dtype="int64"):
        self.axis = int(axis)
        self.sorted = bool(sorted)
        self.return_values = bool(return_values)
        self.return_indices = bool(return_indices)
        self.idx_dtype = idx_dtype
        if not (return_values or return_indices):
            raise ValueError("need values and/or indices")

    def make_node(self, x, k):
        from aesara_tpu.tensor.basic import NotScalarConstantError, get_scalar_constant_value

        x = as_tensor_variable(x)
        k = cast(as_tensor_variable(k), "int64")
        ax = self.axis % x.type.ndim
        shape = list(x.type.shape)
        try:
            k_static = int(get_scalar_constant_value(k))
            if k_static == 0:
                raise ValueError("topk: k must be nonzero")
            # negative k = bottom-|k| (reference semantics); the output
            # dim is |k| either way (review finding: -2 leaked into the
            # static shape and the partition pivot)
            shape[ax] = abs(k_static)
        except NotScalarConstantError:
            shape[ax] = None
        outs = []
        if self.return_values:
            outs.append(TensorType(x.type.dtype, tuple(shape))())
        if self.return_indices:
            outs.append(TensorType(self.idx_dtype, tuple(shape))())
        return Apply(self, [x, k], outs)

    def perform(self, node, inputs, output_storage):
        x, k = inputs
        k = int(k)
        if k == 0:
            raise ValueError("topk: k must be nonzero")
        ax = self.axis % x.ndim
        kk = abs(k)
        # monotone-reversing key valid for every dtype: bitwise-not for
        # bool/ints (negation wraps for unsigned — review finding),
        # negation for floats; bottom-|k| (k < 0) sorts by x itself
        if x.dtype.kind in "bui":
            rev = np.invert(x)
        else:
            rev = -x
        key = rev if k > 0 else x
        idx = np.argpartition(key, min(kk, x.shape[ax]) - 1, axis=ax)
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(0, kk)
        idx = idx[tuple(sl)]
        if self.sorted:
            kvals = np.take_along_axis(key, idx, axis=ax)
            order = np.argsort(kvals, axis=ax, kind="stable")
            idx = np.take_along_axis(idx, order, axis=ax)
        vals = np.take_along_axis(x, idx, axis=ax)
        pos = 0
        if self.return_values:
            output_storage[pos][0] = vals
            pos += 1
        if self.return_indices:
            output_storage[pos][0] = idx.astype(self.idx_dtype)

    def L_op(self, inputs, outputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType, grad_undefined
        from aesara_tpu.tensor.basic import arange, zeros_like
        from aesara_tpu.tensor.subtensor import inc_subtensor

        x, k = inputs
        # the value gradient scatters back to the selected positions
        if self.return_indices:
            idx = outputs[-1]
        else:
            idx = TopKOp(self.axis, self.sorted, False, True,
                         self.idx_dtype)(x, k)
        gz = output_grads[0]
        if isinstance(getattr(gz, "type", None), type(None)):
            return [grad_undefined(self, 0, x), DisconnectedType()()]
        nd = x.type.ndim
        ax = self.axis % nd
        index = []
        for d in range(nd):
            if d == ax:
                index.append(idx)
            else:
                order = ["x"] * nd
                order[d] = 0
                index.append(arange(0, idx.shape[d]).dimshuffle(*order))
        gx = inc_subtensor(zeros_like(x)[tuple(index)], gz)
        return [gx, DisconnectedType()()]


def topk(x, kth, axis=-1, sorted=True, idx_dtype="int64"):
    return TopKOp(axis, sorted, True, False, idx_dtype)(x, kth)


def argtopk(x, kth, axis=-1, sorted=True, idx_dtype="int64"):
    return TopKOp(axis, sorted, False, True, idx_dtype)(x, kth)


def topk_and_argtopk(x, kth, axis=-1, sorted=True, idx_dtype="int64"):
    return TopKOp(axis, sorted, True, True, idx_dtype)(x, kth)
