"""Compile-support ops: DeepCopyOp, ViewOp, FromFunctionOp/as_op
(reference ``aesara/compile/ops.py:149,37,286``)."""

from __future__ import annotations

import copy
from typing import Callable, Optional, Sequence

import numpy as np

from aesara_tpu.graph.ir import Apply, Variable
from aesara_tpu.graph.op import Op


class DeepCopyOp(Op):
    """Force a copy of the input at execution; protects function outputs
    from aliasing input/shared storage (reference ``ops.py:149``).  On the
    XLA path it is the identity: jitted programs always produce fresh
    buffers (the rewrite pipeline still inserts it for py-mode parity)."""

    __props__ = ()
    check_input = False

    def make_node(self, x):
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = copy.deepcopy(x) if not isinstance(x, np.ndarray) else x.copy()

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        return [output_grads[0]]

    def R_op(self, inputs, eval_points):
        return [eval_points[0]]

    def __str__(self):
        return "DeepCopyOp"


class ViewOp(Op):
    """Identity marking a view relationship (reference ``ops.py:37``)."""

    __props__ = ()
    view_map = {0: [0]}

    def make_node(self, x):
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        return [output_grads[0]]

    def R_op(self, inputs, eval_points):
        return [eval_points[0]]

    def __str__(self):
        return "ViewOp"


deep_copy_op = DeepCopyOp()
view_op = ViewOp()


class FromFunctionOp(Op):
    """Wrap a python function as an Op (reference ``ops.py`` as_op:286).
    Runs host-side; under jit it is wrapped in ``jax.pure_callback``."""

    def __init__(self, fn: Callable, itypes, otypes, infer_shape=None):
        self._fn = fn
        self.itypes = list(itypes)
        self.otypes = list(otypes)
        self._infer_shape = infer_shape
        self.__name__ = getattr(fn, "__name__", str(fn))

    def perform(self, node, inputs, output_storage):
        outs = self._fn(*inputs)
        if not isinstance(outs, (list, tuple)):
            outs = (outs,)
        for storage, o in zip(output_storage, outs):
            storage[0] = o

    def infer_shape(self, fgraph, node, input_shapes):
        if self._infer_shape is not None:
            return self._infer_shape(fgraph, node, input_shapes)
        raise NotImplementedError

    def __eq__(self, other):
        return type(self) is type(other) and self._fn == other._fn

    def __hash__(self):
        return hash((type(self), self._fn))

    def __str__(self):
        return f"FromFunctionOp{{{self.__name__}}}"


def as_op(itypes, otypes, infer_shape=None):
    """Decorator: python function → Op (reference ``ops.py:286``)."""
    if not isinstance(itypes, (list, tuple)):
        itypes = [itypes]
    if not isinstance(otypes, (list, tuple)):
        otypes = [otypes]

    def make_op(fn):
        return FromFunctionOp(fn, itypes, otypes, infer_shape)

    return make_op


class OutputGuard(ViewOp):
    """Protects outputs from inplace overwrite (reference ``OutputGuard``)
    — donation semantics make it a view here."""


output_guard = OutputGuard()


class UpdatePlaceholder(ViewOp):
    """Marks an input slot awaiting its update expression (reference)."""


def load_back(mod, name):
    """Unpickle helper resolving an attribute from a module (reference
    ``load_back``)."""
    import importlib

    return getattr(importlib.import_module(mod), name)


def register_deep_copy_op_c_code(typ, code, version=()):
    """No-op: register lowerings with @jax_funcify.register instead."""


def register_view_op_c_code(typ, code, version=()):
    """No-op: see register_deep_copy_op_c_code."""
