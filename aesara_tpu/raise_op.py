"""Graph-embedded runtime checks (reference ``aesara/raise_op.py``:
CheckAndRaise:28, Assert:168)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable


__all__ = ["CheckAndRaise", "Assert", "assert_op"]


class ExceptionType:  # parity shim for pickling exception classes
    pass


class CheckAndRaise(Op):
    """Pass through value; raise ``exc_type(msg)`` if any condition is
    false.  py mode enforces; under XLA the check lowers to
    ``jax.debug.check``-style error only when feasible — by default the
    value passes through (XLA programs cannot raise host exceptions), the
    same behavior as the reference's JAX backend."""

    __props__ = ("msg", "exc_type")
    view_map = {0: [0]}

    def __init__(self, exc_type=AssertionError, msg=""):
        self.exc_type = exc_type
        self.msg = msg

    def make_node(self, value, *conds):
        value = as_tensor_variable(value)
        conds = [as_tensor_variable(c) for c in conds]
        # array conditions reduce with all() — reference semantics
        # (review finding: non-scalars were rejected at build time)
        return Apply(self, [value] + conds, [value.type()])

    def perform(self, node, inputs, output_storage):
        value, *conds = inputs
        for c in conds:
            if not np.all(c):
                raise self.exc_type(self.msg)
        output_storage[0][0] = value

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def connection_pattern(self, node):
        return [[True]] + [[False]] * (len(node.inputs) - 1)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        (gz,) = output_grads
        return [gz] + [DisconnectedType()() for _ in inputs[1:]]

    def __str__(self):
        return f"CheckAndRaise{{{self.exc_type.__name__}({self.msg})}}"


class Assert(CheckAndRaise):
    """(reference ``raise_op.py:168``)"""

    def __init__(self, msg="Aesara Assert failed!"):
        super().__init__(AssertionError, msg)

    def __str__(self):
        return f"Assert{{msg={self.msg}}}"


assert_op = Assert()


#: reference module attribute: default exception class for CheckAndRaise
exception_type = AssertionError
