"""The reference's pedagogical `Minimal` Op (reference
``sandbox/minimal.py``): an Op skeleton showing the make_node/perform
contract — kept as living documentation (and a test fixture) for
writing custom ops against this framework."""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.type import lscalar

__all__ = ["Minimal", "minimal"]


class Minimal(Op):
    """Takes any number of tensor inputs, returns the int64 scalar 0 —
    the smallest complete Op: inputs are validated/converted in
    make_node, outputs allocated by type, perform fills storage."""

    __props__ = ()

    def make_node(self, *args):
        args = [as_tensor_variable(a) for a in args]
        return Apply(self, args, [lscalar()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.int64(0)


minimal = Minimal()
