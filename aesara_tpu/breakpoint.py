"""PdbBreakpoint: drop into pdb when a condition fires at runtime
(reference ``aesara/breakpoint.py:9``)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable


class PdbBreakpoint(Op):
    """Monitors variables and opens pdb if the (scalar) condition is
    true.  py-path only (a debugger cannot run inside an XLA program)."""

    __props__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def make_node(self, condition, *monitored):
        condition = as_tensor_variable(condition)
        monitored = [as_tensor_variable(m) for m in monitored]
        if not monitored:
            raise ValueError("PdbBreakpoint needs variables to monitor")
        return Apply(self, [condition] + monitored, [m.type() for m in monitored])

    def perform(self, node, inputs, output_storage):
        condition, *monitored = inputs
        if bool(np.asarray(condition)):
            try:
                monitored = [np.asarray(m) for m in monitored]
                print(f"\n PdbBreakpoint '{self.name}' triggered:")
                for i, m in enumerate(monitored):
                    print(f"  monitored[{i}] = {m!r}")
                import pdb

                pdb.set_trace()
            except KeyboardInterrupt:
                raise
        for storage, m in zip(output_storage, monitored):
            storage[0] = m

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes[1:]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        return [DisconnectedType()()] + list(output_grads)
