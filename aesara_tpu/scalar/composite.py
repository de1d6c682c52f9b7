"""``Composite``: a scalar sub-graph fused into one op — the unit of
elemwise fusion (reference ``aesara/scalar/basic.py:3987``).

In the reference a Composite emits one C loop; here Elemwise(Composite)
is the target the Pallas fusion backend consumes (one VPU kernel per
fused chain) and the XLA path inlines it as a jax closure.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Apply, Constant, Variable, clone, graph_inputs, io_toposort
from aesara_tpu.scalar.ops import ScalarOp, ScalarType, _np_dtype


__all__ = ["Composite"]


class Composite(ScalarOp):
    """A fused scalar computation with ``len(inputs)`` ins and
    ``len(outputs)`` outs."""

    init_param = ("inputs", "outputs")

    def __init__(self, inputs: Sequence[Variable], outputs: Sequence[Variable], name=None):
        self.inputs, self.outputs = clone(list(inputs), list(outputs))
        self.inputs_type = tuple(i.type for i in self.inputs)
        self.outputs_type = tuple(o.type for o in self.outputs)
        self.nin = len(inputs)
        self.nout = len(outputs)
        self.name = name or self._make_name()
        self._fgraph = None
        self._py_impl = None

    @property
    def fgraph(self) -> FunctionGraph:
        if self._fgraph is None:
            self._fgraph = FunctionGraph(self.inputs, self.outputs, clone=False)
        return self._fgraph

    def _make_name(self) -> str:
        node_ops = sorted(
            {str(v.owner.op) for v in self.outputs if v.owner is not None}
        )
        return f"Composite{{{','.join(node_ops[:4])}{'...' if len(node_ops) > 4 else ''}}}"

    def output_types_preference(self, *in_types):
        if tuple(in_types) != self.inputs_type:
            raise TypeError(
                f"{self.name} built for input types {self.inputs_type}, "
                f"got {in_types}"
            )
        return self.outputs_type

    def make_node(self, *inputs):
        from aesara_tpu.scalar.ops import as_scalar

        inputs = [as_scalar(i) for i in inputs]
        if len(inputs) != self.nin:
            raise ValueError(f"{self.name} expects {self.nin} inputs")
        return Apply(self, inputs, [t() for t in self.outputs_type])

    def impl(self, *values):
        if self._py_impl is None:
            order = io_toposort(self.inputs, self.outputs)

            def run(*vals):
                env = {}
                for var, v in zip(self.inputs, vals):
                    env[var] = v
                for node in order:
                    ins = [
                        env[i] if i in env else i.data for i in node.inputs
                    ]
                    res = node.op.impl(*ins)
                    if node.op.nout == 1:
                        res = (res,)
                    for o, r in zip(node.outputs, res):
                        env[o] = r
                outs = tuple(
                    env[o] if o in env else o.data for o in self.outputs
                )
                return outs if len(outs) > 1 else outs[0]

            self._py_impl = run
        return self._py_impl(*values)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad as sym_grad
        from aesara_tpu.graph.ir import clone_replace

        known = dict(zip(self.outputs, output_grads))
        # gradient graph over the inner scalar vars, then substitute the
        # caller's actual scalar inputs
        replace = dict(zip(self.inputs, inputs))
        # clone the known-grads targets into the caller's graph context
        igrads = sym_grad(
            None, list(self.inputs),
            known_grads={
                o: g for o, g in known.items()
            },
            disconnected_inputs="ignore", return_disconnected="zero",
        )
        if not isinstance(igrads, list):
            igrads = [igrads]
        return clone_replace(igrads, replace=replace)

    def __eq__(self, other):
        if self is other:
            return True
        if (
            type(other) is not Composite
            or self.nin != other.nin
            or self.nout != other.nout
        ):
            return False
        from aesara_tpu.graph.ir import equal_computations

        return equal_computations(
            self.outputs, other.outputs, self.inputs, other.inputs
        )

    def __hash__(self):
        return hash((Composite, self.nin, self.nout, self.inputs_type, self.outputs_type))

    def __str__(self):
        return self.name


class Compositef32(Composite):
    """float32-variant Composite (reference ``scalar/basic.py:4366``):
    identical computation with float64 leaf types narrowed to float32 —
    on TPU this is the default world, so it is a thin subclass kept for
    API parity."""

    @classmethod
    def from_composite(cls, comp: "Composite") -> "Compositef32":
        """Rebuild the inner graph so the MATH runs in float32 — the ops
        are re-applied on narrowed inputs and re-infer f32 output dtypes
        (review finding: substituting inputs and casting back up kept
        every inner op in float64)."""
        import numpy as np

        from aesara_tpu import scalar as aes
        from aesara_tpu.graph.ir import Constant, io_toposort
        from aesara_tpu.scalar.ops import ScalarConstant, ScalarType

        mapping: dict = {}
        new_inputs = []
        for i in comp.inputs:
            ni = (ScalarType("float32")() if i.type.dtype == "float64"
                  else i.clone())
            mapping[i] = ni
            new_inputs.append(ni)
        for node in io_toposort(comp.inputs, comp.outputs):
            args = []
            for inp in node.inputs:
                if inp in mapping:
                    args.append(mapping[inp])
                elif isinstance(inp, Constant):
                    if inp.type.dtype == "float64":
                        args.append(ScalarConstant(
                            ScalarType("float32"), np.float32(inp.data)
                        ))
                    else:
                        args.append(inp)
                else:
                    args.append(inp)
            op = node.op
            if isinstance(op, aes.ops.Cast) and op.o_type.dtype == "float64":
                op = aes.ops.Cast(ScalarType("float32"))
            res = op(*args)
            res_list = res if isinstance(res, list) else [res]
            for old, new in zip(node.outputs, res_list):
                mapping[old] = new
        new_outputs = [mapping[o] for o in comp.outputs]
        return cls(new_inputs, new_outputs, name=comp.name + "_f32")
