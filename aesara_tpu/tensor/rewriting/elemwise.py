"""Elemwise fusion: merge chains of Elemwise nodes into one
``Elemwise(Composite)`` (reference ``aesara/tensor/rewriting/elemwise.py``
FusionOptimizer:523-920, registered at optdb position 49, tag "fusion").

On TPU the payoff differs from the reference: XLA already fuses
elementwise HLO onto the VPU, so the Composite's roles here are
(a) collapsing node count before tracing (faster compiles) and
(b) providing the unit the Pallas kernel backend consumes
(``config.pallas_fusion``).

Deliberately absent from the reference's file: ``local_careduce_fusion``
(fusing a reduction into the C elemwise loop — XLA's reduce-fusion does
this natively) and ``InplaceElemwiseOptimizer`` (in-place C-loop
selection — superseded by whole-graph buffer donation).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from aesara_tpu.compile.mode import optdb
from aesara_tpu.graph.ir import Constant, Variable
from aesara_tpu.graph.rewriting.basic import GraphRewriter, copy_stack_trace
from aesara_tpu.scalar.composite import Composite
from aesara_tpu.scalar.ops import ScalarType
from aesara_tpu.tensor.elemwise import Elemwise


class FusionOptimizer(GraphRewriter):
    """Greedy maximal fusion of single-client Elemwise chains."""

    def add_requirements(self, fgraph):
        from aesara_tpu.graph.features import ReplaceValidate

        if not hasattr(fgraph, "replace_all_validate"):
            fgraph.attach_feature(ReplaceValidate())

    def apply(self, fgraph):
        from aesara_tpu.config import config

        if not config.tensor__local_elemwise_fusion:
            return 0
        n_fused = 0
        changed = True
        while changed:
            changed = False
            for node in reversed(fgraph.toposort()):
                if node not in fgraph.apply_nodes:
                    continue
                if not isinstance(node.op, Elemwise) or len(node.outputs) != 1:
                    continue
                absorbed, leaves = self._collect(fgraph, node)
                if len(absorbed) < 2:
                    continue
                replacement = self._build_composite(node, absorbed, leaves)
                if replacement is None:
                    continue
                try:
                    fgraph.replace_all_validate(
                        [(node.outputs[0], replacement)], reason="FusionOptimizer"
                    )
                except Exception:
                    continue
                n_fused += 1
                changed = True
                break
        return n_fused

    @staticmethod
    def _fusable_producer(fgraph, var, root_node) -> bool:
        node = var.owner
        if node is None or not isinstance(node.op, Elemwise):
            return False
        if len(node.outputs) != 1:
            return False
        if isinstance(node.op.scalar_op, Composite):
            return False  # fuse flat chains; nested composites re-fuse later
        clients = fgraph.clients.get(var, [])
        if len(clients) != 1:
            return False
        if var in fgraph.outputs:
            return False
        return True

    def _collect(self, fgraph, root):
        """DFS from root absorbing single-client Elemwise producers."""
        absorbed = []  # Apply nodes, root last
        leaves: List[Variable] = []
        seen = set()

        def visit(node):
            if id(node) in seen:
                return
            seen.add(id(node))
            for inp in node.inputs:
                if self._fusable_producer(fgraph, inp, root) and not isinstance(
                    root.op.scalar_op, Composite
                ):
                    visit(inp.owner)
                else:
                    # size-1 constants inline as scalar literals instead of
                    # becoming composite runtime inputs
                    if (
                        isinstance(inp, Constant)
                        and getattr(inp.data, "size", 2) == 1
                    ):
                        continue
                    if inp not in leaves:
                        leaves.append(inp)
            absorbed.append(node)

        visit(root)
        return absorbed, leaves

    @staticmethod
    def _build_composite(root, absorbed, leaves):
        # mirror the tensor subgraph as a scalar graph
        smap: Dict[Variable, Variable] = {}
        s_inputs = []
        for leaf in leaves:
            sv = ScalarType(leaf.type.dtype)()
            smap[leaf] = sv
            s_inputs.append(sv)
        for node in absorbed:  # already topologically ordered (post-order DFS)
            s_args = []
            for inp in node.inputs:
                if inp in smap:
                    s_args.append(smap[inp])
                elif isinstance(inp, Constant) and getattr(inp.data, "size", 2) == 1:
                    from aesara_tpu.scalar.ops import ScalarConstant

                    try:
                        s_args.append(
                            ScalarConstant(
                                ScalarType(inp.type.dtype),
                                np.asarray(inp.data).reshape(())[()],
                            )
                        )
                    except Exception:
                        return None
                else:
                    return None
            try:
                s_out = node.op.scalar_op(*s_args)
            except Exception:
                return None
            if isinstance(s_out, list):
                return None
            smap[node.outputs[0]] = s_out
        s_root = smap[root.outputs[0]]
        if len(s_inputs) == 0 or len(s_inputs) > 32:
            return None
        comp = Composite(s_inputs, [s_root])
        new_out = Elemwise(comp)(*leaves)
        if new_out.type != root.outputs[0].type:
            conv = root.outputs[0].type.convert_variable(new_out)
            if conv is None:
                return None
            new_out = conv
        copy_stack_trace(root.outputs[0], new_out)
        return new_out

    def __str__(self):
        return "FusionOptimizer"


optdb.register("elemwise_fusion", FusionOptimizer(), "fast_run", "fusion",
               position=49)


# ---------------------------------------------------------------------------
# composite/dimshuffle cleanups (reference elemwise.py:423,924)
# ---------------------------------------------------------------------------

from aesara_tpu.compile.mode import register_canonicalize, register_specialize
from aesara_tpu.graph.rewriting.basic import node_rewriter
from aesara_tpu.tensor.elemwise import DimShuffle


@node_rewriter([Elemwise])
def local_useless_composite(fgraph, node):
    """Elemwise(Composite) with dead outputs → a composite computing only
    the live ones (reference local_useless_composite:924) — dead scalar
    subgraphs otherwise still trace and compile."""
    if not isinstance(node.op.scalar_op, Composite) or len(node.outputs) < 2:
        return False
    comp = node.op.scalar_op
    used = [
        i
        for i, out in enumerate(node.outputs)
        if fgraph.clients.get(out) or out in fgraph.outputs
    ]
    if len(used) == len(node.outputs) or not used:
        return False
    new_comp = Composite(comp.inputs, [comp.outputs[i] for i in used])
    new_outs = Elemwise(new_comp)(*node.inputs)
    if not isinstance(new_outs, list):
        new_outs = [new_outs]
    repl = {}
    for pos, i in enumerate(used):
        conv = node.outputs[i].type.convert_variable(new_outs[pos])
        if conv is None:
            return False
        copy_stack_trace(node.outputs[i], conv)
        repl[node.outputs[i]] = conv
    return repl


register_specialize(local_useless_composite)


@node_rewriter([DimShuffle])
def local_useless_dimshuffle_makevector(fgraph, node):
    """MakeVector(a).dimshuffle(()) → a — unpack the singleton instead of
    packing then squeezing (reference
    local_useless_dimshuffle_makevector:423)."""
    from aesara_tpu.tensor.basic import MakeVector, as_tensor_variable, cast

    inner = node.inputs[0].owner
    if inner is None or not isinstance(inner.op, MakeVector):
        return False
    if node.op.new_order != () or len(inner.inputs) != 1:
        return False
    res = as_tensor_variable(inner.inputs[0])
    out = node.outputs[0]
    if res.type.dtype != out.type.dtype:
        res = cast(res, out.type.dtype)
    conv = out.type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(out, conv)
    return [conv]


register_canonicalize(local_useless_dimshuffle_makevector)
