"""CVMLinker: the py-oracle schedule executed by the C++ VM
(reference ``link/vm.py:788`` VMLinker choosing the CVM)."""

from __future__ import annotations

from typing import Optional

from aesara_tpu.graph.ir import Constant
from aesara_tpu.link.basic import Container, LocalLinker, map_storage, raise_with_op


class CVMLinker(LocalLinker):
    """Per-node thunks driven by the compiled C++ VM; falls back to the
    Python loop when no toolchain is available."""

    def __init__(self, allow_gc: Optional[bool] = None, time_thunks: bool = False):
        super().__init__(allow_gc)
        self.time_thunks = time_thunks

    def make_all(self, input_storage=None, output_storage=None, storage_map=None):
        from aesara_tpu.link.c.build import get_cvm_module

        fgraph = self.fgraph
        order = fgraph.toposort()
        input_storage, output_storage, storage_map = map_storage(
            fgraph, order, input_storage, output_storage, storage_map
        )
        compute_map = {v: [False] for v in storage_map}
        thunks = []
        for node in order:
            thunk = node.op.make_py_thunk(node, storage_map, compute_map, [])
            thunk.node = node
            thunks.append(thunk)

        # gc: last-use clear lists per thunk
        clear_lists = []
        if self.allow_gc:
            last_user = {}
            for i, node in enumerate(order):
                for inp in node.inputs:
                    last_user[inp] = i
            protected = set(fgraph.inputs) | set(fgraph.outputs)
            for i, node in enumerate(order):
                clear_lists.append(tuple(
                    storage_map[inp]
                    for inp in node.inputs
                    if inp not in protected
                    and not isinstance(inp, Constant)
                    and last_user.get(inp) == i
                ))
        else:
            clear_lists = [() for _ in order]

        # dependency indices for lazy subset evaluation
        pos = {id(n): i for i, n in enumerate(order)}
        node_deps = [
            tuple(
                pos[id(inp.owner)]
                for inp in node.inputs
                if inp.owner is not None and id(inp.owner) in pos
            )
            for node in order
        ]

        input_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.inputs, input_storage)
        ]
        output_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.outputs, output_storage)
        ]

        mod = get_cvm_module()
        if mod is not None:
            vm = mod.CVM(
                tuple(thunks), tuple(clear_lists), tuple(node_deps),
                int(bool(self.allow_gc)), int(bool(self.time_thunks)),
            )

            def run():
                try:
                    vm()
                except Exception as e:
                    idx = getattr(e, "position_of_error", None)
                    if idx is not None and 0 <= idx < len(order):
                        raise_with_op(fgraph, order[int(idx)])
                    raise

            run.vm = vm
            run.order = order
        else:  # python fallback (same semantics)
            def run():
                for thunk, clears in zip(thunks, clear_lists):
                    try:
                        thunk()
                    except Exception:
                        raise_with_op(fgraph, thunk.node, thunk)
                    for cell in clears:
                        cell[0] = None

            run.order = order
        run.thunks = thunks
        run.storage_map = storage_map
        return run, input_containers, output_containers, thunks, order
