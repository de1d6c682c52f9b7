"""MonitorMode: user-hookable per-node inspection
(reference ``aesara/compile/monitormode.py:9``, built on WrapLinker)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.mode import Mode
from aesara_tpu.link.basic import Container, LocalLinker, map_storage, raise_with_op


__all__ = ["MonitorMode", "detect_nan"]


class MonitorLinker(LocalLinker):
    def __init__(self, pre_func=None, post_func=None):
        super().__init__(allow_gc=False)
        self.pre_func = pre_func
        self.post_func = post_func

    def make_all(self, input_storage=None, output_storage=None, storage_map=None):
        fgraph = self.fgraph
        order = fgraph.toposort()
        input_storage, output_storage, storage_map = map_storage(
            fgraph, order, input_storage, output_storage, storage_map
        )
        compute_map = {v: [False] for v in storage_map}
        thunks = [
            (node, node.op.make_py_thunk(node, storage_map, compute_map, []))
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
        pre, post = self.pre_func, self.post_func

        def run():
            for i, (node, thunk) in enumerate(thunks):
                # expose storage through the thunk like the reference does
                if pre:
                    pre(i, node, thunk)
                try:
                    thunk()
                except Exception:
                    raise_with_op(fgraph, node, thunk)
                if post:
                    post(i, node, thunk)

        return run, input_containers, output_containers, thunks, order


class MonitorMode(Mode):
    """Calls pre_func(i, node, thunk) / post_func(i, node, thunk) around
    every node; thunk.inputs/outputs are the live storage cells."""

    def __init__(self, pre_func=None, post_func=None, optimizer="fast_run"):
        super().__init__(MonitorLinker(pre_func, post_func), optimizer)


def detect_nan(i, node, fn):
    """Drop-in post_func from the reference's docs."""
    for cell in fn.outputs:
        out = cell[0]
        if (
            out is not None
            and np.issubdtype(np.asarray(out).dtype, np.floating)
            and np.isnan(np.asarray(out)).any()
        ):
            print(f"*** NaN detected in output of node {i}: {node}")
            from aesara_tpu.printing import debugprint

            debugprint(node)
            raise AssertionError(f"NaN in {node}")
