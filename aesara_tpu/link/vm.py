"""VM module (reference ``aesara/link/vm.py``): the host-side virtual
machines.  Here the C++ CVM (``link/c/cvm.cpp``) plays the Loop/Stack/
CVM roles — these names adapt it to the reference's module layout."""

from __future__ import annotations

from aesara_tpu.link.basic import Container, LocalLinker, PerformLinker
from aesara_tpu.link.c.vm_linker import CVMLinker


class VM:
    """Base for host VMs (reference ``vm.py:169``): callable over
    prepared thunks."""

    def __init__(self, fgraph, nodes, thunks, pre_call_clear=()):
        self.fgraph = fgraph
        self.nodes = nodes
        self.thunks = thunks
        self.pre_call_clear = pre_call_clear

    def __call__(self):
        for cell in self.pre_call_clear:
            cell[0] = None
        for thunk in self.thunks:
            thunk()


class Loop(VM):
    """Straight-line VM (reference ``Loop``)."""


class UpdatingVM(VM):
    """VM that writes update outputs back to input storage (reference)."""

    def __init__(self, fgraph, nodes, thunks, pre_call_clear=(),
                 input_storage=(), output_storage=(), update_map=None):
        super().__init__(fgraph, nodes, thunks, pre_call_clear)
        self.input_storage = input_storage
        self.output_storage = output_storage
        self.update_map = update_map or {}

    def __call__(self):
        super().__call__()
        for out_idx, in_idx in self.update_map.items():
            self.input_storage[in_idx][0] = self.output_storage[out_idx][0]


class Stack(VM):
    """Demand-driven lazy VM (reference ``Stack``) — realized by the C++
    CVM's run_subset; this python fallback evaluates everything."""


#: the reference's VMLinker chooses Loop/Stack/CVM; ours IS the CVM linker
VMLinker = CVMLinker


def calculate_reallocate_info(order, fgraph, storage_map, compute_map_re,
                              dependencies):
    """Storage-reuse planning (reference ``calculate_reallocate_info``):
    under XLA the compiler owns buffer reuse, so there is nothing to
    plan — returns the empty reuse map."""
    return {}
