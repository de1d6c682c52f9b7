"""IO ops (reference ``aesara/tensor/io.py``: LoadFromDisk:10, MPI ops
:96-300).  The MPI point-to-point layer is replaced by the collective ops
of ``aesara_tpu.parallel`` (SURVEY §2.12); send/recv shims re-exported
here for import-path parity."""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply, Type, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.type import TensorType
from aesara_tpu.parallel.ops import irecv, isend, recv, send  # noqa: F401


class Generic(Type):
    """Type for opaque python objects (here: file paths)."""

    def filter(self, data, strict=False, allow_downcast=None):
        return data

    def __eq__(self, other):
        return type(other) is Generic

    def __hash__(self):
        return hash(Generic)

    def __str__(self):
        return "generic"


generic = Generic()


class LoadFromDisk(Op):
    """Load an .npy file lazily at execution (reference ``io.py:10``)."""

    __props__ = ("dtype", "shape", "mmap_mode")

    def __init__(self, dtype, shape, mmap_mode=None):
        self.dtype = dtype
        self.shape = tuple(shape)
        if mmap_mode not in (None, "c"):
            raise ValueError("mmap_mode must be None or 'c'")
        self.mmap_mode = mmap_mode

    def make_node(self, path):
        if not isinstance(path, Variable):
            raise TypeError("path must be a Variable of Generic type")
        return Apply(self, [path], [TensorType(self.dtype, self.shape)()])

    def perform(self, node, inputs, output_storage):
        arr = np.load(inputs[0], mmap_mode=self.mmap_mode)
        output_storage[0][0] = np.asarray(arr, dtype=self.dtype)

    def __str__(self):
        return "Load{%s}" % (self.dtype,)


def load(path, dtype, shape, mmap_mode=None):
    return LoadFromDisk(dtype, shape, mmap_mode)(path)


#: scheduling keys kept for API parity (reference mpi_send_wait_key:294);
#: with XLA collectives the compiler owns overlap scheduling.
def mpi_send_wait_key(a):
    return 0


def mpi_tag_key(a):
    return 0


mpi_cmps = []
