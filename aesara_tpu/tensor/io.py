"""IO ops (reference ``aesara/tensor/io.py``: LoadFromDisk:10, MPI ops
:96-300).

The MPI layer keeps the reference's op classes and async-split API
(``MPISend``/``MPISendWait``/``MPIRecv``/``MPIRecvWait``, perform-only
Python ops there too).  Transport: mpi4py when installed, otherwise an
in-process tag mailbox with identical blocking semantics (send/recv
pairs in one process — how single-host tests use MPI).  On a device
mesh, point-to-point exchange is one ``parallel.ppermute`` collective
edge (SURVEY §2.12); these ops are the host-side/API-parity path."""

from __future__ import annotations

import collections

import numpy as np

from aesara_tpu.graph.ir import Apply, Type, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.type import TensorType


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


# ---------------------------------------------------------------------------
# MPI point-to-point (reference io.py:96-300)
# ---------------------------------------------------------------------------

try:
    from mpi4py import MPI as _MPI

    comm = _MPI.COMM_WORLD
    mpi_enabled = True
except ImportError:
    # no mpi4py: a real multi-process TCP transport when launched with
    # ATP_MPI_RANK/SIZE/BASE_PORT (the mpiexec role — see
    # ``tensor/mpi_transport.py`` and tests/tensor/test_io_mpi.py's
    # 2-rank roundtrip), else the single-process tag mailbox
    from aesara_tpu.tensor.mpi_transport import from_env as _sock_from_env

    _sock = _sock_from_env()
    mpi_enabled = _sock is not None

    class _InProcRequest:
        def __init__(self, wait_fn=None):
            self._wait_fn = wait_fn

        def wait(self):
            if self._wait_fn is not None:
                self._wait_fn()


    class _InProcComm:
        """Single-process transport with MPI Isend/Irecv semantics: a tag
        mailbox; Irecv's wait() blocks on (pops) the matching send."""

        def __init__(self):
            self._mail = collections.defaultdict(collections.deque)

        def Isend(self, data, dest, tag):
            self._mail[tag].append(np.array(data, copy=True))
            return _InProcRequest()

        def Irecv(self, buf, source, tag):
            def _wait():
                if not self._mail[tag]:
                    raise RuntimeError(
                        f"MPIRecvWait: no message pending for tag {tag} "
                        "(in-process transport delivers only send→recv "
                        "ordered pairs; on a device mesh use "
                        "aesara_tpu.parallel.ppermute)"
                    )
                buf[...] = self._mail[tag].popleft()

            return _InProcRequest(_wait)


    comm = _sock if _sock is not None else _InProcComm()


class MPIRecv(Op):
    """Asynchronous receive (reference ``MPIRecv io.py:108``): outputs a
    request token and the (not-yet-filled) buffer."""

    __props__ = ("source", "tag", "shape", "dtype")

    def __init__(self, source, tag, shape, dtype):
        self.source = source
        self.tag = tag
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)

    def make_node(self):
        return Apply(
            self, [],
            [Variable(Generic(), None),
             TensorType(self.dtype.name, (None,) * len(self.shape))()],
        )

    def perform(self, node, inputs, output_storage):
        data = np.zeros(self.shape, dtype=self.dtype)
        output_storage[0][0] = comm.Irecv(data, self.source, self.tag)
        output_storage[1][0] = data

    def infer_shape(self, fgraph, node, shapes):
        return [None, self.shape]

    def do_constant_folding(self, fgraph, node):
        return False

    def __str__(self):
        return (f"MPIRecv{{source: {int(self.source)}, tag: {int(self.tag)},"
                f" shape: {self.shape}, dtype: {self.dtype}}}")


class MPIRecvWait(Op):
    """Block until a pending receive lands (reference ``:159``)."""

    __props__ = ("tag",)
    view_map = {0: [1]}

    def __init__(self, tag):
        self.tag = tag

    def make_node(self, request, data):
        return Apply(self, [request, data],
                     [TensorType(data.dtype, data.type.shape)()])

    def perform(self, node, inputs, output_storage):
        request, data = inputs
        request.wait()
        output_storage[0][0] = data

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[1]]


class MPISend(Op):
    """Asynchronous send (reference ``:199``): outputs (request, data view)."""

    __props__ = ("dest", "tag")
    view_map = {1: [0]}

    def __init__(self, dest, tag):
        self.dest = dest
        self.tag = tag

    def make_node(self, data):
        return Apply(self, [data], [Variable(Generic(), None), data.type()])

    def perform(self, node, inputs, output_storage):
        (data,) = inputs
        output_storage[0][0] = comm.Isend(data, self.dest, self.tag)
        output_storage[1][0] = data

    def __str__(self):
        return f"MPISend{{dest: {int(self.dest)}, tag: {int(self.tag)}}}"


class MPISendWait(Op):
    """Block until a pending send drains (reference ``:237``)."""

    __props__ = ("tag",)

    def __init__(self, tag):
        self.tag = tag

    def make_node(self, request, data):
        return Apply(self, [request, data], [Variable(Generic(), None)])

    def perform(self, node, inputs, output_storage):
        inputs[0].wait()
        output_storage[0][0] = True


def isend(var, dest, tag):
    """Non-blocking send (reference ``isend:265``)."""
    return MPISend(dest, tag)(var)


def send(var, dest, tag):
    """Blocking send."""
    return MPISendWait(tag)(*isend(var, dest, tag))


def irecv(shape, dtype, source, tag):
    """Non-blocking receive."""
    return MPIRecv(source, tag, shape, dtype)()


def recv(shape, dtype, source, tag):
    """Blocking receive."""
    return MPIRecvWait(tag)(*irecv(shape, dtype, source, tag))


def mpi_send_wait_key(a):
    """Wait as late as possible; start sends/recvs early (reference
    ``mpi_send_wait_key:294``) — feed to ``graph.sched.sort_schedule_fn``."""
    if isinstance(a.op, (MPIRecvWait, MPISendWait)):
        return 1
    if isinstance(a.op, (MPIRecv, MPISend)):
        return -1
    return 0


def mpi_tag_key(a):
    """Break scheduling ties by message tag (reference ``mpi_tag_key``)."""
    op = a.op
    if isinstance(op, (MPIRecv, MPIRecvWait, MPISend, MPISendWait)):
        return op.tag
    return 0


mpi_cmps = [mpi_send_wait_key, mpi_tag_key]


def mpi_mode():
    """A compile Mode whose linker schedules with the MPI sort keys:
    sends/recvs post early, waits run late (the reference's
    ``sort_schedule_fn(*mpi_cmps)`` linker pattern,
    ``/root/reference/aesara/tensor/io.py:294``) — without it, two ranks
    that each send-then-recv can both block in their waits before either
    send is posted."""
    from aesara_tpu.compile.mode import Mode
    from aesara_tpu.graph.sched import key_to_cmp, sort_schedule_fn
    from aesara_tpu.link.basic import PerformLinker

    cmps = [key_to_cmp(k) for k in (mpi_send_wait_key, mpi_tag_key)]
    return Mode(linker=PerformLinker(schedule=sort_schedule_fn(*cmps)),
                optimizer=None)
