"""MPI point-to-point ops (reference ``tests/tensor/test_mpi.py``
roundtrip) on the in-process transport: blocking send → blocking recv
delivers the value; the scheduling keys order sends early, waits late."""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.tensor import io


def test_mpi_roundtrip_in_process():
    x = at.vector("x", dtype="float64")
    # blocking send compiled as its own function (rank-0 style program)
    sent = io.send(x, dest=0, tag=42)
    f_send = atp.function([x], sent, mode="PY", on_unused_input="ignore")
    # blocking recv (rank-1 style program)
    out = io.recv((3,), "float64", source=0, tag=42)
    f_recv = atp.function([], out, mode="PY")

    xv = np.array([1.0, 2.0, 3.0])
    f_send(xv)
    got = f_recv()
    np.testing.assert_allclose(got, xv)


def test_mpi_recv_without_send_raises():
    import pytest

    out = io.recv((2,), "float64", source=0, tag=777)
    f = atp.function([], out, mode="PY")
    with pytest.raises(RuntimeError, match="tag 777"):
        f()


def test_mpi_scheduling_keys():
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.graph.sched import sort_apply_nodes

    x = at.vector("x", dtype="float64")
    done = io.send(x, 0, tag=1)
    out = io.recv((3,), "float64", source=0, tag=1)
    fg = FunctionGraph([x], [done, out], clone=False)
    def cmp_send_wait(a, b):
        ka, kb = io.mpi_send_wait_key(a), io.mpi_send_wait_key(b)
        return (ka > kb) - (ka < kb)

    order = sort_apply_nodes(fg.inputs, fg.outputs, [cmp_send_wait])
    names = [type(n.op).__name__ for n in order]
    # sends/recvs start before any wait completes
    first_wait = min(i for i, n in enumerate(names) if n.endswith("Wait"))
    last_start = max(i for i, n in enumerate(names) if n in ("MPISend", "MPIRecv"))
    assert last_start < first_wait


def test_mpi_multirank_visible_skip():
    """Multi-rank transport needs mpi4py (absent in this image).

    The reference spawns ``mpiexec -np 2`` (tests/tensor/test_mpi.py:55-64);
    here the equivalent would drive two ranks through the mpi4py transport
    in ``tensor/io.py``.  mpi4py is NOT installed in this environment, so
    this skip is the visible record that only the in-process mailbox
    transport (single-process blocking semantics) is exercised.
    """
    import pytest

    mpi4py = pytest.importorskip("mpi4py")
    # If mpi4py ever appears in the image, do a same-process COMM_SELF
    # roundtrip through the real transport.
    from aesara_tpu.tensor import io

    assert io  # pragma: no cover
