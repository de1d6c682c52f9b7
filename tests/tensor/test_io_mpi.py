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


_RANK_SCRIPT = r"""
import os, sys
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.tensor import io

rank = int(os.environ["ATP_MPI_RANK"])
other = 1 - rank

# --- roundtrip (the reference's mpiexec -np 2 test,
# /root/reference/tests/tensor/test_mpi.py:55-64): rank0 sends x to
# rank1, rank1 doubles and sends back, rank0 checks ---
if rank == 0:
    x = at.vector("x", dtype="float64")
    fs = atp.function([x], io.send(x, dest=1, tag=5), mode="PY",
                      on_unused_input="ignore")
    fr = atp.function([], io.recv((3,), "float64", source=1, tag=7),
                      mode="PY")
    xv = np.array([1.0, 2.0, 3.0])
    fs(xv)
    got = fr()
    np.testing.assert_allclose(got, xv * 2.0)
else:
    y = io.recv((3,), "float64", source=0, tag=5)
    fr = atp.function([], y, mode="PY")
    got = fr()
    z = at.vector("z", dtype="float64")
    fs = atp.function([z], io.send(z, dest=0, tag=7), mode="PY",
                      on_unused_input="ignore")
    fs(np.asarray(got) * 2.0)

# --- cross-exchange in ONE program per rank: both ranks' programs
# contain a send AND a recv; io.mpi_mode()'s scheduled linker posts the
# isend before either rank blocks in its wait (send-early/wait-late) ---
x2 = at.vector("x2", dtype="float64")
done = io.send(x2, dest=other, tag=20 + rank)
got2 = io.recv((2,), "float64", source=other, tag=20 + other)
f = atp.function([x2], [done, got2], mode=io.mpi_mode(),
                 on_unused_input="ignore")
mine = np.array([float(rank), float(rank) + 0.5])
_, theirs = f(mine)
np.testing.assert_allclose(np.asarray(theirs),
                           [float(other), float(other) + 0.5])
print(f"rank {rank} OK")
"""


def test_mpi_multirank_roundtrip(tmp_path):
    """Two REAL processes through the socket transport
    (``tensor/mpi_transport.py``) — the reference's ``mpiexec -np 2``
    roundtrip plus a cross-exchange exercising send-early/wait-late
    across ranks.  Closes the round-4 visible skip."""
    import socket
    import subprocess
    import sys

    script = tmp_path / "rank.py"
    script.write_text(_RANK_SCRIPT)
    # find a free base port (rank-0 listener binds base_port+0)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = []
    for rank in (0, 1):
        env = dict(os.environ)
        env.update(
            ATP_MPI_RANK=str(rank), ATP_MPI_SIZE="2",
            ATP_MPI_BASE_PORT=str(port),
            PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} OK" in out


def test_socket_comm_same_process_pair():
    """Unit-level: two SocketComm endpoints in one process (threads)
    exchange framed arrays with (source, tag) addressing."""
    import threading

    import socket as socklib

    from aesara_tpu.tensor.mpi_transport import SocketComm

    s = socklib.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    comms = {}

    def mk(rank):
        comms[rank] = SocketComm(rank, 2, port, timeout=30.0)

    t0 = threading.Thread(target=mk, args=(0,))
    t1 = threading.Thread(target=mk, args=(1,))
    t0.start(); t1.start(); t0.join(30); t1.join(30)
    assert 0 in comms and 1 in comms

    a = np.arange(6, dtype="float32").reshape(2, 3)
    comms[0].Isend(a, dest=1, tag=3)
    buf = np.zeros((2, 3), dtype="float32")
    comms[1].Irecv(buf, source=0, tag=3).wait()
    np.testing.assert_allclose(buf, a)

    # tags separate streams; source addressing works both ways
    b = np.ones(4)
    comms[1].Isend(b * 2, dest=0, tag=9)
    comms[1].Isend(b * 3, dest=0, tag=8)
    out9 = np.zeros(4)
    out8 = np.zeros(4)
    comms[0].Irecv(out8, source=1, tag=8).wait()
    comms[0].Irecv(out9, source=1, tag=9).wait()
    np.testing.assert_allclose(out8, b * 3)
    np.testing.assert_allclose(out9, b * 2)
