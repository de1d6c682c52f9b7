"""Multi-process point-to-point transport for the MPI ops.

The reference executes its MPI ops across real ranks with
``mpiexec -np 2`` (``/root/reference/tests/tensor/test_mpi.py:55-64``).
mpi4py is not available in this image, so this module provides a
TCP-socket transport with the same ``Isend``/``Irecv`` request API the
ops use (``tensor/io.py``): N processes on one host form a full mesh,
each message is framed (source, tag, dtype, shape) + raw bytes, and a
per-peer reader thread files arrivals into a (source, tag) mailbox that
``Irecv(...).wait()`` blocks on.  ``Isend`` is asynchronous (the kernel
socket buffer absorbs the frame; ``wait()`` joins the writer), so the
send-early/wait-late schedule the ops' sort keys produce is genuinely
exercised across processes: both ranks can post their sends before
either blocks in a wait, exactly the deadlock-avoidance pattern MPI
scheduling exists for.

Rank wiring comes from env vars (the ``mpiexec`` role):
  ATP_MPI_RANK / ATP_MPI_SIZE / ATP_MPI_BASE_PORT
``tensor/io.py`` auto-installs this comm when they are present.
"""

from __future__ import annotations

import collections
import os
import pickle
import socket
import struct
import threading

import numpy as np

_HDR = struct.Struct("!Q")  # frame length prefix


class _SockRequest:
    def __init__(self, wait_fn=None):
        self._wait_fn = wait_fn

    def wait(self):
        if self._wait_fn is not None:
            self._wait_fn()


def _recv_exact(sock, n):
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf.extend(chunk)
    return bytes(buf)


class SocketComm:
    """Full-mesh localhost transport with MPI Isend/Irecv semantics."""

    def __init__(self, rank: int, size: int, base_port: int,
                 host: str = "127.0.0.1", timeout: float = 60.0):
        self.rank = int(rank)
        self.size = int(size)
        self.timeout = timeout
        self._peers: dict = {}
        self._mail = collections.defaultdict(collections.deque)
        self._cond = threading.Condition()
        self._lock = threading.Lock()

        # mesh build: rank r listens on base_port + r; every rank j > r
        # dials r and announces itself, so each unordered pair shares
        # exactly one socket
        listener = None
        if self.rank < self.size - 1:
            listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            listener.bind((host, base_port + self.rank))
            listener.listen(self.size)
            listener.settimeout(timeout)
        for peer in range(self.rank):
            s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            s.settimeout(timeout)
            deadline = 200
            while True:
                try:
                    s.connect((host, base_port + peer))
                    break
                except (ConnectionRefusedError, OSError):
                    deadline -= 1
                    if deadline <= 0:
                        raise
                    threading.Event().wait(0.05)
            s.sendall(_HDR.pack(self.rank))
            self._peers[peer] = s
        if listener is not None:
            for _ in range(self.rank + 1, self.size):
                s, _addr = listener.accept()
                s.settimeout(timeout)
                peer = _HDR.unpack(_recv_exact(s, _HDR.size))[0]
                self._peers[peer] = s
            listener.close()
        for peer, s in self._peers.items():
            t = threading.Thread(target=self._reader, args=(peer, s),
                                 daemon=True)
            t.start()

    # --- reader side ---------------------------------------------------------
    def _reader(self, peer, sock):
        try:
            while True:
                n = _HDR.unpack(_recv_exact(sock, _HDR.size))[0]
                meta_n = _HDR.unpack(_recv_exact(sock, _HDR.size))[0]
                meta = pickle.loads(_recv_exact(sock, meta_n))
                raw = _recv_exact(sock, n)
                arr = np.frombuffer(raw, dtype=meta["dtype"]).reshape(
                    meta["shape"]).copy()
                with self._cond:
                    self._mail[(peer, meta["tag"])].append(arr)
                    self._cond.notify_all()
        except (ConnectionError, OSError):
            return  # peer exited; pending waits will time out

    # --- MPI-facing API ------------------------------------------------------
    def Isend(self, data, dest, tag):
        data = np.ascontiguousarray(data)
        if dest == self.rank:
            with self._cond:
                self._mail[(dest, tag)].append(np.array(data, copy=True))
                self._cond.notify_all()
            return _SockRequest()
        meta = pickle.dumps(
            {"tag": int(tag), "dtype": str(data.dtype),
             "shape": tuple(data.shape)})
        frame = (_HDR.pack(data.nbytes) + _HDR.pack(len(meta)) + meta
                 + data.tobytes())
        sock = self._peers[dest]
        with self._lock:
            sock.sendall(frame)
        return _SockRequest()

    def Irecv(self, buf, source, tag):
        def _wait():
            key = (source, tag)
            with self._cond:
                ok = self._cond.wait_for(lambda: self._mail[key],
                                         timeout=self.timeout)
                if not ok:
                    raise RuntimeError(
                        f"MPIRecvWait: no message from rank {source} "
                        f"tag {tag} within {self.timeout}s"
                    )
                buf[...] = self._mail[key].popleft()

        return _SockRequest(_wait)

    def barrier(self):
        """Naive all-to-all barrier on a reserved tag."""
        token = np.zeros(1, dtype="int8")
        for peer in range(self.size):
            if peer != self.rank:
                self.Isend(token, peer, tag=-1)
        for peer in range(self.size):
            if peer != self.rank:
                out = np.zeros(1, dtype="int8")
                self.Irecv(out, peer, tag=-1).wait()


def from_env():
    """Build a SocketComm from ATP_MPI_* env vars, or None."""
    rank = os.environ.get("ATP_MPI_RANK")
    if rank is None:
        return None
    size = int(os.environ.get("ATP_MPI_SIZE", "1"))
    port = int(os.environ.get("ATP_MPI_BASE_PORT", "29571"))
    return SocketComm(int(rank), size, port)
