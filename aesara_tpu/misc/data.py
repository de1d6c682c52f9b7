"""Input pipeline: background prefetch with device staging.

The runtime piece the reference leaves to user code: training steps
should never wait on the host.  ``Prefetcher`` wraps any iterator of
numpy batches with a background thread that stays ``depth`` batches
ahead, moving each onto the device (``jax.device_put``) as it is
produced — so the host→device transfer of batch k+1 overlaps the
device compute of batch k (double buffering for ``depth=2``).

Usage::

    loader = Prefetcher(batch_iter(), depth=2)
    for batch in loader:
        step(batch)            # batch is already device-resident

Works with a compiled ``Function`` directly: device arrays pass through
the input filter without a host copy.
"""

from __future__ import annotations

import queue
import threading

__all__ = ["Prefetcher", "prefetch_to_device"]

_STOP = object()


class _SourceError:
    """Identity-checked wrapper for exceptions from the source (a plain
    tuple sentinel would collide with array batches under ``==``)."""

    def __init__(self, exc):
        self.exc = exc


def _worker(source, q, stop, stage):
    """Module-level worker: deliberately holds NO reference to the
    Prefetcher, so abandoning the iterator lets the GC collect it,
    whose ``__del__`` sets ``stop`` and this thread exits."""
    try:
        for batch in source:
            if stop.is_set():
                return
            staged = stage(batch)
            while not stop.is_set():
                try:
                    q.put(staged, timeout=0.1)
                    break
                except queue.Full:
                    continue
            if stop.is_set():
                return
    except BaseException as e:  # surfaced to the consumer
        if not stop.is_set():
            q.put(_SourceError(e))
        return
    q.put(_STOP)


class Prefetcher:
    """Iterate ``source`` with ``depth`` batches prefetched onto the
    device by a background thread.

    ``device_put=False`` keeps batches on host (pure pipelining).
    Exceptions in the source propagate to the consumer at the point of
    iteration; the thread shuts down on exhaustion, ``close()``,
    context exit, or garbage collection of an abandoned iterator.
    """

    def __init__(self, source, depth: int = 2, device_put: bool = True,
                 device=None):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._done = False

        if device_put:
            def stage(batch):
                import jax

                # device_put handles arbitrary pytrees (tuples,
                # namedtuples, dicts, nesting) natively
                if device is None:
                    return jax.device_put(batch)
                return jax.device_put(batch, device)
        else:
            def stage(batch):
                return batch

        self._thread = threading.Thread(
            target=_worker, args=(iter(source), self._q, self._stop, stage),
            daemon=True,
        )
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        while True:
            if self._stop.is_set():
                self._done = True
                raise StopIteration
            try:
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                if not self._thread.is_alive() and self._q.empty():
                    # worker died without a sentinel (shouldn't happen,
                    # but never hang the consumer)
                    self._done = True
                    raise StopIteration
                continue
            if item is _STOP:
                self._done = True
                raise StopIteration
            if isinstance(item, _SourceError):
                self.close()
                self._done = True
                raise item.exc
            return item

    def close(self):
        """Stop the background thread and drop queued batches."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def prefetch_to_device(source, depth: int = 2, device=None):
    """Convenience: ``Prefetcher(source, depth, device_put=True)``."""
    return Prefetcher(source, depth=depth, device_put=True, device=device)
