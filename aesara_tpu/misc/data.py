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


class Prefetcher:
    """Iterate ``source`` with ``depth`` batches prefetched onto the
    device by a background thread.

    ``device_put=False`` keeps batches on host (pure pipelining).
    Exceptions in the source propagate to the consumer at the point of
    iteration; the thread always shuts down cleanly (also on ``close()``
    or abandoning the iterator).
    """

    def __init__(self, source, depth: int = 2, device_put: bool = True,
                 device=None):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._source = iter(source)
        self._device_put = device_put
        self._device = device
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _stage(self, batch):
        if not self._device_put:
            return batch
        import jax

        kwargs = {} if self._device is None else {"device": self._device}
        if isinstance(batch, (list, tuple)):
            return type(batch)(jax.device_put(b, **kwargs) for b in batch)
        if isinstance(batch, dict):
            return {k: jax.device_put(v, **kwargs) for k, v in batch.items()}
        return jax.device_put(batch, **kwargs)

    def _worker(self):
        try:
            for batch in self._source:
                if self._stop.is_set():
                    return
                staged = self._stage(batch)
                while not self._stop.is_set():
                    try:
                        self._q.put(staged, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
        except BaseException as e:  # surfaced to the consumer
            if not self._stop.is_set():
                self._q.put(("__error__", e))
            return
        self._q.put(_STOP)

    def __iter__(self):
        return self

    def __next__(self):
        while True:
            if self._stop.is_set():
                raise StopIteration
            item = self._q.get()
            if item is _STOP:
                raise StopIteration
            if (
                isinstance(item, tuple)
                and len(item) == 2
                and item[0] == "__error__"
            ):
                self.close()
                raise item[1]
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
