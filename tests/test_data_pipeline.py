"""Prefetching input pipeline: ordering, device staging, error
propagation, clean shutdown, and end-to-end training overlap."""

import time

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.misc.data import Prefetcher, prefetch_to_device


def test_order_preserved_and_device_resident():
    batches = [np.full((4,), i, dtype="float32") for i in range(10)]
    out = list(Prefetcher(iter(batches), depth=3))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert float(np.asarray(b)[0]) == i
        assert hasattr(b, "devices") or not isinstance(b, np.ndarray)


def test_tuple_and_dict_batches():
    src = [({"x": np.ones(2, "float32")}, np.zeros(1, "float32"))
           for _ in range(3)]
    out = list(Prefetcher(iter(src), depth=2))
    assert len(out) == 3
    d, a = out[0]
    assert set(d) == {"x"}


def test_source_error_propagates():
    def bad():
        yield np.ones(2, dtype="float32")
        raise RuntimeError("loader broke")

    p = Prefetcher(bad(), depth=2)
    next(p)
    with pytest.raises(RuntimeError, match="loader broke"):
        next(p)


def test_close_stops_unconsumed():
    def infinite():
        i = 0
        while True:
            yield np.full((2,), i, dtype="float32")
            i += 1

    with Prefetcher(infinite(), depth=2) as p:
        next(p)
        next(p)
    # after close, iteration ends rather than hanging
    with pytest.raises(StopIteration):
        next(p)


def test_overlaps_slow_source():
    """With depth=2, a source that takes S per batch and a consumer that
    takes C per batch should finish in ~max(S, C)·n, not (S+C)·n."""
    S, n = 0.02, 8

    def slow():
        for i in range(n):
            time.sleep(S)
            yield np.full((2,), i, dtype="float32")

    p = Prefetcher(slow(), depth=2, device_put=False)
    t0 = time.perf_counter()
    for b in p:
        time.sleep(S)          # consumer work equal to producer work
    elapsed = time.perf_counter() - t0
    assert elapsed < 2 * S * n * 0.85   # strictly better than serial


def test_feeds_compiled_function():
    x = at.matrix("x", dtype="float64")
    w = atp.shared(np.zeros(3, dtype="float32"), name="w")
    loss = ((at.dot(x, w)) ** 2).mean() + x.sum() * 0.01
    step = atp.function([x], loss, mode="JAX")
    src = (np.random.default_rng(i).standard_normal((2, 3)).astype("float32")
           for i in range(5))
    vals = [float(np.asarray(step(b))) for b in prefetch_to_device(src)]
    assert len(vals) == 5 and all(np.isfinite(v) for v in vals)


def test_array_tuple_batches_host_mode():
    """Regression: the error sentinel must not compare == against array
    batches (tuple of ndarrays in device_put=False mode crashed)."""
    src = [(np.ones(3, "float32"), np.zeros(2, "float32"))
           for _ in range(3)]
    out = list(Prefetcher(iter(src), depth=2, device_put=False))
    assert len(out) == 3
    assert isinstance(out[0][0], np.ndarray)


def test_namedtuple_batches():
    import collections

    B = collections.namedtuple("B", ["x", "y"])
    src = [B(np.ones(2, "float32"), np.zeros(1, "float32"))
           for _ in range(2)]
    out = list(Prefetcher(iter(src), depth=2))
    assert len(out) == 2 and isinstance(out[0], B)


def test_exhausted_iterator_raises_again_not_hangs():
    p = Prefetcher(iter([np.ones(1, "float32")]), depth=2)
    assert len(list(p)) == 1
    import pytest as _pytest

    with _pytest.raises(StopIteration):
        next(p)                    # regression: used to block forever
    assert next(p, "default") == "default"


def test_abandoned_prefetcher_thread_exits():
    import gc

    def infinite():
        i = 0
        while True:
            yield np.full((2,), i, dtype="float32")
            i += 1

    p = Prefetcher(infinite(), depth=1, device_put=False)
    next(p)
    th = p._thread
    del p
    gc.collect()
    th.join(timeout=5.0)
    assert not th.is_alive()       # regression: leaked forever
