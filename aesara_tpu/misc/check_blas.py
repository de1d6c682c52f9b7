"""The gemm benchmark utility (reference ``aesara/misc/check_blas.py``):
times iterations of c <- 0.4c + 0.8 dot(a, b) through a compiled function
with shared operands; on TPU this measures MXU dot_general throughput."""

from __future__ import annotations

import sys
import time

import numpy as np


def execute(execute=True, verbose=True, M=2000, N=2000, K=2000, iters=10,
            order="C", dtype="float32"):
    import aesara_tpu as atp
    import aesara_tpu.tensor as at

    rng = np.random.default_rng(0)
    a = atp.shared(rng.normal(size=(M, K)).astype(dtype), name="a")
    b = atp.shared(rng.normal(size=(K, N)).astype(dtype), name="b")
    c = atp.shared(np.zeros((M, N), dtype=dtype), name="c")
    f = atp.function([], [], updates={c: 0.4 * c + 0.8 * at.dot(a, b)})
    if not execute:
        return f, 0.0
    f()
    _sync(c)
    t0 = time.perf_counter()
    for _ in range(iters):
        f()
    _sync(c)
    elapsed = time.perf_counter() - t0
    if verbose:
        gflops = 2.0 * M * N * K * iters / elapsed / 1e9
        print(f"gemm {dtype} {M}x{N}x{K} x{iters}: {elapsed:.4f}s "
              f"({gflops:.1f} GFLOP/s)")
    return f, elapsed


def _sync(shared_var):
    val = shared_var.container.storage[0]
    try:
        import jax.numpy as jnp

        float(jnp.sum(val))
    except Exception:
        np.asarray(val)


if __name__ == "__main__":
    execute()
