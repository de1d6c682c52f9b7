"""BSS v2 crossover table: BSS kernels vs densified MXU vs BCOO over
density x rhs-width C (VERDICT r4 item 5).

Run: python benchmarks/bench_bss_wide.py            (real chip)
"""

import time

import numpy as np
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from aesara_tpu.link.jax.bss import bss_matmul, csr_to_bss


def _sync(x):
    float(jnp.sum(x))


def bench_one(n, d, density, C, dtype="float32", iters=20,
              with_bcoo=False):
    x = sps.random(n, d, density=density, format="csr", dtype="float32",
                   random_state=np.random.RandomState(0))
    a = csr_to_bss(x)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.normal(size=(d, C)).astype("float32"), dtype=dtype)
    dense = jnp.asarray(x.toarray(), dtype=dtype)

    cands = {
        "bss": jax.jit(lambda bb: bss_matmul(a, bb)),
        "densified": jax.jit(lambda bb: dense @ bb),
    }
    if with_bcoo:
        # XLA:TPU compiles the BCOO gather program into a serialized loop
        # — COMPILE time alone is minutes at this nnz, so the sweep
        # probes it once (round-4 measured ~14 ms/SpMV at 1.3M nnz)
        from jax.experimental import sparse as jsparse

        bcoo = jsparse.BCOO.from_scipy_sparse(x)
        cands["bcoo"] = jax.jit(lambda bb: bcoo @ bb)
    row = {}
    for name, fn in cands.items():
        try:
            r = fn(b)
            _sync(r)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    r = fn(b)
                _sync(r)
                best = min(best, (time.perf_counter() - t0) / iters)
            row[name] = best * 1e6
        except Exception as e:  # noqa: BLE001
            row[name] = float("nan")
            print(f"  {name} failed: {type(e).__name__}")
    win = min(row, key=lambda k: row[k] if row[k] == row[k] else 1e30)
    print(f"n={n} d={d} dens={density} C={C} {dtype}: "
          + "  ".join(f"{k}={v:9.1f}us" for k, v in row.items())
          + f"  -> {win}", flush=True)
    return row


if __name__ == "__main__":
    import sys

    print(f"BSS crossover sweep on {jax.devices()[0]}")
    N, D = 16384, 8192
    for density in (0.001, 0.01, 0.05):
        for C in (1, 8, 128, 512):
            bench_one(N, D, density, C,
                      with_bcoo=("--bcoo" in sys.argv and C == 1
                                 and density == 0.01))
    print("bf16 rhs:")
    bench_one(N, D, 0.01, 128, dtype="bfloat16")
