"""Composite elemwise chain: Pallas VPU kernel vs XLA's own fusion.

The FusionOptimizer packs elemwise chains into one Composite; the XLA
lowering can run that chain either through XLA's fusion (default) or an
explicit Pallas kernel (``config.pallas_fusion``).  This benchmark
measures BOTH paths on the same compiled graph at sizes above the
~810 µs tunnel dispatch floor, so the gate encodes a MEASURED verdict
rather than a guess.

Workload: z = tanh(exp(-x*x) * y + x / (1 + |y|)) — a 7-op scalar chain
over two inputs, HBM-bound when fused (3 arrays of traffic).

Effective GB/s counts 3 × nbytes (2 reads + 1 write) per call.
"""

import json
import time

import numpy as np


def _sync(shared_var):
    import jax.numpy as jnp

    val = shared_var.container.storage[0]
    try:
        float(jnp.sum(val))
    except Exception:
        np.asarray(val)


def run_chain(n_side, pallas: bool, iters=10):
    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.config import config

    rng = np.random.default_rng(0)
    xv = rng.normal(size=(n_side, n_side)).astype("float32")
    yv = rng.normal(size=(n_side, n_side)).astype("float32")
    x = atp.shared(xv, name="x")
    y = atp.shared(yv, name="y")
    z = atp.shared(np.zeros_like(xv), name="z")

    expr = at.tanh(at.exp(-x * x) * y + x / (1.0 + at.abs(y)))
    with config.change_flags(
        pallas_fusion=pallas, pallas_fusion_min_size=0
    ):
        f = atp.function([], [], updates={z: expr}, mode="FAST_RUN")
        f()
        _sync(z)
        f()
        _sync(z)
        t0 = time.perf_counter()
        for _ in range(iters):
            f()
        _sync(z)
        dt = (time.perf_counter() - t0) / iters
    gbs = 3 * xv.nbytes / dt / 1e9
    return dt, gbs


def main():
    for n_side in (4096, 8192, 16384):
        row = {"side": n_side}
        for pallas in (False, True):
            try:
                dt, gbs = run_chain(n_side, pallas)
                row["pallas" if pallas else "xla"] = round(gbs, 1)
            except Exception as e:
                row["pallas" if pallas else "xla"] = (
                    f"{type(e).__name__}: {e}"[:80]
                )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
