"""Precision-variant gemm sweep on one TPU chip.

The headline ``bench.py`` runs the reference's f32 5000-cubed gemm at
``precision=highest`` (true f32 accumulation, 6-pass bf16x6 on the MXU).
This sweep shows what the SAME framework graph delivers when the user
relaxes dtype/precision — the knobs a production deployment actually
turns (SURVEY §6: MXU native dtype is bf16).

Run: python benchmarks/bench_precision.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

import aesara_tpu as atp
import aesara_tpu.tensor as at


N = 5000
ITERS = 10
FLOPS = 2.0 * N * N * N * ITERS


def _sync(x):
    # block_until_ready is unreliable through the axon tunnel: force a
    # scalar to the host instead
    return float(jnp.sum(x))


def bench_variant(dtype: str, precision: str) -> float:
    rng = np.random.default_rng(42)
    a_host = rng.standard_normal((N, N), dtype="float32")
    b_host = rng.standard_normal((N, N), dtype="float32")

    a = atp.shared(a_host.astype(dtype), name="a")
    b = atp.shared(b_host.astype(dtype), name="b")
    c = atp.shared(np.zeros((N, N), dtype=dtype), name="c")

    with atp.config.change_flags(jax_default_matmul_precision=precision):
        step = atp.function([], [], updates=[(c, at.math.dot(a, b) + c)])
        step()  # compile + warm
        _sync(c.container.storage[0])
        t0 = time.perf_counter()
        for _ in range(ITERS):
            step()
        _sync(c.container.storage[0])
        dt = time.perf_counter() - t0
    return FLOPS / dt / 1e12


def main():
    print(f"gemm {N}^3 x {ITERS} on {jax.devices()[0]}")
    for dtype, precision in [
        ("float32", "highest"),   # the bench.py headline config
        ("float32", "default"),   # bf16 inputs on the MXU, f32 accumulate
        ("bfloat16", "default"),  # full bf16 pipeline
    ]:
        tflops = bench_variant(dtype, precision)
        print(f"  {dtype:9s} precision={precision:8s}: {tflops:7.2f} TFLOP/s")


if __name__ == "__main__":
    main()
