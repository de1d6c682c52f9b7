"""Fused-attention benchmark: the framework's FlashAttention Pallas
kernel vs the plain XLA composition, one TPU chip.

Run: python benchmarks/bench_attention.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from aesara_tpu.link.jax.pallas_kernels import flash_attention
from aesara_tpu.tensor.nnet.attention import _attention_ref


def bench(BH, T, D, iters=20):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, T, D)).astype("float32"))
    k = jnp.asarray(rng.normal(size=(BH, T, D)).astype("float32"))
    v = jnp.asarray(rng.normal(size=(BH, T, D)).astype("float32"))
    scale = 1.0 / np.sqrt(D)
    plain = jax.jit(lambda a, b, c: _attention_ref(a, b, c, False, scale))
    flash = jax.jit(lambda a, b, c: flash_attention(a, b, c, False, scale))
    flops = 4.0 * BH * T * T * D
    res = {}
    for name, fn in [("plain-xla", plain), ("pallas-flash", flash)]:
        r = fn(q, k, v)
        float(jnp.sum(r))  # sync (block_until_ready unreliable on axon)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(q, k, v)
        float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / iters
        res[name] = flops / dt / 1e12
        print(f"  BH={BH} T={T} D={D} {name:13s}: {dt*1e3:6.2f} ms "
              f"{res[name]:6.2f} TFLOP/s")
    print(f"  speedup: {res['pallas-flash'] / res['plain-xla']:.2f}x")


if __name__ == "__main__":
    print(f"attention sweep on {jax.devices()[0]}")
    for shape in [(32, 1024, 128), (32, 2048, 128), (16, 4096, 128)]:
        bench(*shape)
