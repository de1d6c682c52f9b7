"""Fused-attention benchmark: the framework's FlashAttention Pallas
kernel vs the plain XLA composition, one TPU chip.

Run: python benchmarks/bench_attention.py [--bf16] [--causal]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from aesara_tpu.link.jax.pallas_kernels import flash_attention
from aesara_tpu.tensor.nnet.attention import _attention_ref


def bench(BH, T, D, dtype="float32", causal=False, iters=20, grads=False):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BH, T, D)).astype("float32"), dtype=dtype)
    k = jnp.asarray(rng.normal(size=(BH, T, D)).astype("float32"), dtype=dtype)
    v = jnp.asarray(rng.normal(size=(BH, T, D)).astype("float32"), dtype=dtype)
    scale = 1.0 / np.sqrt(D)
    if grads:
        from aesara_tpu.link.jax.pallas_kernels import flash_attention_grads

        do = jnp.asarray(rng.normal(size=(BH, T, D)).astype("float32"),
                         dtype=dtype)

        def plain_fn(a, b, c):
            primal, vjp = jax.vjp(
                lambda x, y, z: _attention_ref(x, y, z, causal, scale),
                a, b, c)
            return vjp(do.astype(primal.dtype))

        plain = jax.jit(plain_fn)
        flash = jax.jit(lambda a, b, c: flash_attention_grads(
            a, b, c, do, causal=causal, scale=scale))
        flops = 10.0 * BH * T * T * D  # 5 matmuls fwd-recompute+bwd
    else:
        plain = jax.jit(lambda a, b, c: _attention_ref(a, b, c, causal, scale))
        flash = jax.jit(lambda a, b, c: flash_attention(a, b, c, causal, scale))
        flops = 4.0 * BH * T * T * D
    if causal:
        flops /= 2
    res = {}
    for name, fn in [("plain-xla", plain), ("pallas-flash", flash)]:
        r = fn(q, k, v)
        leaf = r[0] if isinstance(r, (tuple, list)) else r
        float(jnp.sum(leaf))  # sync (block_until_ready unreliable on axon)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(q, k, v)
            leaf = r[0] if isinstance(r, (tuple, list)) else r
            float(jnp.sum(leaf))
            best = min(best, (time.perf_counter() - t0) / iters)
        res[name] = flops / best / 1e12
        print(f"  BH={BH} T={T} D={D} {dtype} causal={causal} "
              f"{'bwd' if grads else 'fwd'} {name:13s}: {best*1e3:6.2f} ms "
              f"{res[name]:6.2f} TFLOP/s", flush=True)
    print(f"  speedup: {res['pallas-flash'] / res['plain-xla']:.2f}x",
          flush=True)
    return res


if __name__ == "__main__":
    dtype = "bfloat16" if "--bf16" in sys.argv else "float32"
    causal = "--causal" in sys.argv
    grads = "--grads" in sys.argv
    print(f"attention sweep on {jax.devices()[0]} dtype={dtype} "
          f"causal={causal} grads={grads}")
    for shape in [(32, 1024, 128), (32, 2048, 128), (16, 4096, 128)]:
        bench(*shape, dtype=dtype, causal=causal, grads=grads)
