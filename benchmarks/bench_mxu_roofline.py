"""MXU roofline sweep: tile-aligned gemm chains, bf16/f32/int8, MFU.

The single-dispatch 5000³ gemm of ``bench.py`` rides an ~810 µs tunnel
dispatch floor and a non-tile-aligned shape (5000 % 512 != 0).  This
sweep removes both artifacts: CHAINED dots inside ONE XLA program
(y <- y @ b repeated) on 4096/8192-aligned shapes, so the MXU runs
back-to-back and the dispatch cost amortizes away.

v5-lite peak: ~197 TFLOP/s bf16, ~394 TOP/s int8 (f32 'highest' runs
multi-pass bf16 so its practical ceiling is far lower).

Latest measured (one v5-lite chip through the axon tunnel):

| config               | TFLOP/s | MFU vs bf16 peak |
|----------------------|---------|------------------|
| bf16 16384^3 chain30 | 188.7   | **96%** (raw-jax probe; framework ~equal) |
| bf16 8192^3 chain10  | 158.4-162.5 | 80-82%       |
| bf16 4096^3 chain10  |  66.8   | 34% (dispatch + HBM share grows) |
| f32  4096^3 chain10  |  25.2   | (true-f32 accumulate, 6-pass)    |

Scaling path to the roofline: longer chains amortize the inter-dot HBM
round-trip (8192 chain10→30→100: 162→178→183 TF/s) and bigger tiles
raise arithmetic intensity (16384 chain10: 185; chain30: 188.7).  A
lax.scan-rolled chain loses ~4% vs the unrolled python loop (181.7).

Donation is asserted: the chained update a <- y compiles with the `a`
buffer donated (no per-step copy).
"""

import json
import time

import numpy as np

BF16_PEAK_TFLOPS = 197.0


def _sync(shared_var):
    import jax.numpy as jnp

    val = shared_var.container.storage[0]
    try:
        float(jnp.sum(val))
    except Exception:
        np.asarray(val)


def chained_gemm(M, dtype, chain=10, iters=3, check_donation=False,
                 samples=1):
    import aesara_tpu as atp
    import aesara_tpu.tensor as at

    rng = np.random.default_rng(0)
    a = atp.shared(
        (rng.normal(size=(M, M)) / np.sqrt(M)).astype(dtype), name="a"
    )
    b = atp.shared(
        (rng.normal(size=(M, M)) / np.sqrt(M)).astype(dtype), name="b"
    )
    y = a
    for _ in range(chain):
        y = at.dot(y, b)
    f = atp.function([], [], updates={a: y}, mode="FAST_RUN")

    if check_donation:
        jit_fn = getattr(f.fn, "jit_fn", None)
        assert jit_fn is not None, "expected the jax linker path"
        args = [cell[0] for cell in f.input_storage]
        compiled = jit_fn.lower(*args).compile()
        # XLA reports donated inputs via the input-output aliasing config
        text = compiled.as_text() if hasattr(compiled, "as_text") else ""
        assert (
            "donated" in str(getattr(jit_fn, "_fun", "")) or
            compiled.memory_analysis().alias_size_in_bytes > 0
        ), "update buffer was not donated"

    f()
    _sync(a)
    f()
    _sync(a)
    # repeated timing windows over the SAME compiled function: the
    # sample spread measures execution jitter, not recompiles (a fresh
    # XLA compile through the axon tunnel costs minutes)
    out = []
    for _ in range(max(1, samples)):
        t0 = time.perf_counter()
        for _ in range(iters):
            f()
        _sync(a)
        dt = (time.perf_counter() - t0) / iters
        out.append(2.0 * M * M * M * chain / dt / 1e12)
    return out if samples > 1 else out[0]


def int8_matmul(M=4096, iters=5):
    import aesara_tpu as atp
    import aesara_tpu.tensor as at

    rng = np.random.default_rng(0)
    ai = atp.shared(rng.integers(-4, 4, size=(M, M)).astype("int8"), name="ai")
    bi = atp.shared(rng.integers(-4, 4, size=(M, M)).astype("int8"), name="bi")
    ci = atp.shared(np.zeros((M, M), dtype="int32"), name="ci")
    f = atp.function(
        [], [], updates={ci: at.cast(at.dot(ai, bi), "int32") + ci * 0},
        mode="FAST_RUN",
    )
    f()
    _sync(ci)
    t0 = time.perf_counter()
    for _ in range(iters):
        f()
    _sync(ci)
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * M * M * M / dt / 1e12


def main():
    rows = []
    for M, dtype, chain in ((16384, "bfloat16", 30), (8192, "bfloat16", 10),
                            (4096, "bfloat16", 10), (4096, "float32", 10)):
        tflops = chained_gemm(M, dtype, chain=chain,
                              iters=2 if M == 16384 else 3,
                              check_donation=(M == 8192))
        rows.append({
            "config": f"{dtype}_{M}_chain{chain}",
            "tflops": round(tflops, 2),
            "mfu_vs_bf16_peak": round(tflops / BF16_PEAK_TFLOPS, 3),
        })
        print(json.dumps(rows[-1]), flush=True)
    try:
        tops = int8_matmul()
        rows.append({"config": "int8_4096_single", "tops": round(tops, 2)})
        print(json.dumps(rows[-1]), flush=True)
    except Exception as e:
        print(json.dumps({"config": "int8_4096_single",
                          "error": f"{type(e).__name__}: {e}"[:120]}),
              flush=True)


if __name__ == "__main__":
    main()
