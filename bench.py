"""Headline benchmark: gemm-dominated graph throughput on the MXU.

Mirrors the reference's only published benchmark, ``misc/check_blas.py``
(10 gemm iterations through a compiled function with shared operands and
an in-place update — ``check_blas.py:58-120``).  The reference's best
published number for this exact f32 M=N=K=5000 workload is 0.28 s on a
Titan X (Pascal) (``check_blas.py:235-258`` / BASELINE.md); vs_baseline is
measured as (their time / our time) on that workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


class _Deadline(Exception):
    pass


def main():
    import os
    import signal

    import aesara_tpu as atp
    import aesara_tpu.tensor as at

    # wall-clock budget: tunnel-side XLA compile times for the big
    # programs here vary from ~2 to ~8+ minutes run to run; skip
    # companion stages (and, worst case, bail out of a hung headline
    # compile) rather than let the driver's timeout kill the run before
    # the JSON prints.  (Warm tunnel: the whole script is ~2 min.)
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "480"))
    signal.signal(signal.SIGALRM, lambda s, f: (_ for _ in ()).throw(_Deadline()))
    signal.alarm(int(budget_s + 60))  # hard stop: headline compile hung

    M = N = K = 5000
    iters = 10
    dtype = "float32"

    rng = np.random.default_rng(0)
    a = atp.shared(rng.normal(size=(M, K)).astype(dtype), name="a")
    b = atp.shared(rng.normal(size=(K, N)).astype(dtype), name="b")
    c = atp.shared(np.zeros((M, N), dtype=dtype), name="c")

    try:
        # the check_blas graph: c <- 0.4*c + 0.8*dot(a, b)  (gemm form)
        f = atp.function(
            [], [], updates={c: 0.4 * c + 0.8 * at.dot(a, b)}, mode="FAST_RUN"
        )

        # warmup (compile + first run + sync-path compile)
        f()
        _sync(c)
        _sync(c)

        # best-of-5 (timeit convention): the axon tunnel adds host-side
        # jitter of up to ~2x on short windows; min time is the
        # reproducible device number and is the CANONICAL one (README and
        # BENCH_r*.json both use it).  jitter = (max-min)/min over samples.
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                f()
            _sync(c)
            samples.append(time.perf_counter() - t0)
        elapsed = min(samples)
        # calibration guard (round-5 variance root-cause,
        # benchmarks/bench_variance_probe.py): fresh processes agree
        # within ~4% — there is NO per-connection fast/slow lane; the
        # historical "up to 4x between processes" was TRANSIENT slow
        # epochs (host load starving the tunnel client — the same
        # mechanism as the measured 3x pytest-concurrency inflation).
        # So when a run looks like it hit a slow epoch (large spread),
        # take another round of samples; the global min is the chip.
        calibration = {"loadavg_1m": round(os.getloadavg()[0], 2)}
        spread = (max(samples) - min(samples)) / min(samples)
        if spread > 0.5 or calibration["loadavg_1m"] > 4.0:
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(iters):
                    f()
                _sync(c)
                samples.append(time.perf_counter() - t0)
            elapsed = min(samples)
            calibration["slow_epoch_retry"] = True
            calibration["spread_first5"] = round(spread, 3)
    except _Deadline:
        print(json.dumps({
            "metric": "gemm_f32_5000_tflops", "value": 0.0,
            "unit": "TFLOP/s", "vs_baseline": 0.0,
            "timeout": "headline XLA compile exceeded BENCH_BUDGET_S+60",
        }))
        return

    flops = 2.0 * M * N * K * iters
    tflops = flops / elapsed / 1e12
    baseline_time = 0.28  # Titan X (Pascal), same workload, check_blas table
    result = {
        "metric": "gemm_f32_5000_tflops",
        "value": round(tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(baseline_time / elapsed, 3),
        "jitter": {
            "gemm_f32": round((max(samples) - min(samples)) / min(samples), 3),
            "n_samples": len(samples),
            "canonical": "min-time over samples",
        },
        "calibration": calibration,
    }
    # MXU roofline companion: tile-aligned bf16 gemm CHAIN in one XLA
    # program (amortizes the ~810 µs tunnel dispatch floor) + MFU vs the
    # ~197 TFLOP/s v5-lite bf16 peak (benchmarks/bench_mxu_roofline.py)
    try:
        if time.perf_counter() - t_start > budget_s:
            raise TimeoutError
        from benchmarks.bench_mxu_roofline import BF16_PEAK_TFLOPS, chained_gemm

        # samples=3 reuses ONE compiled program (a fresh tunnel-side
        # compile costs minutes; the spread must measure execution)
        bf16_samples = chained_gemm(16384, "bfloat16", chain=30, iters=2,
                                    samples=3)
        bf16 = max(bf16_samples)  # min-time == max-throughput
        result["bf16_16384_tflops"] = round(bf16, 2)
        result["bf16_mfu"] = round(bf16 / BF16_PEAK_TFLOPS, 3)
        result["jitter"]["bf16"] = round(
            (max(bf16_samples) - min(bf16_samples)) / max(bf16_samples), 3)
    except _Deadline:
        # the SIGALRM is ONE-SHOT: swallowing it here once left the
        # remaining companions unbounded and the driver killed the run
        # before the JSON printed — print immediately instead
        print(json.dumps(result))
        return
    except Exception:
        pass
    # HBM roofline companion (benchmarks/bench_hbm_roofline.py): slope-timed
    # in-program triad loops cancel the tunnel's fixed dispatch cost; the
    # fraction is framework fused-elemwise GB/s over the measured raw-jax
    # device ceiling (BASELINE north star: >=0.90).
    try:
        if time.perf_counter() - t_start > budget_s:
            raise TimeoutError
        from benchmarks.bench_hbm_roofline import framework_triad, raw_probe

        raw = raw_probe(reps=2)
        fw_samples = framework_triad(reps=3, samples=True)
        fw = max(fw_samples)
        result["elemwise_gbps"] = round(fw, 1)
        result["hbm_roofline_frac"] = round(fw / raw["triad"], 3)
        result["jitter"]["elemwise"] = round(
            (max(fw_samples) - min(fw_samples)) / max(fw_samples), 3)
    except _Deadline:
        print(json.dumps(result))
        return
    except Exception:
        pass
    # flagship transformer tokens/s is benchmarked separately
    # (benchmarks/bench_transformer.py — its fresh XLA compile through
    # the tunnel would risk the driver's bench timeout here)
    signal.alarm(0)
    print(json.dumps(result))


def _sync(shared_var):
    """Force completion of all queued device work on this buffer.

    block_until_ready is not reliable on every platform plugin (the axon
    tunnel returns immediately); materializing a scalar reduction is.
    """
    val = shared_var.container.storage[0]
    try:
        import jax.numpy as jnp

        float(jnp.sum(val))
    except Exception:
        np.asarray(val)


if __name__ == "__main__":
    main()
