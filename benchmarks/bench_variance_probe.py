"""Cross-process throughput variance probe (VERDICT r4 weak 3 / task 8b).

Round 4 measured up to ~4x throughput differences BETWEEN processes
running the identical compiled program, with only ~3% jitter WITHIN a
process.  This probe discriminates the two candidate causes:

- **per-connection state**: each process's tunnel connection lands in a
  fast or slow lane at startup and keeps it for the process lifetime
  -> interleaved samples from two concurrent processes DISAGREE
  (one consistently fast, one consistently slow), and a process's
  first sample predicts all its later ones.
- **time-correlated external contention** (chip shared, proxy
  congestion): slow epochs hit every connected process alike
  -> interleaved samples from concurrent processes AGREE over time,
  and sequential processes drift together.

Usage:
  probe mode (one process, timestamped samples on stdout):
      python benchmarks/bench_variance_probe.py --probe --secs 30
  experiment (spawns sequential + concurrent probe children, analyzes):
      python benchmarks/bench_variance_probe.py --experiment

The probe program is one fixed-shape bf16 gemm chain (same shape every
run, so every child reuses the persistent-cache executable and measures
execution, not compile).
"""

import json
import os
import subprocess
import sys
import time

N = 8192          # fixed: one cached executable shared by all children
CHAIN = 8         # gemms per dispatch (amortize the ~0.8 ms tunnel floor)
FLOPS_PER_CALL = 2.0 * N * N * N * CHAIN


def _build():
    import jax
    import jax.numpy as jnp

    a = jnp.asarray(
        __import__("numpy").random.default_rng(0)
        .normal(size=(N, N)).astype("float32"),
        dtype=jnp.bfloat16)

    @jax.jit
    def chain(x):
        for _ in range(CHAIN):
            x = x @ x * 1e-3
        return x

    return chain, a


def _sync(x):
    import jax.numpy as jnp

    float(jnp.sum(x))


def probe(secs=30.0, period=2.0):
    """Emit one JSON line per sample: {t, tflops}.  t is absolute so an
    orchestrator can align samples across concurrent processes."""
    chain, a = _build()
    out = chain(a)
    _sync(out)  # compile + first run
    t_end = time.time() + secs
    while time.time() < t_end:
        t0 = time.perf_counter()
        out = chain(a)
        _sync(out)
        dt = time.perf_counter() - t0
        print(json.dumps({"t": round(time.time(), 2),
                          "tflops": round(FLOPS_PER_CALL / dt / 1e12, 2)}),
              flush=True)
        time.sleep(max(0.0, period - dt))


def _run_child(secs):
    env = dict(os.environ)
    p = subprocess.Popen(
        [sys.executable, __file__, "--probe", "--secs", str(secs)],
        stdout=subprocess.PIPE, env=env, text=True)
    return p


def _collect(p):
    rows = []
    for line in p.stdout:
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            pass
    p.wait()
    return rows


def experiment():
    import numpy as np

    print("== sequential: 4 fresh processes, 20 s each ==", flush=True)
    seq = []
    for i in range(4):
        rows = _collect(_run_child(20))
        vals = [r["tflops"] for r in rows]
        seq.append(vals)
        print(f"proc {i}: median {np.median(vals):7.1f} TF/s   "
              f"first {vals[0]:7.1f}   cv {np.std(vals)/np.mean(vals):.2%}",
              flush=True)
    medians = [float(np.median(v)) for v in seq]
    print(f"sequential spread: max/min = {max(medians)/min(medians):.2f}x",
          flush=True)

    print("== concurrent: 2 processes, interleaved 40 s ==", flush=True)
    pa, pb = _run_child(40), _run_child(40)
    ra, rb = _collect(pa), _collect(pb)

    # align on nearest timestamps and correlate
    ta = np.array([r["t"] for r in ra]); va = np.array([r["tflops"] for r in ra])
    tb = np.array([r["t"] for r in rb]); vb = np.array([r["tflops"] for r in rb])
    if len(va) > 3 and len(vb) > 3:
        vb_on_a = np.interp(ta, tb, vb)
        corr = float(np.corrcoef(va, vb_on_a)[0, 1])
        print(f"A median {np.median(va):.1f}  B median {np.median(vb):.1f}  "
              f"A/B {np.median(va)/np.median(vb):.2f}x  "
              f"time-corr r={corr:.2f}", flush=True)
        verdict = ("time-correlated contention (external)" if corr > 0.5
                   else "per-connection state" if
                   max(np.median(va), np.median(vb)) /
                   min(np.median(va), np.median(vb)) > 1.5
                   else "no large variance observed this run")
        print(f"verdict: {verdict}", flush=True)


if __name__ == "__main__":
    if "--probe" in sys.argv:
        secs = float(sys.argv[sys.argv.index("--secs") + 1]) \
            if "--secs" in sys.argv else 30.0
        probe(secs=secs)
    else:
        experiment()
