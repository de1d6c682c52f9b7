"""HBM-bandwidth roofline: measured ceiling vs the framework's fused elemwise.

The BASELINE north star demands fused elemwise >= 90% of the HBM
roofline.  Round-2 numbers (~400 GB/s at 16384^2) timed whole dispatches
through the axon tunnel, which carries a LARGE fixed per-call cost
(~40-50 ms for a call + scalar readback at this size) — they bounded the
dispatch path, not the chip.  This probe removes every fixed cost by
construction: the elemwise op runs k times INSIDE one XLA program
(``lax.fori_loop`` / the framework's ``scan``), timed at two different k,
and the bandwidth comes from the SLOPE (t(k2)-t(k1))/(k2-k1) — compile
time, dispatch, the sync reduction, and host transfer all cancel.

Probes (STREAM-style; traffic per in-program iteration):

- ``scale``:  a <- c * a                  read N + write N  = 2N
- ``triad``:  a <- a + c * b              read 2N + write N = 3N
- framework ``triad`` — the SAME body built symbolically and compiled
  through the full pipeline (scan carry, fused Elemwise);
  ``hbm_roofline_frac`` = framework / raw.
- framework ``chain7`` — tanh(exp(-a*a)*b + a/(1+|b|)): same 3N traffic
  but transcendental-heavy, so it reports the fused VPU compute rate at
  HBM-scale arrays (secondary metric, not the roofline test).

Methodology notes: straight-line repetition is NOT usable here — XLA
constant-folds x*c*...*c chains (measured "1900+ GB/s", i.e. > spec),
and unrolled loop bodies fuse, so only a real while-loop body with
buffer aliasing measures steady-state HBM traffic.  The k=4 vs k=48
fori_loop HLO was inspected to confirm the body is exactly one in-place
elemwise fusion per iteration.

Reference counterpart: elemwise C loops (``aesara/tensor/elemwise_cgen.py``)
are memory-bound the same way; the roofline fraction is the honest
cross-backend metric.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_LO, K_HI = 4, 48


def _sync_time(fn, *args):
    import jax.numpy as jnp

    t0 = time.perf_counter()
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    return time.perf_counter() - t0


def _slope(make_fn, args, reps=3):
    """Best-of-reps times at K_LO and K_HI -> seconds per iteration."""
    return min(_slope_samples(make_fn, args, reps))


def _slope_samples(make_fn, args, reps=3):
    """Per-rep slope samples over the SAME two compiled programs.

    Each program (K_LO / K_HI trip count) compiles ONCE; the i-th slope
    pairs the i-th fastest timing of each, so the sample spread measures
    execution jitter, never recompiles (a fresh XLA compile through the
    axon tunnel costs minutes).
    """
    times = {}
    for k in (K_LO, K_HI):
        fn = make_fn(k)
        _sync_time(fn, *args)  # compile + warm
        times[k] = sorted(_sync_time(fn, *args) for _ in range(reps))
    return [
        (hi - lo) / (K_HI - K_LO)
        for lo, hi in zip(times[K_LO], times[K_HI])
    ]


def raw_probe(n_side=16384, dtype="float32", reps=3):
    """Raw-jax ceiling: scale + triad while-loops, slope-timed."""
    import jax
    from jax import lax

    nbytes = n_side * n_side * np.dtype(dtype).itemsize
    a = jax.random.normal(jax.random.PRNGKey(0), (n_side, n_side), dtype=dtype)
    b = jax.random.normal(jax.random.PRNGKey(1), (n_side, n_side), dtype=dtype)

    def make_scale(k):
        @jax.jit
        def f(a):
            return lax.fori_loop(0, k, lambda i, x: x * 1.0000001, a)
        return f

    def make_triad(k):
        @jax.jit
        def f(a, b):
            return lax.fori_loop(0, k, lambda i, x: x + 1e-7 * b, a)
        return f

    return {
        "scale": 2 * nbytes / _slope(make_scale, (a,), reps) / 1e9,
        "triad": 3 * nbytes / _slope(make_triad, (a, b), reps) / 1e9,
    }


def _framework_scan_gbps(body, n_side, dtype, reps, traffic_factor,
                         samples=False):
    """Slope-timed framework scan whose body is ``body(x, y)``."""
    import aesara_tpu as atp
    from aesara_tpu.scan.basic import scan

    nbytes = n_side * n_side * np.dtype(dtype).itemsize
    rng = np.random.default_rng(0)
    av = rng.normal(size=(n_side, n_side)).astype(dtype)
    bv = rng.normal(size=(n_side, n_side)).astype(dtype)
    a = atp.shared(av, name="a")
    b = atp.shared(bv, name="b")

    def make(k):
        hs, _ = scan(body, outputs_info=[a], non_sequences=[b], n_steps=k)
        f = atp.function([], [], updates={a: hs[-1]}, mode="FAST_RUN")

        def call():
            f()
            return a.container.storage[0]

        return call

    if samples:
        return [traffic_factor * nbytes / s / 1e9
                for s in _slope_samples(make, (), reps)]
    return traffic_factor * nbytes / _slope(make, (), reps) / 1e9


def framework_triad(n_side=16384, dtype="float32", reps=3, samples=False):
    return _framework_scan_gbps(
        lambda x, y: x + np.asarray(1e-7, dtype) * y,
        n_side, dtype, reps, 3, samples=samples,
    )


def framework_chain7(n_side=16384, dtype="float32", reps=3):
    import aesara_tpu.tensor as at

    return _framework_scan_gbps(
        lambda x, y: at.tanh(at.exp(-x * x) * y + x / (1.0 + at.abs(y))),
        n_side, dtype, reps, 3,
    )


def main():
    raw = raw_probe()
    print(json.dumps({f"raw_{k}_gbps": round(v, 1) for k, v in raw.items()}),
          flush=True)
    fw = framework_triad()
    print(json.dumps({"framework_triad_gbps": round(fw, 1),
                      "hbm_roofline_frac": round(fw / raw["triad"], 3)}),
          flush=True)
    chain = framework_chain7()
    print(json.dumps({"framework_chain7_gbps": round(chain, 1)}), flush=True)


if __name__ == "__main__":
    main()
