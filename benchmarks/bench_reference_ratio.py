"""BASELINE config sweep: this repo (TPU) vs the REFERENCE's own backend.

BASELINE.md demands ratios against the reference's backends, not just the
2016-GPU published number.  This script runs each BASELINE.json config on
both sides **through the same graph-building code** (the API surfaces are
compatible by design) and prints per-config ratios:

- ``--side ref``  : imports the reference from /root/reference (via
  ``refdeps/ref_bootstrap`` — NumPy-2 compat + dep shims) and runs its
  FAST_RUN / CVM backend with compiled C thunks on the host CPU.
- ``--side tpu``  : imports ``aesara_tpu`` and runs FAST_RUN (whole-graph
  XLA) on the TPU chip.
- ``--all``       : orchestrates both sides per config in subprocesses
  (backends must not share a process) and prints the ratio table.

Honesty notes (also in benchmarks/README.md):
- numba is NOT installed in this image, so the scan north star
  ("≥5× the Numba backend") is measured against the reference's C/CVM
  FAST_RUN instead — its best available backend here.  Published
  reference CI asserts Numba ≈ C-backend-level performance on these
  graph shapes (/root/reference/tests/link/numba/test_performance.py),
  so C/CVM is a fair stand-in.
- The host has 1 CPU core; the reference numbers are single-threaded
  (its elemwise C loops are single-threaded by default anyway).
- Config 1 is float64 on the reference per BASELINE.json ("float64
  CPU"); the TPU side runs float32 (TPU has no f64 ALU worth using —
  the dtype is part of each platform's native config, and the metric is
  end-to-end steps/s).
- TPU timings include the ~0.8 ms/dispatch axon-tunnel floor (real
  user-visible cost through this harness).

Reference counterparts: aesara.function pipeline + CVM
(/root/reference/aesara/compile/function/types.py, link/c/cvm.py),
check_blas-style timing loops (/root/reference/aesara/misc/check_blas.py:58).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIG_NAMES = {
    1: "logreg_sgd (f64 ref / f32 tpu)",
    2: "elemwise_softmax_chain",
    3: "mlp_mnist_gemm",
    4: "scan_rnn_bptt",
    5: "sparse_glm_mc",
}

# Moderate sizes so the single-core reference side finishes each config
# in seconds; both sides run the SAME shapes.
SIZES = {
    1: dict(n=4096, d=784, iters=50),
    2: dict(n=2048, d=1024, iters=30),
    3: dict(b=128, din=784, h=512, dout=10, iters=50),
    4: dict(t=128, b=32, h=128, din=64, iters=10),
    5: dict(n=4096, d=2048, density=0.01, iters=30),
}


def _import_side(side):
    if side == "ref":
        sys.path[:0] = [os.path.join(REPO, "benchmarks", "refdeps"), "/root/reference"]
        import ref_bootstrap

        ref_bootstrap.install()
        import aesara as mod

        ref_bootstrap.install_c_compat()
        ref_bootstrap.block_cython_scan()
        import aesara.tensor as at
        import aesara.sparse as sparse
        from aesara.tensor.random.utils import RandomStream
    else:
        sys.path.insert(0, REPO)
        import aesara_tpu as mod
        import aesara_tpu.tensor as at
        import aesara_tpu.sparse as sparse
        from aesara_tpu.tensor.random.utils import RandomStream
    return mod, at, sparse, RandomStream


def _time_calls(f, args, iters, sync=None, warmup=3):
    for _ in range(warmup):
        f(*args)
    if sync is not None:
        sync()
    t0 = time.perf_counter()
    for _ in range(iters):
        f(*args)
    if sync is not None:
        sync()
    return (time.perf_counter() - t0) / iters


def _sync_shared(sv):
    """Force device completion by materializing a scalar from the buffer."""

    def sync():
        v = sv.container.storage[0]
        try:
            float(np.asarray(v).ravel()[0]) if hasattr(v, "shape") else float(v)
        except Exception:
            np.asarray(v)

    return sync


def run_config(cfg, side):
    mod, at, sparse, RandomStream = _import_side(side)
    floatX = "float64" if (cfg == 1 and side == "ref") else "float32"
    try:
        mod.config.floatX = floatX
    except Exception:
        pass
    rng = np.random.default_rng(0)
    S = SIZES[cfg]

    if cfg == 1:
        x = at.matrix("x", dtype=floatX)
        y = at.vector("y", dtype=floatX)
        w = mod.shared(rng.normal(size=S["d"]).astype(floatX) * 0.01, name="w")
        b = mod.shared(np.asarray(0.0, dtype=floatX), name="b")
        p = at.sigmoid(at.dot(x, w) + b)
        eps = np.asarray(1e-7, dtype=floatX)
        nll = -at.mean(y * at.log(p + eps) + (1 - y) * at.log(1 - p + eps))
        gw, gb = mod.grad(nll, [w, b])
        lr = np.asarray(0.1, dtype=floatX)
        f = mod.function(
            [x, y], [], updates={w: w - lr * gw, b: b - lr * gb}, mode="FAST_RUN"
        )
        xv = rng.normal(size=(S["n"], S["d"])).astype(floatX)
        yv = (rng.random(S["n"]) > 0.5).astype(floatX)
        dt = _time_calls(f, (xv, yv), S["iters"], sync=_sync_shared(w))
        return {"metric": "sgd_steps_per_s", "value": 1.0 / dt}

    if cfg == 2:
        x = at.matrix("x", dtype=floatX)
        h = x
        for _ in range(4):
            e = at.exp(h - at.max(h, axis=1, keepdims=True))
            sm = e / at.sum(e, axis=1, keepdims=True)
            lse = at.log(at.sum(at.exp(sm), axis=1, keepdims=True))
            h = sm * np.asarray(1.1, floatX) + at.tanh(lse)
        out = at.sum(h)
        f = mod.function([x], out, mode="FAST_RUN")
        xv = rng.normal(size=(S["n"], S["d"])).astype(floatX)
        dt = _time_calls(f, (xv,), S["iters"])
        return {"metric": "calls_per_s", "value": 1.0 / dt}

    if cfg == 3:
        x = at.matrix("x", dtype=floatX)
        y = at.lvector("y") if hasattr(at, "lvector") else at.vector("y", dtype="int64")
        sizes = [(S["din"], S["h"]), (S["h"], S["h"]), (S["h"], S["dout"])]
        ws = [
            mod.shared((rng.normal(size=s) * (1.0 / np.sqrt(s[0]))).astype(floatX))
            for s in sizes
        ]
        bs = [mod.shared(np.zeros(s[1], dtype=floatX)) for s in sizes]
        h = x
        for i, (wi, bi) in enumerate(zip(ws, bs)):
            h = at.dot(h, wi) + bi
            if i < 2:
                h = at.tanh(h)
        lse = at.log(at.sum(at.exp(h - at.max(h, axis=1, keepdims=True)), axis=1)) + at.max(
            h, axis=1
        )
        picked = h[at.arange(y.shape[0]), y]
        loss = at.mean(lse - picked)
        grads = mod.grad(loss, ws + bs)
        lr = np.asarray(0.01, floatX)
        ups = {p: p - lr * g for p, g in zip(ws + bs, grads)}
        f = mod.function([x, y], [], updates=ups, mode="FAST_RUN")
        xv = rng.normal(size=(S["b"], S["din"])).astype(floatX)
        yv = rng.integers(0, S["dout"], size=S["b"]).astype("int64")
        dt = _time_calls(f, (xv, yv), S["iters"], sync=_sync_shared(ws[0]))
        return {"metric": "sgd_steps_per_s", "value": 1.0 / dt}

    if cfg == 4:
        if side == "ref":
            from aesara import scan
        else:
            from aesara_tpu.scan.basic import scan
        x = at.tensor3("x", dtype=floatX)  # (T, B, Din)
        wx = mod.shared((rng.normal(size=(S["din"], S["h"])) * 0.1).astype(floatX))
        wh = mod.shared((rng.normal(size=(S["h"], S["h"])) * 0.1).astype(floatX))
        bh = mod.shared(np.zeros(S["h"], dtype=floatX))
        h0 = at.zeros((S["b"], S["h"]), dtype=floatX)

        def step(xt, htm1):
            return at.tanh(at.dot(xt, wx) + at.dot(htm1, wh) + bh)

        hs, _ = scan(step, sequences=[x], outputs_info=[h0])
        loss = at.mean(hs[-1] ** 2) + at.mean(hs**2)
        grads = mod.grad(loss, [wx, wh, bh])
        lr = np.asarray(0.01, floatX)
        ups = {p: p - lr * g for p, g in zip([wx, wh, bh], grads)}
        f = mod.function([x], [], updates=ups, mode="FAST_RUN")
        xv = rng.normal(size=(S["t"], S["b"], S["din"])).astype(floatX)
        dt = _time_calls(f, (xv,), S["iters"], sync=_sync_shared(wx))
        return {
            "metric": "seq_steps_per_s",
            "value": S["t"] / dt,
            "train_steps_per_s": 1.0 / dt,
        }

    if cfg == 5:
        import scipy.sparse as sps

        n, d = S["n"], S["d"]
        xs = sps.random(
            n, d, density=S["density"], format="csr", dtype=floatX,
            random_state=np.random.RandomState(0),
        )
        x = sparse.csr_matrix("x", dtype=floatX)
        y = at.vector("y", dtype=floatX)
        w = mod.shared(rng.normal(size=d).astype(floatX) * 0.01, name="w")
        srng = RandomStream(seed=42)
        eps = srng.normal(size=(d,), dtype=floatX) * np.asarray(0.01, floatX)
        pred = sparse.structured_dot(x, at.shape_padright(w + eps)).flatten()
        loss = at.mean((pred - y) ** 2)
        gw = mod.grad(loss, w)
        lr = np.asarray(0.1, floatX)
        f = mod.function([x, y], [], updates={w: w - lr * gw}, mode="FAST_RUN")
        yv = rng.normal(size=n).astype(floatX)
        dt = _time_calls(f, (xs, yv), S["iters"], sync=_sync_shared(w))
        return {"metric": "mc_sgd_steps_per_s", "value": 1.0 / dt}

    raise SystemExit(f"unknown config {cfg}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["ref", "tpu"])
    ap.add_argument("--config", type=int, choices=sorted(CONFIG_NAMES))
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    if not args.all:
        out = run_config(args.config, args.side)
        out.update(config=args.config, side=args.side, name=CONFIG_NAMES[args.config])
        print(json.dumps(out), flush=True)
        return

    rows = []
    for cfg in sorted(CONFIG_NAMES):
        res = {}
        for side in ("ref", "tpu"):
            cmd = [sys.executable, os.path.abspath(__file__), "--side", side,
                   "--config", str(cfg)]
            p = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800, cwd=REPO
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode != 0 or not lines:
                print(f"config {cfg} side {side} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
                res[side] = None
                continue
            res[side] = json.loads(lines[-1])
        if res.get("ref") and res.get("tpu"):
            ratio = res["tpu"]["value"] / res["ref"]["value"]
            rows.append((cfg, CONFIG_NAMES[cfg], res["ref"]["value"],
                         res["tpu"]["value"], ratio))
            print(json.dumps({
                "config": cfg, "name": CONFIG_NAMES[cfg],
                "metric": res["tpu"]["metric"],
                "ref_cvm": round(res["ref"]["value"], 2),
                "tpu": round(res["tpu"]["value"], 2),
                "ratio_tpu_over_ref": round(ratio, 2),
            }), flush=True)
    print("\n| # | config | metric | ref C/CVM | this repo (TPU) | ratio |")
    print("|---|---|---|---|---|---|")
    for cfg, name, rv, tv, ratio in rows:
        print(f"| {cfg} | {name} | steps/s | {rv:.2f} | {tv:.2f} | **{ratio:.2f}x** |")


if __name__ == "__main__":
    main()
