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
# in seconds; both sides run the SAME shapes.  REFRATIO_SCALE=k (int)
# scales the data dimensions k-fold on BOTH sides — used to show where
# the latency-bound micro sizes flip to throughput-bound production
# sizes (documented per config in benchmarks/README.md).
SIZES = {
    1: dict(n=4096, d=784, iters=50),
    2: dict(n=2048, d=1024, iters=30),
    3: dict(b=128, din=784, h=512, dout=10, iters=50),
    4: dict(t=128, b=32, h=128, din=64, iters=10),
    5: dict(n=4096, d=2048, density=0.01, iters=150),
}

_SCALE = int(os.environ.get("REFRATIO_SCALE", "1"))
if _SCALE > 1:
    for _cfg, _keys in ((1, ("n",)), (2, ("n",)), (3, ("b",)), (4, ("b",)),
                        (5, ("n", "d"))):
        for _k in _keys:
            SIZES[_cfg][_k] *= _SCALE

# REFRATIO_KSTEP=k: the TPU side compiles through the PUBLIC
# function(..., steps_per_call=k) API — no hand-written scan — so each
# dispatch runs k steps and per-step time divides by k.  The reference
# side keeps its own public per-call function() (it has no equivalent).
_KSTEP = int(os.environ.get("REFRATIO_KSTEP", "0"))


def _mk_function(mod, side, *fargs, **fkw):
    """mod.function(...), with steps_per_call on the TPU side under
    REFRATIO_KSTEP.  Returns (callable, k)."""
    if side == "tpu" and _KSTEP > 1:
        fkw["steps_per_call"] = _KSTEP
        return mod.function(*fargs, **fkw), _KSTEP
    return mod.function(*fargs, **fkw), 1


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


def _time_calls(f, args, iters, sync=None, warmup=3, repeats=3):
    """Best-of-``repeats`` timing (timeit convention): through the axon
    tunnel a single pass has host-side jitter of up to 2x, on BOTH
    sides' dispatch paths; the min is the reproducible number."""
    for _ in range(warmup):
        f(*args)
    if sync is not None:
        sync()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            f(*args)
        if sync is not None:
            sync()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


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

    # All datasets live in SHARED variables (the reference's own tutorial
    # idiom — logistic_sgd.py keeps the dataset in shared storage and
    # feeds only a scalar batch index).  On the TPU side this keeps data
    # device-resident, so steps/s measures the compiled program rather
    # than the axon tunnel's host->device upload bandwidth; on the
    # reference side shared storage is plain host RAM (zero-cost either
    # way, so the choice does not favor this repo).

    if cfg == 1:
        xv = rng.normal(size=(S["n"], S["d"])).astype(floatX)
        yv = (rng.random(S["n"]) > 0.5).astype(floatX)
        X = mod.shared(xv, name="X")
        Y = mod.shared(yv, name="Y")
        w = mod.shared(rng.normal(size=S["d"]).astype(floatX) * 0.01, name="w")
        b = mod.shared(np.asarray(0.0, dtype=floatX), name="b")
        p = at.sigmoid(at.dot(X, w) + b)
        eps = np.asarray(1e-7, dtype=floatX)
        nll = -at.mean(Y * at.log(p + eps) + (1 - Y) * at.log(1 - p + eps))
        gw, gb = mod.grad(nll, [w, b])
        lr = np.asarray(0.1, dtype=floatX)
        f, k = _mk_function(
            mod, side, [], [],
            updates={w: w - lr * gw, b: b - lr * gb}, mode="FAST_RUN",
        )
        dt = _time_calls(f, (), max(3, S["iters"] // k),
                         sync=_sync_shared(w)) / k
        return {"metric": "sgd_steps_per_s", "value": 1.0 / dt}

    if cfg == 2:
        xv = rng.normal(size=(S["n"], S["d"])).astype(floatX)
        X = mod.shared(xv, name="X")
        h = X
        for _ in range(4):
            e = at.exp(h - at.max(h, axis=1, keepdims=True))
            sm = e / at.sum(e, axis=1, keepdims=True)
            lse = at.log(at.sum(at.exp(sm), axis=1, keepdims=True))
            h = sm * np.asarray(1.1, floatX) + at.tanh(lse)
        out = at.sum(h)
        f, k = _mk_function(mod, side, [], out, mode="FAST_RUN")
        dt = _time_calls(f, (), max(3, S["iters"] // k)) / k
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
        # minibatch via scalar index + givens over a device-resident
        # dataset — the reference tutorial's logistic_sgd.py pattern
        nbatch = 10
        Xd = mod.shared(
            rng.normal(size=(nbatch * S["b"], S["din"])).astype(floatX), name="Xd"
        )
        Yd = mod.shared(
            rng.integers(0, S["dout"], size=nbatch * S["b"]).astype("int64"),
            name="Yd",
        )
        idx = at.iscalar("idx")
        B = S["b"]
        f, k = _mk_function(
            mod, side, [idx], [], updates=ups,
            givens={x: Xd[idx * B:(idx + 1) * B], y: Yd[idx * B:(idx + 1) * B]},
            mode="FAST_RUN",
        )
        state = {"i": 0}

        def call(_f=f):
            _f(state["i"] % nbatch)
            state["i"] += 1

        dt = _time_calls(lambda: call(), (), max(3, S["iters"] // k),
                         sync=_sync_shared(ws[0])) / k
        return {"metric": "sgd_steps_per_s", "value": 1.0 / dt}

    if cfg == 4:
        if side == "ref":
            from aesara import scan
        else:
            from aesara_tpu.scan.basic import scan
        xv = rng.normal(size=(S["t"], S["b"], S["din"])).astype(floatX)
        x = mod.shared(xv, name="x")  # (T, B, Din) device-resident
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
        f, k = _mk_function(mod, side, [], [], updates=ups, mode="FAST_RUN")
        dt = _time_calls(f, (), max(3, S["iters"] // k),
                         sync=_sync_shared(wx)) / k
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
        x = mod.shared(xs, name="x")  # device-resident CSR
        y = mod.shared(rng.normal(size=n).astype(floatX), name="y")
        w = mod.shared(rng.normal(size=d).astype(floatX) * 0.01, name="w")
        srng = RandomStream(seed=42)
        lr = np.asarray(0.1, floatX)

        def glm_step(wv):
            eps = srng.normal(size=(d,), dtype=floatX) * np.asarray(0.01, floatX)
            pred = sparse.structured_dot(x, at.shape_padright(wv + eps)).flatten()
            loss = at.mean((pred - y) ** 2)
            gw = mod.grad(loss, wv)
            return wv - lr * gw

        if os.environ.get("REFRATIO_FUSED", "0") == "1":
            # the SAME training step, with the loop fused into ONE
            # compiled program via scan on BOTH sides — the production
            # pattern on TPU (amortizes the per-dispatch tunnel floor)
            # and equally available on the reference's scan
            if side == "ref":
                from aesara import scan
            else:
                from aesara_tpu.scan.basic import scan

            K = 100
            ws, updates = scan(glm_step, outputs_info=[w], n_steps=K)
            f = mod.function(
                [], [], updates={**dict(updates), w: ws[-1]}, mode="FAST_RUN"
            )
            dt = _time_calls(f, (), max(3, S["iters"] // 10),
                             sync=_sync_shared(w)) / K
            return {"metric": "mc_sgd_steps_per_s", "value": 1.0 / dt}

        wnew = glm_step(w)
        f, k = _mk_function(mod, side, [], [], updates={w: wnew},
                            mode="FAST_RUN")
        dt = _time_calls(f, (), max(3, S["iters"] // k),
                         sync=_sync_shared(w)) / k
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
