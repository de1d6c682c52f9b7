"""Continuous-batching serving throughput (models/serve.ContinuousBatcher).

Measures tokens/s for a slot-based serve loop on one chip across chunk
sizes (decode steps per host readback).  The chunk sweep quantifies the
synchronous-readback tunnel RTT that dominates chunk=1 — see
doc/performance.md "Dispatch floor" and benchmarks/README.md
"Round 3: continuous batching" for the recorded numbers.

Usage: python benchmarks/bench_serving.py [--chunks 1,4,16]
"""

import argparse
import json
import time

import numpy as np


def run(chunk: int, n_slots=32, t_max=256, t_pad=32, n_new=64):
    from aesara_tpu.models.decoder import DecoderLM
    from aesara_tpu.models.serve import ContinuousBatcher

    model = DecoderLM(2048, n_layers=4, d_model=512, n_heads=8,
                      d_ff=2048, seed=0)
    srv = ContinuousBatcher(model, n_slots=n_slots, t_max=t_max,
                            t_pad=t_pad, chunk=chunk)
    rng = np.random.default_rng(0)
    for _ in range(n_slots):
        srv.submit(rng.integers(0, 2048, size=16).astype("int64"),
                   max_new=n_new)
    srv.step()  # warm compile
    t0 = time.perf_counter()
    ntok = 0
    while srv.pending():
        ntok += len(srv.step())
    dt = time.perf_counter() - t0
    return {"metric": f"serve_tok_per_s_chunk{chunk}",
            "value": round(ntok / dt, 1), "unit": "tokens/s",
            "slots": n_slots, "tokens": ntok}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="1,16")
    args = ap.parse_args()
    for c in (int(x) for x in args.chunks.split(",")):
        print(json.dumps(run(c)), flush=True)


if __name__ == "__main__":
    main()
