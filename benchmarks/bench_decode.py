"""Autoregressive serving throughput: KV-cache greedy decode.

The whole decode loop — embedding, L causal layers reading/writing
per-layer KV caches, the LM head, argmax — is ONE compiled XLA program
(a framework scan); set_subtensor cache writes lower to in-place
dynamic-update-slice on the donated carry.

Run: python benchmarks/bench_decode.py  (real chip, no overrides)
"""

import time

import numpy as np


def main():
    import aesara_tpu as atp
    from aesara_tpu.models.decoder import DecoderLM

    vocab, L, d, H, ff = 32000, 4, 512, 8, 2048
    t_max = 512
    n_steps = 256

    for dtype in ("float32", "bfloat16"):
        with atp.config.change_flags(floatX=dtype,
                                     jax_default_matmul_precision="default"):
            lm = DecoderLM(vocab, L, d, H, ff, seed=0)
            n_params = sum(int(np.prod(p.get_value().shape))
                           for p in lm.params)
            gen = lm.generate_fn(n_steps=n_steps, t_max=t_max,
                                 mode="FAST_RUN")
            out = np.asarray(gen(np.int64(17)))     # compile + run
            assert out.shape == (n_steps,)
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                out = np.asarray(gen(np.int64(17)))
            dt = (time.perf_counter() - t0) / iters
            tok_s = n_steps / dt
            print(f"decode {L}L d={d} ff={ff} vocab={vocab} "
                  f"({n_params/1e6:.1f}M params) {dtype}: "
                  f"{tok_s:,.0f} tokens/s  ({dt/n_steps*1e3:.2f} ms/token)",
                  flush=True)

            # batched serving: B=32 synchronized streams
            B = 32
            genb = lm.generate_batched_fn(batch=B, n_steps=n_steps,
                                          t_max=t_max, mode="FAST_RUN")
            toks0 = np.arange(B, dtype="int64") % vocab
            out = np.asarray(genb(toks0))
            assert out.shape == (n_steps, B)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = np.asarray(genb(toks0))
            dtb = (time.perf_counter() - t0) / iters
            print(f"  batched B={B}: {B*n_steps/dtb:,.0f} tokens/s "
                  f"({dtb/n_steps*1e3:.2f} ms/step)", flush=True)

            # bf16-only extras (each fresh program is a multi-minute
            # XLA compile through the tunnel)
            if dtype == "bfloat16":
                # prompt prefill: one batched pass filling the caches
                P = 256
                genp = lm.generate_from_prompt_fn(
                    prompt_len=P, n_new=8, t_max=t_max, mode="FAST_RUN")
                prompt = (np.arange(P, dtype="int64") * 7) % vocab
                np.asarray(genp(prompt))
                t0 = time.perf_counter()
                for _ in range(iters):
                    np.asarray(genp(prompt))
                dtp = (time.perf_counter() - t0) / iters
                print(f"  prefill P={P} (+8 decode): "
                      f"{P/dtp:,.0f} prompt tokens/s", flush=True)

            # weight-only int8: halve/quarter the HBM weight traffic
            if dtype == "bfloat16":
                from aesara_tpu.models.quant import quantize_decoder_int8

                qlm = quantize_decoder_int8(lm)
                genq = qlm.generate_fn(n_steps=n_steps, t_max=t_max,
                                       mode="FAST_RUN")
                np.asarray(genq(np.int64(17)))
                t0 = time.perf_counter()
                for _ in range(iters):
                    np.asarray(genq(np.int64(17)))
                dtq = (time.perf_counter() - t0) / iters
                print(f"  int8 single: {n_steps/dtq:,.0f} tokens/s "
                      f"({dtq/n_steps*1e3:.2f} ms/token)", flush=True)


if __name__ == "__main__":
    main()
