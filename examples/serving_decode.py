"""KV-cache serving end to end: prefill a prompt, decode a batch.

Run:  python examples/serving_decode.py        (any backend)
"""

import numpy as np

import aesara_tpu as atp
from aesara_tpu.models import DecoderLM


def main():
    lm = DecoderLM(vocab=1000, n_layers=2, d_model=128, n_heads=8,
                   d_ff=256, seed=0)

    # 1. single-stream generation from a start token
    gen = lm.generate_fn(n_steps=16, t_max=32)
    print("greedy:", np.asarray(gen(np.int64(7))))

    # 2. prompt prefill + decode (one program)
    gen_p = lm.generate_from_prompt_fn(prompt_len=8, n_new=16, t_max=32)
    prompt = np.arange(8, dtype="int64") + 100
    print("from prompt:", np.asarray(gen_p(prompt)))

    # 3. batched serving: 16 streams in lockstep
    gen_b = lm.generate_batched_fn(batch=16, n_steps=16, t_max=32)
    toks0 = np.arange(16, dtype="int64")
    out = np.asarray(gen_b(toks0))
    print("batched:", out.shape, "first stream:", out[:, 0])


if __name__ == "__main__":
    main()
