"""Production training loop: AdamW + warmup-cosine schedule + dynamic
loss scaling + checkpointing, all compiled into ONE train-step program.

Run:  python examples/production_training.py
"""

import os
import tempfile

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import Out
from aesara_tpu.models import DecoderLM
from aesara_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from aesara_tpu.models.optim import adamw_from_grads, scaled_loss_updates, warmup_cosine
from aesara_tpu.compile.sharedvalue import shared


def main():
    lm = DecoderLM(vocab=100, n_layers=2, d_model=64, n_heads=4, d_ff=128,
                   seed=0)
    toks = at.lvector("toks")
    loss = lm.loss(toks)

    # schedule driven by a shared step counter, compiled INTO the step
    step_ctr = shared(np.float32(0.0), name="step")
    lr = warmup_cosine(step_ctr, lr_max=3e-3, warmup_steps=20,
                       total_steps=200)

    # dynamic loss scaling wrapping AdamW (bf16/f16-safe recipe)
    updates = scaled_loss_updates(
        loss, lm.params,
        lambda grads: adamw_from_grads(lm.params, grads, lr=lr,
                                       weight_decay=0.01),
    )
    updates.append((step_ctr, step_ctr + 1.0))

    train = atp.function([toks], Out(loss, borrow=True), updates=updates)

    rng = np.random.default_rng(0)
    data = rng.integers(0, 100, size=(50, 24)).astype("int64")
    ckpt = os.path.join(tempfile.mkdtemp(), "ck.npz")
    last = None
    for epoch in range(2):
        for row in data:
            last = train(row)
        save_checkpoint(ckpt, lm.params, updates,
                        extra={"epoch": np.int64(epoch)})
        print(f"epoch {epoch}: loss {float(np.asarray(last)):.4f} "
              f"(checkpoint -> {ckpt})")

    # resume into a FRESH graph
    lm2 = DecoderLM(vocab=100, n_layers=2, d_model=64, n_heads=4, d_ff=128,
                    seed=0)
    loss2 = lm2.loss(toks)
    step_ctr2 = shared(np.float32(0.0), name="step")
    lr2 = warmup_cosine(step_ctr2, lr_max=3e-3, warmup_steps=20,
                        total_steps=200)
    updates2 = scaled_loss_updates(
        loss2, lm2.params,
        lambda grads: adamw_from_grads(lm2.params, grads, lr=lr2,
                                       weight_decay=0.01),
    )
    updates2.append((step_ctr2, step_ctr2 + 1.0))
    extra = load_checkpoint(ckpt, lm2.params, updates2)
    print("resumed at epoch", int(extra["epoch"]) + 1)

    # serve the trained model
    gen = lm2.generate_fn(n_steps=8, t_max=16)
    print("sample:", np.asarray(gen(np.int64(1))))


if __name__ == "__main__":
    main()
