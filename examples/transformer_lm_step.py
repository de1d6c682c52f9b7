"""A transformer-encoder train step — attention runs through the
fused_attention op (FlashAttention Pallas kernel at T>=2048 on TPU)."""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.models import TransformerEncoderLayer, adam

rng = np.random.default_rng(2)
B, T, D = 8, 64, 128
X = rng.normal(size=(B, T, D)).astype("float32")

x = at.tensor3("x")
layer = TransformerEncoderLayer(d_model=D, n_heads=4, d_ff=256)
cost = layer.loss(x)
train = atp.function([x], cost, updates=adam(cost, layer.params, lr=1e-3))

losses = [float(train(X)) for _ in range(20)]
print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f}")
assert losses[-1] < losses[0]
