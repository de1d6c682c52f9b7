"""Sequence classification with an LSTM: the whole loop (forward scan +
reverse-scan BPTT + adam state) is one XLA program."""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.models import LSTM, adam

rng = np.random.default_rng(1)
T, B, D = 20, 32, 8
# task: does the sequence's cumulative sum end positive?
X = rng.normal(size=(T, B, D)).astype("float32")
y = (X.sum(axis=(0, 2)) > 0).astype("int64")

xs = at.tensor3("xs")
ys = at.lvector("ys")
model = LSTM(D, 32, 2)
cost = model.loss(xs, ys)
train = atp.function([xs, ys], cost, updates=adam(cost, model.params, lr=0.01))

losses = [float(train(X, y)) for _ in range(60)]
print(f"loss: {losses[0]:.3f} -> {losses[-1]:.3f}")
assert losses[-1] < losses[0] * 0.5
