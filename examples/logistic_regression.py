"""The reference's canonical tutorial program (doc/tutorial of
aesara-devs/aesara): logistic regression with symbolic grads + shared
state."""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.models import LogisticRegression, sgd

rng = np.random.default_rng(0)
N, D = 400, 20
X = rng.normal(size=(N, D)).astype("float32")
y = (X @ rng.normal(size=D) > 0).astype("int64")

x_sym = at.matrix("x")
y_sym = at.lvector("y")
model = LogisticRegression(D, 2)
cost = model.loss(x_sym, y_sym)
train = atp.function([x_sym, y_sym], cost,
                     updates=sgd(cost, model.params, lr=0.1))
predict = atp.function([x_sym], model.predict(x_sym))

for epoch in range(50):
    loss = train(X, y)
print(f"final loss: {float(loss):.4f}")
acc = (np.asarray(predict(X)) == y).mean()
print(f"train accuracy: {acc:.3f}")
assert acc > 0.9
