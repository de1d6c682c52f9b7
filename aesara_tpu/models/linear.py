"""Linear model family (the reference's tutorial logistic regression —
``doc/tutorial/examples.rst`` of aesara-devs/aesara — as a package)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.models.base import Model, glorot, zeros
from aesara_tpu.tensor import math as tm
from aesara_tpu.tensor.special import log_softmax as _log_softmax


class LinearRegression(Model):
    def __init__(self, n_in: int, seed: int = 0):
        super().__init__()
        rng = np.random.default_rng(seed)
        self.w = self._register(glorot(rng, n_in, 1, "w"))
        self.b = self._register(zeros((), "b"))

    def predict(self, x):
        return tm.dot(x, self.w)[:, 0] + self.b

    def loss(self, x, y):
        d = self.predict(x) - y
        return tm.mean(d * d)


class LogisticRegression(Model):
    """Multinomial logistic regression: softmax(xW + b)."""

    def __init__(self, n_in: int, n_out: int, seed: int = 0):
        super().__init__()
        rng = np.random.default_rng(seed)
        self.w = self._register(glorot(rng, n_in, n_out, "w"))
        self.b = self._register(zeros((n_out,), "b"))

    def logits(self, x):
        return tm.dot(x, self.w) + self.b

    def predict(self, x):
        return tm.argmax(self.logits(x), axis=1)

    def loss(self, x, y):
        """mean NLL with integer targets (stable log-softmax form)."""
        logp = _log_softmax(self.logits(x), axis=-1)
        n = y.shape[0]
        from aesara_tpu.tensor.basic import arange

        return -tm.mean(logp[arange(n), y])
