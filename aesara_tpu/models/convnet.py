"""Small conv net (the reference tutorial LeNet — conv → pool → dense —
as a package model).  Convs lower to ``lax.conv_general_dilated`` on the
MXU; pooling to ``reduce_window``."""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from aesara_tpu.compile.sharedvalue import shared
from aesara_tpu.config import config
from aesara_tpu.models.base import Model, glorot, zeros
from aesara_tpu.tensor import math as tm
from aesara_tpu.tensor.basic import arange
from aesara_tpu.tensor.nnet.abstract_conv import conv2d
from aesara_tpu.tensor.nnet.pool import pool_2d
from aesara_tpu.tensor.special import log_softmax


class ConvNet(Model):
    """conv(3x3) → relu → maxpool(2) stages, then a dense classifier.

    Input layout NCHW (the reference's convention)."""

    def __init__(self, in_channels: int, image_hw: Tuple[int, int],
                 channels: Sequence[int], n_out: int, seed: int = 0):
        super().__init__()
        rng = np.random.default_rng(seed)
        self.filters = []
        c_prev = in_channels
        h, w = image_hw
        for i, c in enumerate(channels):
            fan_in, fan_out = c_prev * 9, c * 9
            limit = np.sqrt(6.0 / (fan_in + fan_out))
            f = rng.uniform(-limit, limit, size=(c, c_prev, 3, 3)).astype(config.floatX)
            self.filters.append(self._register(shared(f, name=f"f{i}")))
            c_prev = c
            h, w = h // 2, w // 2  # 'half' conv keeps HW; pool halves
        self.flat_dim = c_prev * h * w
        self.w_out = self._register(glorot(rng, self.flat_dim, n_out, "w_out"))
        self.b_out = self._register(zeros((n_out,), "b_out"))

    def logits(self, x):
        h = x
        for f in self.filters:
            h = conv2d(h, f, border_mode="half")
            h = tm.maximum(h, 0.0)
            h = pool_2d(h, ws=(2, 2), ignore_border=True)
        flat = h.reshape((h.shape[0], self.flat_dim))
        return tm.dot(flat, self.w_out) + self.b_out

    def predict(self, x):
        return tm.argmax(self.logits(x), axis=1)

    def loss(self, x, y):
        logp = log_softmax(self.logits(x), axis=-1)
        return -tm.mean(logp[arange(y.shape[0]), y])
