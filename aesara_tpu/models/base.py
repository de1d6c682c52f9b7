"""Shared plumbing for the model builders."""

from __future__ import annotations

from typing import List

import numpy as np

from aesara_tpu.compile.sharedvalue import shared
from aesara_tpu.config import config


def glorot(rng: np.random.Generator, n_in: int, n_out: int, name: str):
    limit = np.sqrt(6.0 / (n_in + n_out))
    w = rng.uniform(-limit, limit, size=(n_in, n_out)).astype(config.floatX)
    return shared(w, name=name)


def zeros(shape, name: str):
    return shared(np.zeros(shape, dtype=config.floatX), name=name)


class Model:
    """Parameter registry + train/predict compilation helpers."""

    def __init__(self):
        self.params: List = []

    def _register(self, *ps):
        self.params.extend(ps)
        return ps if len(ps) > 1 else ps[0]

    def get_values(self):
        return [np.asarray(p.get_value()) for p in self.params]

    def set_values(self, values):
        for p, v in zip(self.params, values):
            p.set_value(np.asarray(v))
