"""Optimizer update builders: (cost, params) → updates list for
``aesara_tpu.function(updates=...)``.

The reference leaves optimizers to user code / tutorial snippets; these
are the canonical implementations.  All state (momenta, second moments,
step counters) lives in shared variables → donated HBM buffers under
XLA, so a train step is one fused program with in-place state updates.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from aesara_tpu.compile.sharedvalue import shared
from aesara_tpu.gradient import grad as _grad
from aesara_tpu.tensor import math as tm
from aesara_tpu.tensor.basic import cast


def _grads(cost, params):
    return _grad(cost, list(params))


def _state_sharding(shape, state_shard_axis, state_shard_size):
    """ZeRO-1 annotation: shard the largest dim over the given mesh axis
    when it divides evenly; None (replicated) otherwise."""
    if state_shard_axis is None or not len(shape):
        return None
    dim = int(np.argmax(shape))
    if state_shard_size is not None and shape[dim] % state_shard_size:
        return None
    spec = [None] * len(shape)
    spec[dim] = state_shard_axis
    return tuple(spec)


def sgd(cost, params: Sequence, lr: float = 0.01) -> List[Tuple]:
    """Plain stochastic gradient descent."""
    return [(p, p - lr * g) for p, g in zip(params, _grads(cost, params))]


def momentum(cost, params: Sequence, lr: float = 0.01, mu: float = 0.9,
             state_shard_axis: str | None = None,
             state_shard_size: int | None = None) -> List[Tuple]:
    """Polyak momentum; one velocity buffer per parameter (optionally
    ZeRO-1 sharded, see ``adam``)."""
    updates = []
    for p, g in zip(params, _grads(cost, params)):
        v = shared(np.zeros(p.get_value().shape, dtype=p.get_value().dtype),
                   name=(p.name or "p") + "_vel",
                   sharding=_state_sharding(p.get_value().shape,
                                            state_shard_axis, state_shard_size))
        v_new = mu * v - lr * g
        updates.append((v, v_new))
        updates.append((p, p + v_new))
    return updates


def rmsprop(cost, params: Sequence, lr: float = 0.001, rho: float = 0.9,
            eps: float = 1e-8,
            state_shard_axis: str | None = None,
            state_shard_size: int | None = None) -> List[Tuple]:
    """RMSProp; squared-gradient accumulator per parameter (optionally
    ZeRO-1 sharded, see ``adam``)."""
    updates = []
    for p, g in zip(params, _grads(cost, params)):
        acc = shared(np.zeros(p.get_value().shape, dtype=p.get_value().dtype),
                     name=(p.name or "p") + "_acc",
                     sharding=_state_sharding(p.get_value().shape,
                                              state_shard_axis, state_shard_size))
        acc_new = rho * acc + (1.0 - rho) * g * g
        updates.append((acc, acc_new))
        updates.append((p, p - lr * g / tm.sqrt(acc_new + eps)))
    return updates


def adam(cost, params: Sequence, lr: float = 0.001, b1: float = 0.9,
         b2: float = 0.999, eps: float = 1e-8,
         state_shard_axis: str | None = None,
         state_shard_size: int | None = None) -> List[Tuple]:
    """Adam (Kingma & Ba 2015) with bias correction via a shared step
    counter — the whole optimizer is part of the single jitted step.

    ``state_shard_axis`` is ZeRO-1: the m/v moment buffers get a
    sharding annotation along their largest dimension over that mesh
    axis, so under ``pjit_function`` GSPMD keeps optimizer state
    partitioned across the data-parallel ranks (each rank stores and
    updates 1/N of it, with the gradient reduce-scattered and the fresh
    params all-gathered by XLA) instead of replicating ~2x param memory
    per rank.  Pass ``state_shard_size`` (the mesh axis size) so buffers
    whose dims don't divide evenly — small biases — stay replicated."""
    t = shared(np.asarray(0.0, dtype="float32"), name="adam_t")
    t_new = t + 1.0
    updates = [(t, t_new)]
    for p, g in zip(params, _grads(cost, params)):
        dt = p.get_value().dtype
        shape = p.get_value().shape
        sharding = _state_sharding(shape, state_shard_axis, state_shard_size)
        m = shared(np.zeros(shape, dtype=dt),
                   name=(p.name or "p") + "_m", sharding=sharding)
        v = shared(np.zeros(shape, dtype=dt),
                   name=(p.name or "p") + "_v", sharding=sharding)
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        m_hat = m_new / (1.0 - tm.pow(cast(b1, "float32"), t_new))
        v_hat = v_new / (1.0 - tm.pow(cast(b2, "float32"), t_new))
        updates.append((m, m_new))
        updates.append((v, v_new))
        updates.append((p, p - lr * m_hat / (tm.sqrt(v_hat) + eps)))
    return updates
