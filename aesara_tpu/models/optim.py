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


def clip_by_global_norm(grads: Sequence, max_norm: float):
    """Rescale ``grads`` so the joint L2 norm is at most ``max_norm``
    (production LM-training clipping).  Returns (clipped_grads,
    global_norm).  The norm accumulates in float32, or float64 when any
    gradient is float64 (downcasting f64 grads would overflow/flush)."""
    acc = "float64" if any(
        getattr(g.type, "dtype", "") == "float64" for g in grads
    ) else "float32"
    sq = None
    for g in grads:
        term = tm.sum(tm.sqr(cast(g, acc)))
        sq = term if sq is None else sq + term
    gnorm = tm.sqrt(sq)
    scale = tm.minimum(1.0, max_norm / tm.maximum(gnorm, 1e-12))
    return [cast(cast(g, acc) * scale, g.type.dtype) for g in grads], gnorm


def adamw(cost, params: Sequence, lr: float = 0.001, b1: float = 0.9,
          b2: float = 0.999, eps: float = 1e-8, weight_decay: float = 0.01,
          grad_clip: float | None = None,
          state_shard_axis: str | None = None,
          state_shard_size: int | None = None) -> List[Tuple]:
    """AdamW (Loshchilov & Hutter 2019): Adam with DECOUPLED weight
    decay (applied to the parameter, not folded into the gradient) and
    optional global-norm gradient clipping — the default recipe for
    transformer training.  ``lr`` may be a float or a scalar Variable
    (pass a schedule from ``warmup_cosine``)."""
    grads = _grads(cost, params)
    if grad_clip is not None:
        grads, _ = clip_by_global_norm(grads, grad_clip)
    t = shared(np.asarray(0.0, dtype="float32"), name="adamw_t")
    t_new = t + 1.0
    updates: List[Tuple] = [(t, t_new)]
    bc1 = 1.0 - tm.pow(np.float32(b1), t_new)
    bc2 = 1.0 - tm.pow(np.float32(b2), t_new)
    for p, g in zip(params, grads):
        dt = p.get_value().dtype
        shape = p.get_value().shape
        sharding = _state_sharding(shape, state_shard_axis, state_shard_size)
        m = shared(np.zeros(shape, dtype="float32"),
                   name=(p.name or "p") + "_m", sharding=sharding)
        v = shared(np.zeros(shape, dtype="float32"),
                   name=(p.name or "p") + "_v", sharding=sharding)
        g32 = cast(g, "float32")
        m_new = b1 * m + (1.0 - b1) * g32
        v_new = b2 * v + (1.0 - b2) * g32 * g32
        step = lr * (m_new / bc1) / (tm.sqrt(v_new / bc2) + eps)
        p32 = cast(p, "float32")
        p_new = p32 - step - lr * weight_decay * p32
        updates += [(m, m_new), (v, v_new), (p, cast(p_new, dt))]
    return updates


def warmup_cosine(step, lr_max: float, warmup_steps: int, total_steps: int,
                  lr_min: float = 0.0):
    """Linear warmup then cosine decay, as a symbolic function of a
    scalar ``step`` Variable (e.g. the ``adamw_t`` counter or your own
    shared step).  The schedule compiles INTO the train step — no host
    recomputation per step."""
    from aesara_tpu.tensor.basic import switch

    stepf = cast(step, "float32")
    warm = lr_max * stepf / np.float32(max(warmup_steps, 1))
    progress = tm.minimum(
        (stepf - warmup_steps) / np.float32(max(total_steps - warmup_steps, 1)),
        np.float32(1.0),
    )
    cos = lr_min + 0.5 * (lr_max - lr_min) * (1.0 + tm.cos(
        np.float32(np.pi) * progress
    ))
    return switch(tm.lt(stepf, np.float32(warmup_steps)), warm, cos)


def scaled_loss_updates(cost, params: Sequence, opt_fn,
                        init_scale: float = 2.0 ** 15,
                        growth_interval: int = 2000,
                        growth_factor: float = 2.0,
                        backoff_factor: float = 0.5) -> List[Tuple]:
    """Dynamic loss scaling for low-precision training: the gradients
    are taken of ``cost * scale``, unscaled before the optimizer, and
    the whole parameter/optimizer update is SKIPPED on any non-finite
    gradient while the scale backs off; after ``growth_interval`` clean
    steps the scale doubles.  ``opt_fn(grads_override) -> updates`` is
    any optimizer above partially applied, e.g.::

        updates = scaled_loss_updates(
            loss, params,
            lambda gs: adamw_from_grads(params, gs, lr=3e-4),
        )

    For convenience ``opt_fn`` may also be a plain per-param SGD float.
    Returns updates including the scale/counter shareds.
    """
    from aesara_tpu.tensor.basic import switch

    scale = shared(np.asarray(init_scale, dtype="float32"),
                   name="loss_scale")
    good = shared(np.asarray(0.0, dtype="float32"), name="loss_scale_good")

    grads = _grads(cost * scale, params)
    unscaled = [cast(g, "float32") / scale for g in grads]
    finite = None
    for g in unscaled:
        bad = tm.any(tm.or_(tm.isnan(g), tm.isinf(g)))
        ok = tm.eq(bad, 0)
        finite = ok if finite is None else tm.and_(finite, ok)

    if callable(opt_fn):
        raw_updates = opt_fn(unscaled)
    else:
        lr = float(opt_fn)
        raw_updates = [(p, p - lr * cast(g, p.type.dtype))
                       for p, g in zip(params, unscaled)]

    updates: List[Tuple] = []
    for var, new in raw_updates:
        updates.append((var, switch(finite, new, var)))
    grew = tm.ge(good + 1.0, np.float32(growth_interval))
    scale_next = switch(
        finite,
        switch(grew, scale * np.float32(growth_factor), scale),
        scale * np.float32(backoff_factor),
    )
    good_next = switch(
        finite, switch(grew, np.float32(0.0), good + 1.0), np.float32(0.0)
    )
    updates.append((scale, scale_next))
    updates.append((good, good_next))
    return updates


def adamw_from_grads(params: Sequence, grads: Sequence, lr=0.001,
                     b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                     weight_decay: float = 0.01) -> List[Tuple]:
    """AdamW taking precomputed gradients (for ``scaled_loss_updates``)."""
    t = shared(np.asarray(0.0, dtype="float32"), name="adamw_t")
    t_new = t + 1.0
    updates: List[Tuple] = [(t, t_new)]
    bc1 = 1.0 - tm.pow(np.float32(b1), t_new)
    bc2 = 1.0 - tm.pow(np.float32(b2), t_new)
    for p, g in zip(params, grads):
        dt = p.get_value().dtype
        shape = p.get_value().shape
        m = shared(np.zeros(shape, dtype="float32"),
                   name=(p.name or "p") + "_m")
        v = shared(np.zeros(shape, dtype="float32"),
                   name=(p.name or "p") + "_v")
        g32 = cast(g, "float32")
        m_new = b1 * m + (1.0 - b1) * g32
        v_new = b2 * v + (1.0 - b2) * g32 * g32
        step = lr * (m_new / bc1) / (tm.sqrt(v_new / bc2) + eps)
        p32 = cast(p, "float32")
        updates += [(m, m_new), (v, v_new),
                    (p, cast(p32 - step - lr * weight_decay * p32, dt))]
    return updates


def accumulate_gradients(cost, params: Sequence, opt_fn, every: int):
    """Microbatch gradient accumulation: each call adds this batch's
    gradients into float32 accumulator shareds; every ``every``-th call
    the optimizer consumes the AVERAGED accumulated gradient and the
    accumulators reset — a large effective batch without the memory.
    ``opt_fn(avg_grads) -> updates`` is any ``*_from_grads`` optimizer
    (or a float for plain SGD).  Returns the updates list."""
    from aesara_tpu.tensor.basic import switch

    if every < 1:
        raise ValueError("every must be >= 1")
    grads = _grads(cost, params)
    ctr = shared(np.asarray(0.0, dtype="float32"), name="accum_ctr")
    ctr_next = ctr + 1.0
    apply_now = tm.ge(ctr_next, np.float32(every))

    accs = []
    avg_grads = []
    for p, g in zip(params, grads):
        # accumulate in at least float32, but never downcast f64 state
        acc_dt = ("float64"
                  if str(np.asarray(p.get_value()).dtype) == "float64"
                  else "float32")
        acc = shared(np.zeros(p.get_value().shape, dtype=acc_dt),
                     name=(p.name or "p") + "_gacc")
        acc_new = acc + cast(g, acc_dt)
        accs.append((acc, acc_new))
        avg_grads.append(acc_new / np.asarray(every, dtype=acc_dt))

    if callable(opt_fn):
        raw = opt_fn(avg_grads)
    else:
        lr = float(opt_fn)
        raw = [(p, p - lr * cast(g, p.type.dtype))
               for p, g in zip(params, avg_grads)]

    updates: List[Tuple] = []
    for var, new in raw:
        updates.append((var, switch(apply_now, new, var)))
    for acc, acc_new in accs:
        updates.append((acc, switch(apply_now, 0.0 * acc, acc_new)))
    updates.append((ctr, switch(apply_now, np.float32(0.0), ctr_next)))
    return updates


def ema_updates(params: Sequence, decay: float = 0.999):
    """Exponential moving average of parameters (the serving-weights
    recipe): returns (updates, ema_shareds).  Append the updates to the
    train step; read the ema shareds for evaluation/serving."""
    updates: List[Tuple] = []
    emas = []
    for p in params:
        ema = shared(np.array(p.get_value(), dtype=p.get_value().dtype),
                     name=(p.name or "p") + "_ema")
        dt = str(np.asarray(p.get_value()).dtype)
        acc_dt = "float64" if dt == "float64" else "float32"
        updates.append(
            (ema, cast(decay * cast(ema, acc_dt)
                       + (1.0 - decay) * cast(p, acc_dt), dt))
        )
        emas.append(ema)
    return updates, emas
