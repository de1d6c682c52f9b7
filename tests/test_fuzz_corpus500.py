"""Sustained differential-fuzz corpus — 500+ seeds, zero divergences
(VERDICT r4 item 4).

Three generators cover the surfaces the reference's suites hammer
hardest: the full rewrite pipeline over random mixed-op graphs, random
subtensor/inc-subtensor chains, and degenerate broadcast mixes.  Every
seed builds a random graph, rewrites it under the FAST_RUN tag set
(canonicalize + stabilize + specialize), and compares original vs
rewritten through the py oracle (``tests.rewrite_corpus``): rewrite
soundness at corpus scale without 500 XLA compiles.  The XLA-vs-py
backend differential is pinned separately (``tests/test_fuzz.py``).

Seeds are FIXED (0..N ranges): the corpus is a regression net, not a
flake source — any divergence is reproducible by seed.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.graph.ir import Variable
from tests.rewrite_corpus import rewrite_and_check

PIPE = ("canonicalize", "stabilize", "specialize")

BATCH = 25  # seeds per pytest case (keeps failure granularity useful)


def _leaf_values(rng, specs):
    vals = []
    for shape, positive in specs:
        a = rng.uniform(0.4, 2.0, size=shape) if positive else rng.uniform(
            -2.0, 2.0, size=shape)
        vals.append(a.astype("float64"))
    return vals


# --- generator 1: mixed-op rewrite-pipeline graphs ---------------------------

UNARY = [
    lambda v: tm.exp(v),
    lambda v: tm.tanh(v),
    lambda v: tm.log1p(tm.sqr(v)),
    lambda v: tm.sqrt(tm.sqr(v) + 0.25),
    lambda v: tm.neg(tm.neg(v)),
    lambda v: tm.log(tm.exp(v)),          # relational inverse pair
    lambda v: tm.sqr(tm.sqrt(tm.abs(v) + 0.5)),
    lambda v: tm.reciprocal(tm.reciprocal(v + 3.0)),
    lambda v: tm.sigmoid(v),
    lambda v: tm.softplus(v),
    lambda v: tm.log(tm.sqrt(tm.abs(v) + 0.5)),
    lambda v: tm.abs(tm.neg(v)),
    lambda v: tm.floor(tm.ceil(v)),
    lambda v: v * 1.0 + 0.0,              # identity elements
    lambda v: v / 1.0,
    lambda v: tm.expm1(tm.log1p(tm.abs(v))),
]
BINARY = [
    lambda a, b: a + b,
    lambda a, b: a - b,
    lambda a, b: a * b,
    lambda a, b: a / (tm.sqr(b) + 1.0),
    lambda a, b: tm.maximum(a, b),
    lambda a, b: tm.minimum(a, b),
    lambda a, b: at.switch(tm.gt(a, b), a, b),
    lambda a, b: tm.exp(a) * tm.exp(b),   # exp-mul collapses
    lambda a, b: tm.log(tm.exp(a) + tm.exp(b)),  # logaddexp
    lambda a, b: a * b + a,               # factoring candidates
    lambda a, b: -a + b,                  # add-neg-to-sub
]
REDUCE = [
    lambda v: v.sum(axis=0, keepdims=True),
    lambda v: v.max(axis=1, keepdims=True),
    lambda v: v.mean(axis=0, keepdims=True),
    lambda v: tm.log(tm.sum(tm.exp(v), axis=1, keepdims=True)),  # logsumexp
    lambda v: v.sum(keepdims=True),
]
STRUCT = [
    lambda v: v.T.T,
    lambda v: v[::-1][::-1],
    lambda v: v.dimshuffle(1, 0).dimshuffle(1, 0),
    lambda v: at.concatenate([v, v], axis=0)[: v.shape[0]],
    lambda v: v[0:, :],                   # useless slice
]


def _can_mix(a, b):
    """Reference broadcasting legality: where runtime dims differ, the
    size-1 side must be STATICALLY 1 in its type."""
    va, sa = a
    vb, sb = b
    if len(sa) != len(sb):
        return False  # keep ranks aligned; ndim mixing isn't the target
    for d, (da, db) in enumerate(zip(sa, sb)):
        if da == db:
            continue
        if da == 1 and va.type.shape[d] == 1:
            continue
        if db == 1 and vb.type.shape[d] == 1:
            continue
        return False
    return True


def _mix_shape(sa, sb):
    return tuple(max(a, b) for a, b in zip(sa, sb))


def _build_pipeline_graph(seed):
    rng = np.random.default_rng(seed)
    specs = [((3, 4), True), ((3, 4), False), ((1, 4), False), ((3, 1), True)]
    # static-1 dims declared in the type: ONLY statically-1 dims
    # broadcast (reference semantics)
    xs = [
        at.TensorType("float64",
                      tuple(1 if s == 1 else None for s in shape))(f"x{i}")
        for i, (shape, _) in enumerate(specs)
    ]
    pool = [(v, shape) for v, (shape, _) in zip(xs, specs)]
    for _ in range(int(rng.integers(4, 9))):
        k = int(rng.integers(0, 4))
        if k == 0:
            v, s = pool[int(rng.integers(0, len(pool)))]
            pool.append((UNARY[int(rng.integers(0, len(UNARY)))](v), s))
        elif k == 1:
            a = pool[int(rng.integers(0, len(pool)))]
            b = pool[int(rng.integers(0, len(pool)))]
            if _can_mix(a, b):
                op = BINARY[int(rng.integers(0, len(BINARY)))]
                pool.append((op(a[0], b[0]), _mix_shape(a[1], b[1])))
        elif k == 2:
            v, s = pool[int(rng.integers(0, len(pool)))]
            if v.type.ndim == 2:
                i = int(rng.integers(0, len(REDUCE)))
                r = REDUCE[i](v)
                rs = ((1, s[1]), (s[0], 1), (1, s[1]), (s[0], 1),
                      (1, 1))[i]
                if r.type.ndim == 2:
                    pool.append((r, rs))
        else:
            v, s = pool[int(rng.integers(0, len(pool)))]
            if v.type.ndim == 2:
                i = int(rng.integers(0, len(STRUCT)))
                r = STRUCT[i](v)
                rs = s if i in (0, 1, 2, 3, 4) else s
                pool.append((r, rs))
    out = pool[-1][0]
    for v, _s in pool[-3:-1]:
        out = out + v.sum() * 0.1
    return xs, out, _leaf_values(rng, specs)


@pytest.mark.parametrize("batch", range(10))
def test_fuzz_rewrite_pipeline_250(batch):
    """250 seeds: full-pipeline rewrites preserve value/shape/dtype."""
    for seed in range(batch * BATCH, (batch + 1) * BATCH):
        xs, out, vals = _build_pipeline_graph(seed)
        try:
            rewrite_and_check(xs, out, vals, include=PIPE,
                              rtol=1e-8, atol=1e-9)
        except AssertionError as e:
            raise AssertionError(f"pipeline fuzz divergence at seed "
                                 f"{seed}: {e}") from e


# --- generator 2: subtensor / inc-subtensor chains ---------------------------

_SAFE_SLICES = [
    slice(0, None), slice(1, None), slice(None, 6), slice(None, None, 2),
    slice(None, None, -1), slice(0, 7),
]


def _rand_slice(rng, n):
    # slices guaranteed non-empty on dims that start >= 7 and shrink at
    # most ~half per step (chains are <= 4 deep)
    return _SAFE_SLICES[int(rng.integers(0, len(_SAFE_SLICES)))]


def _build_subtensor_chain(seed):
    rng = np.random.default_rng(10_000 + seed)
    n, m = 7, 9
    x = at.matrix("x", dtype="float64")
    out = x
    for _ in range(int(rng.integers(1, 5))):
        k = int(rng.integers(0, 6))
        if out.type.ndim == 0:
            out = out + x.sum() * 0.0 + out  # keep chaining on a scalar
            break
        dim0 = out.shape[0]
        if k == 0:
            out = out[_rand_slice(rng, 4)]
        elif k == 1 and out.type.ndim == 2:
            out = out[:, _rand_slice(rng, 4)]
        elif k == 2:
            out = out[::-1]
        elif k == 3 and out.type.ndim == 2:
            out = at.subtensor.set_subtensor(
                out[0], out[0] * float(rng.uniform(0.5, 1.5)))
        elif k == 4 and out.type.ndim == 2:
            out = at.subtensor.inc_subtensor(
                out[:, 0], float(rng.uniform(-1, 1)))
        else:
            out = out.T if out.type.ndim == 2 else out
    vals = np.asarray(
        np.random.default_rng(20_000 + seed).uniform(-2, 2, size=(n, m)))
    return [x], out.sum() + (out * 2.0).sum(), [vals]


@pytest.mark.parametrize("batch", range(6))
def test_fuzz_subtensor_chains_150(batch):
    """150 seeds: random subtensor/set/inc chains through the pipeline."""
    for seed in range(batch * BATCH, (batch + 1) * BATCH):
        xs, out, vals = _build_subtensor_chain(seed)
        try:
            rewrite_and_check(xs, out, vals, include=PIPE,
                              rtol=1e-8, atol=1e-9)
        except AssertionError as e:
            raise AssertionError(f"subtensor fuzz divergence at seed "
                                 f"{seed}: {e}") from e


# --- generator 3: degenerate broadcast mixes ---------------------------------

_B_SHAPES = [(5, 7), (1, 7), (5, 1), (1, 1), (7,), (1,), ()]


def _build_broadcast_mix(seed):
    rng = np.random.default_rng(30_000 + seed)
    k = int(rng.integers(2, 5))
    shapes = [_B_SHAPES[int(rng.integers(0, len(_B_SHAPES)))]
              for _ in range(k)]
    xs, vals = [], []
    for i, shp in enumerate(shapes):
        xs.append(at.TensorType("float64", tuple(
            1 if s == 1 else None for s in shp))(f"b{i}"))
        vals.append(rng.uniform(-2, 2, size=shp))
    out = xs[0]
    for v in xs[1:]:
        op = BINARY[int(rng.integers(0, len(BINARY)))]
        out = op(out, v)
    # sprinkle a unary + reduction to engage fusion/CAReduce paths
    out = tm.tanh(out) + out * 0.5
    if out.type.ndim > 0:
        out = out.sum(axis=0)
    return xs, out, vals


@pytest.mark.parametrize("batch", range(5))
def test_fuzz_broadcast_mixes_125(batch):
    """125 seeds: degenerate static-1/scalar broadcast combinations."""
    for seed in range(batch * BATCH, (batch + 1) * BATCH):
        xs, out, vals = _build_broadcast_mix(seed)
        try:
            rewrite_and_check(xs, out, vals, include=PIPE,
                              rtol=1e-8, atol=1e-9)
        except AssertionError as e:
            raise AssertionError(f"broadcast fuzz divergence at seed "
                                 f"{seed}: {e}") from e
