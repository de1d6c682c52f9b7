"""Expert-parallel switch-MoE over a 4-expert mesh axis vs the dense
single-device computation with identical routing."""

import numpy as np
import pytest

import jax

import aesara_tpu.tensor as at
from aesara_tpu import parallel as par
from aesara_tpu.parallel.moe import switch_moe

rng = np.random.default_rng(9)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def test_switch_moe_matches_dense():
    E, B, D, C = 4, 12, 8, 12        # capacity = B: nothing dropped
    mesh = par.make_mesh({"ep": E, "dp": -1})

    xv = rng.normal(size=(B, D)).astype("float32")
    wr = rng.normal(size=(D, E)).astype("float32")
    we = rng.normal(size=(E, D, D)).astype("float32") / np.sqrt(D)

    x = at.matrix("x", dtype="float32")
    w_router = at.matrix("wr", dtype="float32")
    w_exp = at.tensor3("we", dtype="float32")     # ep-sharded → local (1, D, D)

    def expert(tokens):
        return at.tanh(at.dot(tokens, w_exp[0]))

    out = switch_moe(x, at.dot(x, w_router), expert, "ep",
                     n_experts=E, capacity=C)
    f = par.shard_map_function(
        [x, w_router, w_exp], out, mesh=mesh,
        in_specs=[None, None, ("ep", None, None)],
        out_specs=[None],
    )
    res = np.asarray(f(xv, wr, we))

    # dense reference with the same top-1 routing
    logits = xv @ wr
    p = np.exp(logits - logits.max(axis=1, keepdims=True))
    p /= p.sum(axis=1, keepdims=True)
    chosen = p.argmax(axis=1)
    want = np.zeros_like(xv)
    for b in range(B):
        e = chosen[b]
        want[b] = np.tanh(xv[b] @ we[e]) * p[b, e]
    np.testing.assert_allclose(res, want, rtol=2e-4, atol=2e-5)


def test_switch_moe_capacity_drops_overflow():
    E, B, D = 4, 8, 4
    mesh = par.make_mesh({"ep": E, "dp": -1})
    xv = rng.normal(size=(B, D)).astype("float32")
    # force ALL tokens to expert 0 with capacity 2: only 2 survive
    wr = np.zeros((D, E), dtype="float32")
    wr[:, 0] = 0.0  # uniform logits → argmax picks expert 0
    we = np.ones((E, D, D), dtype="float32")

    x = at.matrix("x", dtype="float32")
    w_exp = at.tensor3("we", dtype="float32")

    def expert(tokens):
        return at.dot(tokens, w_exp[0])

    logits = at.dot(x, at.as_tensor_variable(wr))
    out = switch_moe(x, logits, expert, "ep", n_experts=E, capacity=2)
    f = par.shard_map_function(
        [x, w_exp], out, mesh=mesh,
        in_specs=[None, ("ep", None, None)],
        out_specs=[None],
    )
    res = np.asarray(f(xv, we))
    # tokens 0,1 routed (within capacity), the rest dropped to zero
    assert np.any(res[0] != 0) and np.any(res[1] != 0)
    assert np.allclose(res[2:], 0.0)


def test_switch_moe_gradient_matches_dense():
    import jax.numpy as jnp

    from aesara_tpu.gradient import grad

    E, B, D = 4, 8, 8
    mesh = par.make_mesh({"ep": E, "dp": -1})
    xm = at.matrix("xm", dtype="float32")
    we = at.tensor3("we", dtype="float32")
    xv = rng.normal(size=(B, D)).astype("float32")
    wrv = rng.normal(size=(D, E)).astype("float32")
    wev = (rng.normal(size=(E, D, D)) / np.sqrt(D)).astype("float32")

    out = switch_moe(xm, at.dot(xm, at.as_tensor_variable(wrv)),
                     lambda t: at.tanh(at.dot(t, we[0])), "ep",
                     n_experts=E, capacity=B)
    gwe = grad((out ** 2).sum(), we)
    f = par.shard_map_function(
        [xm, we], gwe, mesh=mesh,
        in_specs=[None, ("ep", None, None)],
        out_specs=[("ep", None, None)],
    )
    got = np.asarray(f(xv, wev))

    def dense_moe_loss(w):
        logits = jnp.asarray(xv) @ jnp.asarray(wrv)
        p = jax.nn.softmax(logits, axis=-1)
        chosen = p.argmax(axis=-1)
        outs = [jnp.tanh(jnp.asarray(xv)[b] @ w[chosen[b]]) * p[b, chosen[b]]
                for b in range(B)]
        return (jnp.stack(outs) ** 2).sum()

    want = np.asarray(jax.grad(dense_moe_loss)(jnp.asarray(wev)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
