"""GPipe schedule over a 4-stage pipe axis: pipelined result must equal
the sequential composition of the stages."""

import numpy as np
import pytest

import jax

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu import parallel as par
from aesara_tpu.parallel.pipeline import gpipe

rng = np.random.default_rng(5)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def test_gpipe_linear_stack_matches_sequential():
    S, M, B, D = 4, 6, 3, 8         # 4 stages, 6 microbatches, (3, 8) acts
    mesh = par.make_mesh({"pp": S, "dp": -1})

    w_all = rng.normal(size=(S, D, D)).astype("float32") / np.sqrt(D)
    xs = rng.normal(size=(M, B, D)).astype("float32")

    x_sym = at.tensor3("x", dtype="float32")      # (M, B, D) replicated
    w_sym = at.tensor3("w", dtype="float32")      # (S, D, D) pp-sharded → (1, D, D)

    def stage(h):
        return at.tanh(at.dot(h, w_sym[0]))

    out = gpipe(x_sym, stage, "pp", n_stages=S, n_microbatches=M)
    f = par.shard_map_function(
        [x_sym, w_sym], out, mesh=mesh,
        in_specs=[None, ("pp", None, None)],
        out_specs=[None],
    )
    res = np.asarray(f(xs, w_all))

    want = xs.copy()
    for s in range(S):
        want = np.tanh(want @ w_all[s])
    np.testing.assert_allclose(res, want, rtol=2e-4, atol=2e-5)


def test_gpipe_gradient_matches_dense():
    """Weight gradients THROUGH the pipeline schedule == dense autodiff.
    Regression for two bugs: DimShuffle.grad must sum augmented dims
    before dropping them, and the SPMD transpose of psum is identity
    (summing the replicated cotangent scaled grads by the axis size)."""
    import jax.numpy as jnp

    from aesara_tpu.gradient import grad

    S, M = 4, 3
    mesh = par.make_mesh({"pp": S, "dp": -1})
    xs = at.tensor3("xs", dtype="float32")
    wp = at.tensor3("wp", dtype="float32")
    out = gpipe(xs, lambda h: at.tanh(at.dot(h, wp[0])), "pp", S, M)
    gw = grad((out ** 2).sum(), wp)
    f = par.shard_map_function(
        [xs, wp], gw, mesh=mesh,
        in_specs=[None, ("pp", None, None)],
        out_specs=[("pp", None, None)],
    )
    xv = rng.normal(size=(M, 2, 8)).astype("float32")
    wv = (rng.normal(size=(S, 8, 8)) / np.sqrt(8)).astype("float32")
    got = np.asarray(f(xv, wv))

    def dense_loss(w):
        h = jnp.asarray(xv)
        for s in range(S):
            h = jnp.tanh(h @ w[s])
        return (h ** 2).sum()

    want = np.asarray(jax.grad(dense_loss)(jnp.asarray(wv)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)
