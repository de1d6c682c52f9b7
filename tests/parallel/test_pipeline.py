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
