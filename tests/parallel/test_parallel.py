"""Parallel layer tests on the 8-device CPU mesh: GSPMD (pjit) path with
dp/tp shardings, explicit shard_map path with collectives."""

import numpy as np
import pytest

import jax

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu import parallel as par

rng = np.random.default_rng(77)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def test_make_mesh():
    mesh = par.make_mesh({"data": 4, "model": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    mesh2 = par.make_mesh({"data": -1, "model": 2})
    assert mesh2.shape["data"] == len(jax.devices()) // 2


def test_pjit_matmul_dp_tp():
    mesh = par.make_mesh({"data": 4, "model": 2})
    x = at.matrix("x", dtype="float32")
    w = atp.shared(
        rng.normal(size=(16, 8)).astype("float32"), name="w",
        sharding=(None, "model"),
    )
    out = at.tanh(at.dot(x, w))
    f = par.pjit_function([x], out, mesh=mesh, in_specs=[("data", None)])
    xv = rng.normal(size=(8, 16)).astype("float32")
    res = np.asarray(f(xv))
    np.testing.assert_allclose(res, np.tanh(xv @ w.get_value()), rtol=1e-4, atol=1e-5)


def test_pjit_training_step_with_updates():
    mesh = par.make_mesh({"data": 8})
    x = at.matrix("x", dtype="float32")
    y = at.vector("y", dtype="float32")
    w = atp.shared(np.zeros(4, dtype="float32"), name="w")
    p = at.dot(x, w)
    loss = ((p - y) ** 2).mean()
    g = atp.grad(loss, w)
    f = par.pjit_function(
        [x, y], loss, mesh=mesh,
        in_specs=[("data", None), ("data",)],
        updates={w: w - 0.1 * g},
    )
    xv = rng.normal(size=(16, 4)).astype("float32")
    yv = rng.normal(size=16).astype("float32")
    l0 = float(np.asarray(f(xv, yv)))
    l1 = float(np.asarray(f(xv, yv)))
    assert l1 < l0


def test_shard_map_psum():
    mesh = par.make_mesh({"data": 8})
    x = at.vector("x", dtype="float32")
    local_sum = x.sum()
    total = par.psum(local_sum, "data")
    f = par.shard_map_function(
        [x], total, mesh=mesh, in_specs=[("data",)], out_specs=None,
    )
    xv = np.arange(16, dtype="float32")
    res = np.asarray(f(xv))
    np.testing.assert_allclose(res, xv.sum(), rtol=1e-6)


def test_shard_map_all_gather():
    mesh = par.make_mesh({"data": 8})
    x = at.vector("x", dtype="float32")
    gathered = par.all_gather(x, "data")
    f = par.shard_map_function(
        [x], gathered, mesh=mesh, in_specs=[("data",)], out_specs=[("data",)],
    )
    xv = np.arange(8, dtype="float32")
    res = np.asarray(f(xv))
    # each shard gathers the full vector; stitched output tiles it
    assert res.shape == (64,)
    np.testing.assert_allclose(res[:8], xv)


def test_shard_map_ppermute_ring():
    mesh = par.make_mesh({"data": 8})
    x = at.vector("x", dtype="float32")
    n = 8
    shifted = par.ppermute(x, "data", [(i, (i + 1) % n) for i in range(n)])
    f = par.shard_map_function(
        [x], shifted, mesh=mesh, in_specs=[("data",)], out_specs=[("data",)],
    )
    xv = np.arange(8, dtype="float32")
    res = np.asarray(f(xv))
    np.testing.assert_allclose(res, np.roll(xv, 1))


def test_shard_map_axis_index():
    mesh = par.make_mesh({"data": 8})
    x = at.vector("x", dtype="float32")
    idx = at.cast(par.axis_index("data"), "float32") + x * 0.0
    f = par.shard_map_function(
        [x], idx, mesh=mesh, in_specs=[("data",)], out_specs=[("data",)],
    )
    res = np.asarray(f(np.zeros(8, dtype="float32")))
    np.testing.assert_allclose(res, np.arange(8))


def test_dp_gradient_psum_equivalence():
    # data-parallel SGD with explicit psum == single-device full-batch
    mesh = par.make_mesh({"data": 8})
    x = at.matrix("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    w = at.vector("w", dtype="float64")
    loss_local = ((at.dot(x, w) - y) ** 2).sum()
    g_local = atp.grad(loss_local, w)
    g_tot = par.psum(g_local, "data")
    f = par.shard_map_function(
        [x, y, w], g_tot, mesh=mesh,
        in_specs=[("data", None), ("data",), None],
        out_specs=[None],
    )
    xv = rng.normal(size=(16, 4))
    yv = rng.normal(size=16)
    wv = rng.normal(size=4)
    res = np.asarray(f(xv, yv, wv))
    expected = 2 * xv.T @ (xv @ wv - yv)
    np.testing.assert_allclose(res, expected, rtol=1e-8)


def test_collectives_py_mode_single_rank():
    # world-size-1 oracle semantics in py mode
    from aesara_tpu.compile.function import function

    x = at.vector("x", dtype="float64")
    out = par.psum(x, "data") + par.pmean(x, "data")
    f = function([x], out, mode="PY")
    v = rng.normal(size=4)
    np.testing.assert_allclose(f(v), 2 * v)


def test_adam_zero1_state_sharding():
    """ZeRO-1: adam's m/v buffers carry a dp sharding annotation; the
    pjit training step compiles, trains, and GSPMD actually partitions
    the moment buffers across the mesh."""
    from aesara_tpu.models import MLP, adam

    mesh = par.make_mesh({"data": 8})
    x = at.matrix("x", dtype="float32")
    y = at.vector("y", dtype="int64")
    model = MLP(16, [32], 4)
    cost = model.loss(x, y)
    updates = adam(cost, model.params, lr=1e-2, state_shard_axis="data",
                   state_shard_size=8)

    # the moment shareds are annotated
    moment_shareds = [sv for sv, _ in updates
                      if sv.name and (sv.name.endswith("_m") or sv.name.endswith("_v"))
                      and sv.type.ndim]
    assert moment_shareds
    # large weight moments annotated; indivisible bias moments replicated
    annotated = [sv for sv in moment_shareds
                 if sv.type.sharding and "data" in sv.type.sharding]
    assert annotated

    step = par.pjit_function([x, y], cost, mesh=mesh,
                             in_specs=[("data", None), ("data",)],
                             updates=dict(updates))
    xv = rng.normal(size=(16, 16)).astype("float32")
    yv = rng.integers(0, 4, size=16)
    l0 = float(np.asarray(step(xv, yv)))
    for _ in range(5):
        l1 = float(np.asarray(step(xv, yv)))
    assert np.isfinite(l1) and l1 < l0

    # GSPMD actually placed the moments sharded: per-device shard of the
    # largest moment buffer is 1/8 of the full rows
    big = max(annotated, key=lambda sv: np.prod(sv.container.storage[0].shape))
    val = big.container.storage[0]
    if hasattr(val, "sharding") and hasattr(val.sharding, "shard_shape"):
        shard = val.sharding.shard_shape(val.shape)
        assert np.prod(shard) < np.prod(val.shape)
