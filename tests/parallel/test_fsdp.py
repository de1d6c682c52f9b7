"""FSDP / ZeRO-3 weight sharding (``parallel.fsdp_shard``): persistent
parameter buffers stay sharded across the mesh, GSPMD all-gathers each
weight just-in-time for its use, and the training result matches the
replicated run bit-for-bit in structure.  Scaling-book recipe; the
reference has no analogue (SURVEY §2.12).
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.parallel as par
from tests.parallel.test_hlo_collectives import count_collectives

rng = np.random.default_rng(11)


def _mlp_step(w1, w2, lr=0.01):
    x = at.matrix("x", dtype="float32")
    y = at.matrix("y", dtype="float32")
    h = at.tanh(at.dot(x, w1))
    loss = at.mean((at.dot(h, w2) - y) ** 2)
    g1, g2 = atp.grad(loss, [w1, w2])
    ups = {w1: w1 - lr * g1, w2: w2 - lr * g2}
    return x, y, loss, ups


def _weights():
    D, H, O = 16, 32, 8
    v1 = (rng.normal(size=(D, H)) * 0.1).astype("f4")
    v2 = (rng.normal(size=(H, O)) * 0.1).astype("f4")
    return v1, v2


def test_fsdp_annotation_and_hlo_contract():
    mesh = par.make_mesh({"data": 8})
    v1, v2 = _weights()
    w1 = atp.shared(v1.copy(), name="w1")
    w2 = atp.shared(v2.copy(), name="w2")
    par.fsdp_shard([w1, w2], axis="data", mesh=mesh, min_elems=1)
    # largest evenly-divisible dim got the axis
    assert w1.type.sharding == (None, "data")   # largest dim of (16,32)
    assert w2.type.sharding == ("data", None)   # largest dim of (32,8)

    x, y, loss, ups = _mlp_step(w1, w2)
    f = par.pjit_function(
        [x, y], loss, mesh=mesh,
        in_specs=[("data", None), ("data", None)], updates=ups,
    )
    xv = rng.normal(size=(32, 16)).astype("f4")
    yv = rng.normal(size=(32, 8)).astype("f4")
    c = count_collectives(f.compiled_hlo(xv, yv))
    # weights must be gathered just-in-time for their matmuls
    assert c["all-gather"] >= 1, c
    # grads must be combined across the batch shards somehow
    assert c["all-reduce"] + c["reduce-scatter"] >= 1, c

    f(xv, yv)
    # the persistent buffer STAYS sharded after the step (the point of
    # FSDP: 1/n of the weight HBM per chip)
    buf = w1.container.storage[0]
    spec = tuple(buf.sharding.spec)
    assert "data" in spec, spec


def test_fsdp_matches_replicated_training():
    mesh = par.make_mesh({"data": 8})
    v1, v2 = _weights()
    xv = rng.normal(size=(32, 16)).astype("f4")
    yv = rng.normal(size=(32, 8)).astype("f4")

    def run(fsdp):
        w1 = atp.shared(v1.copy(), name="w1")
        w2 = atp.shared(v2.copy(), name="w2")
        if fsdp:
            par.fsdp_shard([w1, w2], axis="data", mesh=mesh, min_elems=1)
        x, y, loss, ups = _mlp_step(w1, w2)
        f = par.pjit_function(
            [x, y], loss, mesh=mesh,
            in_specs=[("data", None), ("data", None)], updates=ups,
        )
        losses = [float(f(xv, yv)) for _ in range(4)]
        return losses, np.asarray(w1.container.storage[0])

    l_rep, w_rep = run(False)
    l_fsdp, w_fsdp = run(True)
    np.testing.assert_allclose(l_rep, l_fsdp, rtol=2e-5)
    np.testing.assert_allclose(w_rep, w_fsdp, rtol=2e-5, atol=1e-7)
    assert l_rep[-1] < l_rep[0]  # it actually trains


def test_fsdp_min_elems_and_indivisible_guard():
    mesh = par.make_mesh({"data": 8})
    small = atp.shared(np.zeros(4, dtype="f4"), name="small")
    odd = atp.shared(np.zeros((5, 3), dtype="f4"), name="odd")  # no dim % 8
    par.fsdp_shard([small, odd], axis="data", mesh=mesh, min_elems=8)
    assert getattr(small.type, "sharding", None) is None
    assert getattr(odd.type, "sharding", None) is None


def test_fsdp_with_zero1_optimizer_state():
    # full ZeRO-3 footprint: fsdp weights + sharded adam moments
    from aesara_tpu.models.optim import adam

    mesh = par.make_mesh({"data": 8})
    v1, v2 = _weights()
    w1 = atp.shared(v1.copy(), name="w1")
    w2 = atp.shared(v2.copy(), name="w2")
    par.fsdp_shard([w1, w2], axis="data", mesh=mesh, min_elems=1)
    x = at.matrix("x", dtype="float32")
    y = at.matrix("y", dtype="float32")
    h = at.tanh(at.dot(x, w1))
    loss = at.mean((at.dot(h, w2) - y) ** 2)
    ups = adam(loss, [w1, w2], lr=0.01,
               state_shard_axis="data", state_shard_size=8)
    f = par.pjit_function(
        [x, y], loss, mesh=mesh,
        in_specs=[("data", None), ("data", None)], updates=dict(ups),
    )
    xv = rng.normal(size=(32, 16)).astype("f4")
    yv = rng.normal(size=(32, 8)).astype("f4")
    losses = [float(f(xv, yv)) for _ in range(5)]
    assert losses[-1] < losses[0], losses


def test_fsdp_requires_valid_mesh_axis():
    # review finding: misuse must fail at the call site, not deep in pjit
    w = atp.shared(np.zeros((8, 8), dtype="f4"), name="w")
    with pytest.raises(ValueError, match="mesh axis"):
        par.fsdp_shard([w], axis="nonexistent",
                       mesh=par.make_mesh({"data": 8}))
    import aesara_tpu.parallel.shard as shard_mod

    prev = shard_mod.get_mesh()
    shard_mod.set_mesh(None)
    try:
        with pytest.raises(ValueError, match="needs a mesh"):
            par.fsdp_shard([w], axis="data")
    finally:
        shard_mod.set_mesh(prev)
