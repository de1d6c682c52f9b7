"""The multi-chip collective CONTRACT, asserted on compiled HLO.

``dryrun_multichip`` proves end-to-end numbers; these tests pin the
*structure*: for each parallel axis, the SPMD-partitioned program on the
8-device CPU mesh must contain the expected XLA collectives (SURVEY
§2.12's TPU-equivalent table: psum→all-reduce, all_gather→all-gather,
ppermute→collective-permute, all_to_all→all-to-all,
reduce_scatter→reduce-scatter).  A sharding regression that silently
replicates (or gathers where it should stream) changes these signatures.
"""

import re

import numpy as np
import pytest

import jax

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu import parallel as par

rng = np.random.default_rng(3)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)


def count_collectives(hlo: str):
    """Count partitioned-HLO collective instructions by family.

    Sync and async forms (op vs op-start/op-done) both count once.
    """
    counts = {}
    for fam, pat in {
        "all-reduce": r"\ball-reduce(?:-start)?\(",
        "all-gather": r"\ball-gather(?:-start)?\(",
        "collective-permute": r"\bcollective-permute(?:-start)?\(",
        "all-to-all": r"\ball-to-all(?:-start)?\(",
        "reduce-scatter": r"\breduce-scatter(?:-start)?\(",
    }.items():
        counts[fam] = len(re.findall(pat, hlo))
    return counts


# --- dp: data-parallel gradient step ------------------------------------


def test_dp_grad_allreduce():
    """DP sharded-batch SGD: the grad sum over the batch axis must become
    exactly one all-reduce per reduced gradient (here: one), and nothing
    may gather the sharded batch."""
    mesh = par.make_mesh({"data": 8})
    x = at.matrix("x", dtype="float32")
    y = at.vector("y", dtype="float32")
    w = atp.shared(np.zeros(4, dtype="float32"), name="w")
    loss = ((at.dot(x, w) - y) ** 2).sum()
    g = atp.grad(loss, w)
    f = par.pjit_function(
        [x, y], loss, mesh=mesh, in_specs=[("data", None), ("data",)],
        updates={w: w - 0.1 * g},
    )
    xv = rng.normal(size=(16, 4)).astype("float32")
    yv = rng.normal(size=16).astype("float32")
    c = count_collectives(f.compiled_hlo(xv, yv))
    assert c["all-reduce"] >= 1, c
    assert c["all-gather"] == 0, f"DP step gathered the batch: {c}"


# --- tp: Megatron column->row split -------------------------------------


def test_tp_column_row_one_allreduce():
    """One column-sharded matmul feeding one row-sharded matmul needs
    EXACTLY one all-reduce (the row-parallel partial-sum combine) and no
    gathers — the Megatron invariant."""
    mesh = par.make_mesh({"model": 8})
    x = at.matrix("x", dtype="float32")
    w1 = atp.shared(
        rng.normal(size=(16, 32)).astype("float32") * 0.1, name="w1",
        sharding=(None, "model"),
    )
    w2 = atp.shared(
        rng.normal(size=(32, 16)).astype("float32") * 0.1, name="w2",
        sharding=("model", None),
    )
    out = at.dot(at.tanh(at.dot(x, w1)), w2)
    f = par.pjit_function([x], out, mesh=mesh, in_specs=[None],
                          out_specs=None)
    xv = rng.normal(size=(4, 16)).astype("float32")
    c = count_collectives(f.compiled_hlo(xv))
    assert c["all-reduce"] == 1, c
    assert c["all-gather"] == 0, c
    # and the result matches the unsharded math
    res = np.asarray(f(xv))
    expect = np.tanh(xv @ w1.get_value()) @ w2.get_value()
    np.testing.assert_allclose(res, expect, rtol=1e-4, atol=1e-5)


def test_tp_transformer_two_allreduce_per_layer():
    """The VERDICT-named signature: a TP transformer layer forward
    (attention out-proj + FFN second matmul, both row-sharded) combines
    partials exactly twice per layer."""
    from aesara_tpu.models import TransformerEncoderLayer

    mesh = par.make_mesh({"model": 8})
    D, H, FF = 64, 8, 128
    x = at.tensor3("x", dtype="float64")
    model = TransformerEncoderLayer(D, H, FF).shard_tp("model")
    out = model(x)
    f = par.pjit_function([x], out, mesh=mesh, in_specs=[None])
    xv = rng.normal(size=(2, 8, D)).astype("float32")
    c = count_collectives(f.compiled_hlo(xv))
    assert c["all-reduce"] == 2, c
    assert c["all-gather"] == 0, c
    # sharded forward == unsharded forward
    res = np.asarray(f(xv))
    model2 = TransformerEncoderLayer(D, H, FF)
    for p2, p in zip(model2.params, model.params):
        p2.set_value(p.get_value())
    f_ref = atp.function([x], model2(x), mode="FAST_RUN")
    np.testing.assert_allclose(res, np.asarray(f_ref(xv)), rtol=2e-4, atol=2e-5)


# --- sp/cp: ring attention ----------------------------------------------


def test_cp_ring_attention_collective_permute():
    """Ring attention streams KV blocks around the ring: the program
    must contain collective-permutes and must NOT all-gather the full
    KV (that would be the memory-unscalable fallback)."""
    from aesara_tpu.parallel.attention import ring_attention

    mesh = par.make_mesh({"cp": 8})
    q = at.tensor3("q", dtype="float32")
    k = at.tensor3("k", dtype="float32")
    v = at.tensor3("v", dtype="float32")
    f = par.shard_map_function(
        [q, k, v], ring_attention(q, k, v, "cp", causal=False), mesh=mesh,
        in_specs=[(None, "cp", None)] * 3, out_specs=[(None, "cp", None)],
    )
    qv = rng.normal(size=(2, 32, 8)).astype("float32")
    c = count_collectives(f.compiled_hlo(qv, qv, qv))
    assert c["collective-permute"] >= 1, c
    assert c["all-gather"] == 0, c


# --- pp: GPipe ring schedule --------------------------------------------


def test_pp_gpipe_collective_permute_ring():
    """GPipe's stage hand-off is a ppermute ring; its drain psum is an
    all-reduce.  Both must appear."""
    from aesara_tpu.parallel.pipeline import gpipe

    mesh = par.make_mesh({"pp": 8})
    xs = at.tensor3("xs", dtype="float32")
    wp = at.tensor3("wp", dtype="float32")
    f = par.shard_map_function(
        [xs, wp],
        gpipe(xs, lambda h: at.tanh(at.dot(h, wp[0])), "pp",
              n_stages=8, n_microbatches=3),
        mesh=mesh, in_specs=[None, ("pp", None, None)], out_specs=[None],
    )
    xv = rng.normal(size=(3, 2, 8)).astype("float32")
    wv = (rng.normal(size=(8, 8, 8)) / np.sqrt(8)).astype("float32")
    c = count_collectives(f.compiled_hlo(xv, wv))
    assert c["collective-permute"] >= 1, c
    assert c["all-reduce"] >= 1, c


# --- ep: switch-MoE -----------------------------------------------------


def test_ep_switch_moe_allreduce_combine():
    """switch_moe's combine is a psum over the expert axis -> all-reduce
    in the partitioned program."""
    from aesara_tpu.parallel.moe import switch_moe

    E = 8
    mesh = par.make_mesh({"ep": E})
    xm = at.matrix("xm", dtype="float32")
    wrm = at.matrix("wrm", dtype="float32")
    wem = at.tensor3("wem", dtype="float32")
    f = par.shard_map_function(
        [xm, wrm, wem],
        switch_moe(xm, at.dot(xm, wrm),
                   lambda t: at.tanh(at.dot(t, wem[0])), "ep",
                   n_experts=E, capacity=8),
        mesh=mesh, in_specs=[None, None, ("ep", None, None)],
        out_specs=[None],
    )
    c = count_collectives(f.compiled_hlo(
        rng.normal(size=(8, 8)).astype("float32"),
        rng.normal(size=(8, E)).astype("float32"),
        (rng.normal(size=(E, 8, 8)) / np.sqrt(8)).astype("float32"),
    ))
    assert c["all-reduce"] >= 1, c


# --- sp: Ulysses all-to-all ---------------------------------------------


def test_sp_ulysses_all_to_all():
    """Ulysses re-shards seq->heads and back: exactly the all-to-all
    signature (two hops may fuse; require >= 1 and no full gather)."""
    from aesara_tpu.parallel.attention import ulysses_attention

    mesh = par.make_mesh({"sp": 8})
    q = at.tensor3("q", dtype="float32")  # (BH, T, D)
    k = at.tensor3("k", dtype="float32")
    v = at.tensor3("v", dtype="float32")
    f = par.shard_map_function(
        [q, k, v], ulysses_attention(q, k, v, "sp"), mesh=mesh,
        in_specs=[(None, "sp", None)] * 3,
        out_specs=[(None, "sp", None)],
    )
    qv = rng.normal(size=(16, 32, 4)).astype("float32")
    c = count_collectives(f.compiled_hlo(qv, qv, qv))
    assert c["all-to-all"] >= 1, c
    assert c["all-gather"] == 0, c


# --- explicit collective ops lower to their namesakes --------------------


def test_explicit_collectives_lower_to_namesakes():
    mesh = par.make_mesh({"data": 8})
    x = at.vector("x", dtype="float32")

    f_psum = par.shard_map_function(
        [x], par.psum(x.sum(), "data"), mesh=mesh,
        in_specs=[("data",)], out_specs=None,
    )
    xv = np.arange(16, dtype="float32")
    assert count_collectives(f_psum.compiled_hlo(xv))["all-reduce"] >= 1

    f_ag = par.shard_map_function(
        [x], par.all_gather(x, "data"), mesh=mesh,
        in_specs=[("data",)], out_specs=[("data",)],
    )
    assert count_collectives(f_ag.compiled_hlo(xv))["all-gather"] >= 1

    f_rs = par.shard_map_function(
        [x], par.reduce_scatter(x, "data"), mesh=mesh,
        in_specs=[(None,)], out_specs=[("data",)],
    )
    xv64 = np.arange(64, dtype="float32")
    c = count_collectives(f_rs.compiled_hlo(xv64))
    # XLA may lower a small reduce-scatter as all-reduce+slice; accept
    # either but require SOME reduction collective
    assert c["reduce-scatter"] + c["all-reduce"] >= 1, c
