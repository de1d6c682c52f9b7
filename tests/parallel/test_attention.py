"""Ring / Ulysses context-parallel attention on the 8-device CPU mesh:
the sequence-sharded result must equal dense single-device attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import aesara_tpu.tensor as at
from aesara_tpu import parallel as par
from aesara_tpu.parallel.attention import (
    RingAttention,
    UlyssesAttention,
    attention_to_ring,
    ring_attention,
    ulysses_attention,
)
from aesara_tpu.tensor.nnet.attention import _attention_ref

rng = np.random.default_rng(11)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices"
)

BH, T, D = 8, 32, 16     # 8 batch*heads, global seq 32, head dim 16


def _qkv():
    return [rng.normal(size=(BH, T, D)).astype("float32") for _ in range(3)]


def _dense(qv, kv, vv, causal):
    return np.asarray(_attention_ref(
        jnp.asarray(qv), jnp.asarray(kv), jnp.asarray(vv),
        causal, 1.0 / np.sqrt(D)))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    mesh = par.make_mesh({"cp": 8})
    q = at.tensor3("q", dtype="float32")
    k = at.tensor3("k", dtype="float32")
    v = at.tensor3("v", dtype="float32")
    out = ring_attention(q, k, v, "cp", causal=causal)
    f = par.shard_map_function(
        [q, k, v], out, mesh=mesh,
        in_specs=[(None, "cp", None)] * 3, out_specs=[(None, "cp", None)],
    )
    qv, kv, vv = _qkv()
    res = np.asarray(f(qv, kv, vv))
    np.testing.assert_allclose(res, _dense(qv, kv, vv, causal),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ulysses_attention_matches_dense(causal):
    mesh = par.make_mesh({"cp": 8})
    q = at.tensor3("q", dtype="float32")
    k = at.tensor3("k", dtype="float32")
    v = at.tensor3("v", dtype="float32")
    out = ulysses_attention(q, k, v, "cp", causal=causal)
    f = par.shard_map_function(
        [q, k, v], out, mesh=mesh,
        in_specs=[(None, "cp", None)] * 3, out_specs=[(None, "cp", None)],
    )
    qv, kv, vv = _qkv()
    res = np.asarray(f(qv, kv, vv))
    np.testing.assert_allclose(res, _dense(qv, kv, vv, causal),
                               rtol=2e-4, atol=2e-5)


def test_world_size_one_oracle():
    # perform == dense attention (py differential path)
    import aesara_tpu as atp

    q = at.tensor3("q", dtype="float32")
    k = at.tensor3("k", dtype="float32")
    v = at.tensor3("v", dtype="float32")
    f = atp.function([q, k, v], ring_attention(q, k, v, "cp"), mode="PY")
    qv, kv, vv = _qkv()
    np.testing.assert_allclose(f(qv, kv, vv), _dense(qv, kv, vv, False),
                               rtol=2e-4, atol=2e-5)


def test_attention_to_ring_rewrite():
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.tensor.nnet.attention import fused_attention

    q = at.tensor3("q", dtype="float32")
    k = at.tensor3("k", dtype="float32")
    v = at.tensor3("v", dtype="float32")
    out = fused_attention(q, k, v, causal=True)
    fg = FunctionGraph([q, k, v], [out], clone=False)
    rewriter = attention_to_ring("cp")
    res = rewriter.transform(fg, out.owner)
    assert res
    new = res[0]
    assert isinstance(new.owner.op, RingAttention)
    assert new.owner.op.causal and new.owner.op.axis_name == "cp"


@pytest.mark.parametrize("kind", ["ring", "ulysses"])
def test_sharded_attention_gradients_match_dense(kind):
    """d loss / d {q,k,v} through the sharded op == dense vjp."""
    import jax.numpy as jnp

    from aesara_tpu.gradient import grad

    mesh = par.make_mesh({"cp": 8})
    q = at.tensor3("q", dtype="float32")
    k = at.tensor3("k", dtype="float32")
    v = at.tensor3("v", dtype="float32")
    builder = ring_attention if kind == "ring" else ulysses_attention
    out = builder(q, k, v, "cp", causal=(kind == "ring"))
    loss = (out ** 2).sum()
    gq, gk, gv = grad(loss, [q, k, v])
    f = par.shard_map_function(
        [q, k, v], [gq, gk, gv], mesh=mesh,
        in_specs=[(None, "cp", None)] * 3,
        out_specs=[(None, "cp", None)] * 3,
    )
    qv, kv, vv = _qkv()
    got = [np.asarray(g) for g in f(qv, kv, vv)]

    def dense_loss(q_, k_, v_):
        o = _attention_ref(q_, k_, v_, kind == "ring", 1.0 / np.sqrt(D))
        return (o ** 2).sum()

    want = jax.grad(dense_loss, argnums=(0, 1, 2))(
        jnp.asarray(qv), jnp.asarray(kv), jnp.asarray(vv))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), rtol=5e-4, atol=5e-5)


def test_flag_driven_context_parallel_compile():
    """config.context_parallel_axis turns ANY FusedAttention graph
    context-parallel at compile time (the rewrite-pack form)."""
    import jax.numpy as jnp

    from aesara_tpu.config import config
    from aesara_tpu.tensor.nnet.attention import fused_attention

    q = at.tensor3("q", dtype="float32")
    k = at.tensor3("k", dtype="float32")
    v = at.tensor3("v", dtype="float32")
    out = fused_attention(q, k, v, causal=True)
    mesh = par.make_mesh({"cp": 8})
    with config.change_flags(context_parallel_axis="cp"):
        f = par.shard_map_function([q, k, v], out, mesh=mesh,
                                   in_specs=[(None, "cp", None)] * 3,
                                   out_specs=[(None, "cp", None)])
    qv, kv, vv = _qkv()
    np.testing.assert_allclose(np.asarray(f(qv, kv, vv)),
                               _dense(qv, kv, vv, True),
                               rtol=2e-4, atol=2e-5)
