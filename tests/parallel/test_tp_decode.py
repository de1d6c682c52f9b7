"""Tensor-parallel KV-cache decode: Megatron-style head-sharded serving.

One decoder layer split over a "tp" mesh axis: each device owns H/n_dev
heads of wq/wk/wv (column shards), the matching rows of wo, a column
shard of w1 and row shard of w2, and its heads' KV cache.  Per decode
step everything is head-local until the two ``psum``s (attention output
projection, FFN output) — the classic 2-allreduce-per-layer TP layer —
and the argmax over replicated logits keeps every device on the same
token.  The whole decode loop (scan with collectives in the body) runs
under ``shard_map`` on the 8-device CPU mesh and must reproduce the
single-device DecoderLM decode token-for-token.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu import parallel as par
from aesara_tpu.models.decoder import DecoderLM
from aesara_tpu.tensor import math as tm
from aesara_tpu.tensor.basic import arange, cast, constant, switch
from aesara_tpu.tensor.special import softmax
from aesara_tpu.tensor.subtensor import set_subtensor

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    import jax

    if len(jax.devices()) < NDEV:
        pytest.skip("needs 8 devices")
    return par.make_mesh({"tp": NDEV}, devices=jax.devices()[:NDEV])


def _tp_decode_graph(lm, n_steps, t_max):
    """Per-shard symbolic decode step for ONE layer of ``lm``; weight
    shards arrive as explicit inputs (leading shard dims split by
    shard_map)."""
    from aesara_tpu.scan import scan

    layer = lm.layers[0]
    D = lm.d_model
    H, dh = layer.n_heads, layer.d_head
    h_loc = H // NDEV
    FF = layer.w1.get_value().shape[1]
    ff_loc = FF // NDEV

    embed = at.matrix("embed", dtype="float64")            # replicated (vocab, D)
    wq = at.matrix("wq", dtype="float64")                  # shard (D, h_loc*dh)
    wk = at.matrix("wk", dtype="float64")
    wv = at.matrix("wv", dtype="float64")
    wo = at.matrix("wo", dtype="float64")                  # shard (h_loc*dh, D)
    w1 = at.matrix("w1", dtype="float64")                  # shard (D, ff_loc)
    b1 = at.vector("b1", dtype="float64")                  # shard (ff_loc,)
    w2 = at.matrix("w2", dtype="float64")                  # shard (ff_loc, D)
    b2 = at.vector("b2", dtype="float64")                  # replicated (D,)
    ln1_g, ln1_b = at.vector("ln1_g", dtype="float64"), at.vector("ln1_b", dtype="float64")
    ln2_g, ln2_b = at.vector("ln2_g", dtype="float64"), at.vector("ln2_b", dtype="float64")
    tok0 = at.lscalar("tok0")

    def ln(x, g, c, eps=1e-5):
        mu = tm.mean(x, axis=-1, keepdims=True)
        var = tm.mean(tm.sqr(x - mu), axis=-1, keepdims=True)
        return g * (x - mu) / tm.sqrt(var + eps) + c

    from aesara_tpu.tensor.basic import alloc

    kc0 = alloc(constant(np.float32(0)), t_max, h_loc, dh)
    vc0 = alloc(constant(np.float32(0)), t_max, h_loc, dh)

    def step(tok, pos, k_cache, v_cache):
        h = embed[tok]                                    # (D,) replicated
        z = ln(h, ln1_g, ln1_b)
        q = tm.dot(z, wq).reshape((h_loc, dh))
        k_new = tm.dot(z, wk).reshape((h_loc, dh))
        v_new = tm.dot(z, wv).reshape((h_loc, dh))
        k_cache = set_subtensor(k_cache[pos], k_new)
        v_cache = set_subtensor(v_cache[pos], v_new)
        scores = tm.sum(k_cache * q.dimshuffle("x", 0, 1), axis=-1) / np.sqrt(dh)
        t_idx = arange(t_max).dimshuffle(0, "x")
        scores = switch(tm.le(t_idx, pos), scores,
                        constant(np.float32(-1e9)))
        attn = softmax(scores, axis=0)
        ctx = tm.sum(attn.dimshuffle(0, 1, "x") * v_cache, axis=0)
        o_loc = tm.dot(ctx.reshape((h_loc * dh,)), wo)    # partial (D,)
        h = h + par.psum(o_loc, "tp")                     # allreduce #1
        z2 = ln(h, ln2_g, ln2_b)
        f_loc = tm.dot(tm.maximum(tm.dot(z2, w1) + b1, 0.0), w2)
        h = h + par.psum(f_loc, "tp") + b2                # allreduce #2
        logits = tm.dot(h, embed.T)                       # replicated
        nxt = cast(tm.argmax(logits), "int64")
        return nxt, pos + np.int64(1), k_cache, v_cache

    outs, _ = scan(
        fn=step,
        outputs_info=[cast(tok0, "int64"), constant(np.int64(0)), kc0, vc0],
        n_steps=n_steps,
    )
    toks = outs[0]
    ins = [embed, wq, wk, wv, wo, w1, b1, w2, b2,
           ln1_g, ln1_b, ln2_g, ln2_b, tok0]
    return ins, toks


def test_tp_decode_matches_single_device(mesh):
    lm = DecoderLM(vocab=40, n_layers=1, d_model=32, n_heads=NDEV, d_ff=64,
                   seed=3)
    n_steps, t_max = 6, 8
    ins, toks = _tp_decode_graph(lm, n_steps, t_max)

    f = par.shard_map_function(
        ins, toks, mesh=mesh,
        in_specs=[
            None,                 # embed replicated
            (None, "tp"),         # wq column shards
            (None, "tp"),
            (None, "tp"),
            ("tp", None),         # wo row shards
            (None, "tp"),         # w1 column shards
            ("tp",),              # b1
            ("tp", None),         # w2 row shards
            None, None, None, None, None,   # b2, ln params replicated
            None,                 # tok0
        ],
        out_specs=[None],         # tokens replicated
    )
    layer = lm.layers[0]
    vals = [
        lm.embed.get_value(), layer.wq.get_value(), layer.wk.get_value(),
        layer.wv.get_value(), layer.wo.get_value(), layer.w1.get_value(),
        layer.b1.get_value(), layer.w2.get_value(), layer.b2.get_value(),
        layer.ln1_g.get_value(), layer.ln1_b.get_value(),
        layer.ln2_g.get_value(), layer.ln2_b.get_value(),
        np.int64(5),
    ]
    out = np.asarray(f(*vals))

    ref = np.asarray(
        lm.generate_fn(n_steps=n_steps, t_max=t_max, mode="PY")(np.int64(5))
    )
    assert np.array_equal(out, ref), (out, ref)
