"""Speculative decoding (`DecoderLM.speculative_generate_fn`): the
draft-propose / target-verify loop must emit EXACTLY the target model's
own greedy continuation — acceptance/rejection only changes speed,
never output (Leviathan et al. 2023, greedy variant).  Also pins the
supporting pieces: the step_block verify pass vs sequential steps, and
the unused-recurrent-stack rewrite that lets while-scans carrying KV
caches compile.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.models.decoder import DecoderLM

V, P, TMAX = 50, 6, 64


def _spice(m, seed, scale=0.8):
    # untrained layers collapse to a constant token; perturb weights so
    # greedy sequences are diverse and draft/target genuinely disagree
    r = np.random.default_rng(seed)
    for p in m.params:
        v = p.get_value()
        p.set_value((v + r.normal(size=v.shape).astype(v.dtype) * scale))


@pytest.fixture(scope="module")
def models():
    target = DecoderLM(V, n_layers=2, d_model=16, n_heads=4, d_ff=32, seed=0)
    draft = DecoderLM(V, n_layers=1, d_model=8, n_heads=2, d_ff=16, seed=1)
    _spice(target, 5)
    _spice(draft, 6)
    return target, draft


def test_step_block_matches_sequential_steps(models):
    # the verify pass: G tokens in one batched pass == G sequential
    # layer.step calls (same cache writes, same hidden states)
    target, _ = models
    layer = target.layers[0]
    G, D = 3, target.d_model
    rng = np.random.default_rng(3)
    hs = rng.normal(size=(G, D)).astype("float32")
    Kv, dh = layer.n_kv_heads, layer.d_head

    hsv = at.matrix("hs", dtype="float32")
    kc0 = at.tensor3("kc", dtype="float32")
    vc0 = at.tensor3("vc", dtype="float32")
    pos = at.scalar("pos", dtype="int64")

    out_b, kb, vb = layer.step_block(hsv, kc0, vc0, pos, block=G)
    f_block = function([hsv, kc0, vc0, pos], [out_b, kb, vb], mode="FAST_RUN")

    h0 = hsv[0]
    outs = []
    kc, vc = kc0, vc0
    for g in range(G):
        hg, kc, vc = layer.step(hsv[g], kc, vc, pos + np.int64(g))
        outs.append(hg.dimshuffle("x", 0))
    from aesara_tpu.tensor.basic import join

    f_seq = function([hsv, kc0, vc0, pos],
                     [join(0, *outs), kc, vc], mode="FAST_RUN")

    kcv = rng.normal(size=(16, Kv, dh)).astype("float32")
    vcv = rng.normal(size=(16, Kv, dh)).astype("float32")
    for p0 in (0, 5):
        a = f_block(hs, kcv, vcv, np.int64(p0))
        b = f_seq(hs, kcv, vcv, np.int64(p0))
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-5, atol=1e-6
            )


@pytest.mark.parametrize("n_spec", [1, 3, 4])
def test_speculative_equals_target_greedy(models, n_spec):
    target, draft = models
    rng = np.random.default_rng(0)
    n_new = 16
    f_ref = target.generate_from_prompt_fn(P, n_new, TMAX)
    f_spec = target.speculative_generate_fn(draft, P, n_new, TMAX,
                                            n_spec=n_spec)
    for _ in range(3):
        prompt = rng.integers(0, V, size=P).astype("int64")
        ref = np.asarray(f_ref(prompt))
        got = np.asarray(f_spec(prompt))
        np.testing.assert_array_equal(got, ref)


def test_speculative_self_draft_all_accepted(models):
    # draft == target: every proposal accepted; output still identical
    target, _ = models
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, V, size=P).astype("int64")
    n_new = 12
    ref = np.asarray(target.generate_from_prompt_fn(P, n_new, TMAX)(prompt))
    got = np.asarray(
        target.speculative_generate_fn(target, P, n_new, TMAX, n_spec=4)(prompt)
    )
    np.testing.assert_array_equal(got, ref)


def test_vocab_mismatch_rejected(models):
    target, _ = models
    other = DecoderLM(V + 1, n_layers=1, d_model=8, n_heads=2, d_ff=16)
    with pytest.raises(ValueError, match="vocabulary"):
        target.speculative_generate_fn(other, P, 8, TMAX)


def test_unused_recurrent_stack_becomes_final_only():
    # the enabling rewrite: a while-scan whose extra carry is never read
    # as a stack compiles to ONE XLA program
    from aesara_tpu.scan.basic import scan, until
    from aesara_tpu.scan.op import Scan

    x0 = at.scalar("x0", dtype="float64")
    y0 = at.vector("y0", dtype="float64")

    def step(x, y):
        return (x * 1.5, y + 1.0, until(x > 10.0))

    (xs, ys), _ = scan(step, outputs_info=[x0, y0], n_steps=50)
    out = xs[-1]  # ys never consumed
    f = function([x0, y0], out, mode="FAST_RUN")
    (sn,) = [n for n in f.fgraph.apply_nodes if isinstance(n.op, Scan)]
    assert all(sn.op.info.final_only), sn.op.info
    assert f.fn.jit_fn is not None  # whole-graph XLA, no py fallback
    np.testing.assert_allclose(float(f(1.0, np.zeros(3))), 1.5 ** 7)
