"""Beam search (`DecoderLM.beam_search_fn`): exhaustive-width beam must
equal brute-force sequence argmax; beam=1 must equal greedy; wider
beams never score worse.  The model's logits are kept FLAT (small
weight perturbation) so hypotheses genuinely compete — a peaked model
makes every strategy collapse to the same sequence.
"""

import itertools

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.models.decoder import DecoderLM
from aesara_tpu.tensor.type import TensorType

V, P, TMAX, NNEW = 5, 4, 24, 3


@pytest.fixture(scope="module")
def model():
    m = DecoderLM(V, n_layers=1, d_model=8, n_heads=2, d_ff=16, seed=0)
    r = np.random.default_rng(0)
    for p in m.params:
        v = p.get_value()
        p.set_value(v + r.normal(size=v.shape).astype(v.dtype) * 0.1)
    return m


@pytest.fixture(scope="module")
def score_fn(model):
    toks = TensorType("int64", (P + NNEW,))("toks")
    h = model.embed[toks]
    for layer in model.layers:
        h = layer.full(h)
    logits = at.math.dot(h, model.embed.T)
    logp = logits - at.math.logsumexp(logits, axis=-1, keepdims=True)
    return function([toks], logp, mode="FAST_RUN")


def brute_force(score_fn, prompt):
    best, best_s = None, -np.inf
    for cont in itertools.product(range(V), repeat=NNEW):
        full = np.concatenate([prompt, np.asarray(cont, "int64")])
        lp = np.asarray(score_fn(full))
        s = float(sum(lp[P - 1 + i, cont[i]] for i in range(NNEW)))
        if s > best_s:
            best, best_s = list(cont), s
    return best, best_s


@pytest.mark.parametrize("seed", range(3))
def test_exhaustive_beam_equals_brute_force(model, score_fn, seed):
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, V, size=P).astype("int64")
    want, want_s = brute_force(score_fn, prompt)
    search = model.beam_search_fn(P, NNEW, TMAX, beam=25)  # >= V^2
    got, got_s = search(prompt)
    assert got == want, (got, want)
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4)


def test_beam1_equals_greedy(model):
    rng = np.random.default_rng(9)
    prompt = rng.integers(0, V, size=P).astype("int64")
    greedy = [int(t) for t in
              np.asarray(model.generate_from_prompt_fn(P, NNEW, TMAX)(prompt))]
    got, _ = model.beam_search_fn(P, NNEW, TMAX, beam=1)(prompt)
    assert got == greedy


def test_wider_beam_never_scores_worse(model):
    rng = np.random.default_rng(3)
    s1 = model.beam_search_fn(P, NNEW, TMAX, beam=1)
    s4 = model.beam_search_fn(P, NNEW, TMAX, beam=4)
    s25 = model.beam_search_fn(P, NNEW, TMAX, beam=25)
    improved = 0
    for _ in range(6):
        prompt = rng.integers(0, V, size=P).astype("int64")
        (_, a), (_, b), (_, c) = s1(prompt), s4(prompt), s25(prompt)
        assert b >= a - 1e-6 and c >= b - 1e-6
        if c > a + 1e-6:
            improved += 1
    # flat logits: the exhaustive beam must actually beat greedy
    # somewhere, else this test exercises nothing
    assert improved >= 1


def test_beam_guards(model):
    with pytest.raises(ValueError, match="t_max"):
        model.beam_search_fn(P, TMAX, TMAX, beam=2)
    with pytest.raises(ValueError, match="beam"):
        model.beam_search_fn(P, 2, TMAX, beam=0)


def test_beam_wider_than_vocab_carries_full_width(model, score_fn):
    # review finding: beam > V used to silently cap at V; the padded
    # -inf lanes must host step-2 expansions and never surface
    rng = np.random.default_rng(21)
    prompt = rng.integers(0, V, size=P).astype("int64")
    want, want_s = brute_force(score_fn, prompt)
    for beam in (V + 2, 30):  # 30 > V^2 = 25
        got, got_s = model.beam_search_fn(P, NNEW, TMAX, beam=beam)(prompt)
        assert got == want, (beam, got, want)
        np.testing.assert_allclose(got_s, want_s, rtol=1e-4)
        assert all(0 <= t < V for t in got)
