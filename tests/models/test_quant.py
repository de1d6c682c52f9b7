"""Weight-only int8 serving quantization."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.models.decoder import DecoderLM
from aesara_tpu.models.optim import adamw
from aesara_tpu.models.quant import quantize_array_int8, quantize_decoder_int8


def test_reconstruction_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype("float32")
    q, s = quantize_array_int8(w)
    assert q.dtype == np.int8 and s.shape == (32,)
    rec = q.astype("float32") * s[None, :]
    assert np.abs(rec - w).max() / np.abs(w).max() < 0.005


def test_quantized_decode_backends_agree():
    lm = DecoderLM(vocab=50, n_layers=2, d_model=32, n_heads=4, d_ff=64,
                   seed=0)
    qlm = quantize_decoder_int8(lm)
    a = np.asarray(qlm.generate_fn(6, 8, mode="PY")(np.int64(3)))
    b = np.asarray(qlm.generate_fn(6, 8, mode="JAX")(np.int64(3)))
    assert np.array_equal(a, b)


def test_quantized_matches_f32_on_trained_model():
    """With real logit margins (a trained model), int8 weight-only
    decode reproduces the f32 greedy tokens exactly."""
    lm = DecoderLM(vocab=12, n_layers=2, d_model=32, n_heads=4, d_ff=64,
                   seed=0)
    toks = at.lvector("toks")
    loss = lm.loss(toks)
    step = atp.function([toks], loss,
                        updates=adamw(loss, lm.params, lr=0.01), mode="PY")
    seq = np.array(list(range(12)) * 2, dtype="int64")
    for _ in range(300):
        l = step(seq)
    assert float(l) < 1e-3

    a = np.asarray(lm.generate_fn(8, 12, mode="PY")(np.int64(4)))
    qlm = quantize_decoder_int8(lm)
    b = np.asarray(qlm.generate_fn(8, 12, mode="PY")(np.int64(4)))
    assert np.array_equal(a, b)


def test_quantized_copy_is_isolated():
    lm = DecoderLM(vocab=20, n_layers=1, d_model=16, n_heads=2, d_ff=32,
                   seed=0)
    w_before = lm.layers[0].wq.get_value().copy()
    qlm = quantize_decoder_int8(lm)
    assert qlm.params == []
    assert len(qlm.quantized_shareds) == 2 * (6 * 1 + 1)
    # original stays trainable and untouched
    assert np.array_equal(lm.layers[0].wq.get_value(), w_before)
    assert lm.params


def test_quantized_copy_does_not_drift_with_training():
    """Mutating the ORIGINAL model's layernorm/bias state must not
    change the quantized serving copy (review finding: copy.copy shared
    the float leftovers)."""
    lm = DecoderLM(vocab=20, n_layers=1, d_model=16, n_heads=2, d_ff=32,
                   seed=0)
    qlm = quantize_decoder_int8(lm)
    gen = qlm.generate_fn(5, 8, mode="PY")
    before = np.asarray(gen(np.int64(2)))
    lm.layers[0].ln1_g.set_value(
        lm.layers[0].ln1_g.get_value() * 5.0
    )
    lm.layers[0].b2.set_value(lm.layers[0].b2.get_value() + 3.0)
    after = np.asarray(gen(np.int64(2)))
    assert np.array_equal(before, after)
