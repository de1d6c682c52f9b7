"""Checkpoint save/restore: resuming training must continue EXACTLY as
if it never stopped (params + optimizer moments + counters + scale)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.sharedvalue import shared
from aesara_tpu.models.checkpoint import load_checkpoint, save_checkpoint
from aesara_tpu.models.optim import adamw


def _build():
    w = shared(np.zeros(4, dtype="float32"), name="w")
    x = at.matrix("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    loss = ((at.dot(x, w) - y) ** 2).mean()
    updates = adamw(loss, [w], lr=0.05)
    step = atp.function([x, y], loss, updates=updates, mode="PY")
    return w, updates, step


def test_resume_is_bitexact(tmp_path):
    xv = np.ones((3, 4), dtype="float32")
    yv = np.arange(3, dtype="float32")

    # run A: 6 steps straight through
    w_a, upd_a, step_a = _build()
    for _ in range(6):
        step_a(xv, yv)
    final_a = w_a.get_value()

    # run B: 3 steps, checkpoint, FRESH graph, restore, 3 more
    w_b, upd_b, step_b = _build()
    for _ in range(3):
        step_b(xv, yv)
    ckpt = tmp_path / "ck.npz"
    save_checkpoint(ckpt, [w_b], upd_b, extra={"epoch": np.int64(1)})

    w_c, upd_c, step_c = _build()
    extra = load_checkpoint(ckpt, [w_c], upd_c)
    assert int(extra["epoch"]) == 1
    for _ in range(3):
        step_c(xv, yv)
    assert np.array_equal(w_c.get_value(), final_a)


def test_strict_mismatch_raises(tmp_path):
    w_a, upd_a, _ = _build()
    ckpt = tmp_path / "ck.npz"
    save_checkpoint(ckpt, [w_a], upd_a)
    # different state structure: no optimizer updates
    w_b = shared(np.zeros(4, dtype="float32"), name="w")
    with pytest.raises(ValueError):
        load_checkpoint(ckpt, [w_b], None)


def test_shape_mismatch_raises(tmp_path):
    w_a = shared(np.zeros(4, dtype="float32"), name="w")
    ckpt = tmp_path / "ck.npz"
    save_checkpoint(ckpt, [w_a])
    w_b = shared(np.zeros(5, dtype="float32"), name="w")
    with pytest.raises(ValueError):
        load_checkpoint(ckpt, [w_b])


def test_bf16_roundtrip_and_suffixless_path(tmp_path):
    """bfloat16 state must survive the npz round trip (stored as exact
    f32), and save/load must agree on paths without the .npz suffix."""
    import ml_dtypes

    w = shared(np.linspace(-2, 2, 6).astype(ml_dtypes.bfloat16), name="w")
    path = str(tmp_path / "ck")          # no suffix
    save_checkpoint(path, [w])
    w2 = shared(np.zeros(6, dtype=ml_dtypes.bfloat16), name="w")
    load_checkpoint(path, [w2])
    assert np.array_equal(
        np.asarray(w.get_value(), dtype="float32"),
        np.asarray(w2.get_value(), dtype="float32"),
    )
    assert str(np.asarray(w2.get_value()).dtype) == "bfloat16"
