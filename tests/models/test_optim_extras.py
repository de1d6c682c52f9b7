"""Production-training optimizer features: AdamW, global-norm clipping,
LR schedules, dynamic loss scaling."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.sharedvalue import shared
from aesara_tpu.models.optim import (
    adamw,
    adamw_from_grads,
    clip_by_global_norm,
    scaled_loss_updates,
    warmup_cosine,
)


def _problem():
    w = shared(np.zeros(4, dtype="float32"), name="w")
    x = at.matrix("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    loss = ((at.dot(x, w) - y) ** 2).mean()
    xv = np.ones((3, 4), dtype="float32")
    yv = np.arange(3, dtype="float32")
    return w, x, y, loss, xv, yv


def test_adamw_trains_and_decays():
    w, x, y, loss, xv, yv = _problem()
    step = atp.function([x, y], loss,
                        updates=adamw(loss, [w], lr=0.05, weight_decay=0.01),
                        mode="PY")
    l0 = float(step(xv, yv))
    for _ in range(10):
        l1 = float(step(xv, yv))
    assert l1 < l0

    # decoupled decay: with zero gradient the weights still shrink
    w2 = shared(np.ones(3, dtype="float32") * 2.0, name="w2")
    z = at.vector("z", dtype="float64")
    cost = (z * 0.0).sum() + w2.sum() * 0.0
    step2 = atp.function([z], cost,
                         updates=adamw(cost, [w2], lr=0.1, weight_decay=0.5),
                         mode="PY", on_unused_input="ignore")
    step2(np.zeros(3, dtype="float32"))
    assert np.all(w2.get_value() < 2.0)


def test_grad_clip_bounds_norm():
    w, x, y, loss, xv, yv = _problem()
    from aesara_tpu.gradient import grad

    gs = grad(loss * 1e6, [w])  # huge gradient
    clipped, gnorm = clip_by_global_norm(gs, max_norm=1.0)
    f = atp.function([x, y], [clipped[0], gnorm], mode="PY")
    cv, nv = f(xv, yv)
    assert float(np.sqrt((np.asarray(cv) ** 2).sum())) <= 1.0 + 1e-5
    assert float(nv) > 1.0


def test_warmup_cosine_shape():
    t = shared(np.float32(0.0), name="t")
    lr = warmup_cosine(t, lr_max=1.0, warmup_steps=10, total_steps=100)
    f = atp.function([], lr, mode="PY")
    vals = []
    for i in [0, 5, 10, 55, 100, 200]:
        t.set_value(np.float32(i))
        vals.append(float(f()))
    assert vals[0] == 0.0
    assert abs(vals[1] - 0.5) < 1e-6          # linear warmup midpoint
    assert abs(vals[2] - 1.0) < 1e-6          # peak at warmup end
    assert abs(vals[3] - 0.5) < 1e-6          # cosine midpoint
    assert vals[4] < 1e-6                     # decayed to lr_min
    assert vals[5] < 1e-6                     # clamped past total_steps


class TestLossScaling:
    def test_skips_update_on_nonfinite_and_backs_off(self):
        w = shared(np.zeros(2, dtype="float32"), name="w")
        z = at.vector("z", dtype="float64")
        cost = (w * z).sum()
        upd = scaled_loss_updates(cost, [w], 0.1, init_scale=2.0 ** 10,
                                  backoff_factor=0.5)
        scale_var = next(v for v, _ in upd if getattr(v, "name", "") == "loss_scale")
        f = atp.function([z], cost, updates=upd, mode="PY")
        f(np.ones(2, dtype="float32"))
        w_after = w.get_value().copy()
        assert not np.allclose(w_after, 0.0)
        f(np.array([np.inf, 1.0], dtype="float32"))
        assert np.array_equal(w.get_value(), w_after)  # update skipped
        assert float(scale_var.get_value()) == 2.0 ** 9  # backed off

    def test_scale_grows_after_clean_interval(self):
        w = shared(np.zeros(2, dtype="float32"), name="w")
        z = at.vector("z", dtype="float64")
        cost = (w * z).sum()
        upd = scaled_loss_updates(cost, [w], 0.01, init_scale=4.0,
                                  growth_interval=3, growth_factor=2.0)
        scale_var = next(v for v, _ in upd
                         if getattr(v, "name", "") == "loss_scale")
        f = atp.function([z], cost, updates=upd, mode="PY")
        for _ in range(3):
            f(np.ones(2, dtype="float32"))
        assert float(scale_var.get_value()) == 8.0

    def test_with_adamw_from_grads(self):
        w, x, y, loss, xv, yv = _problem()
        upd = scaled_loss_updates(
            loss, [w], lambda gs: adamw_from_grads([w], gs, lr=0.05),
        )
        step = atp.function([x, y], loss, updates=upd, mode="PY")
        l0 = float(step(xv, yv))
        for _ in range(8):
            l1 = float(step(xv, yv))
        assert l1 < l0


def test_grad_clip_float64_accumulates_in_float64():
    """A float64 gradient near 3e19 must clip correctly, not collapse to
    zero via a float32 overflow (review finding)."""
    w = shared(np.zeros(2, dtype="float64"), name="w")
    from aesara_tpu.gradient import grad

    z = at.vector("z", dtype="float64")
    cost = (w * z).sum()
    gs = grad(cost * 3e19, [w])
    clipped, gnorm = clip_by_global_norm(gs, max_norm=1.0)
    f = atp.function([z], [clipped[0], gnorm], mode="PY")
    cv, nv = f(np.ones(2, dtype="float64"))
    assert np.isfinite(float(nv)) and float(nv) > 1e18
    norm = float(np.sqrt((np.asarray(cv) ** 2).sum()))
    assert abs(norm - 1.0) < 1e-6


class TestGradAccumulation:
    def test_equivalent_to_large_batch(self):
        """4 microbatches with every=4 must update exactly like one big
        averaged-gradient SGD step."""
        from aesara_tpu.models.optim import accumulate_gradients

        w = shared(np.zeros(3, dtype="float32"), name="w")
        x = at.matrix("x", dtype="float64")
        loss = ((at.dot(x, w) - 1.0) ** 2).mean()
        upd = accumulate_gradients(loss, [w], 0.1, every=4)
        step = atp.function([x], loss, updates=upd, mode="PY")

        rng = np.random.default_rng(0)
        micro = [rng.standard_normal((2, 3)).astype("float32")
                 for _ in range(4)]
        for m in micro[:3]:
            step(m)
            assert np.allclose(w.get_value(), 0.0)  # not applied yet
        step(micro[3])
        got = w.get_value().copy()

        # reference: single SGD step on the averaged gradient
        w2 = shared(np.zeros(3, dtype="float32"), name="w2")
        loss2 = ((at.dot(x, w2) - 1.0) ** 2).mean()
        g2 = atp.grad(loss2, w2)
        gfn = atp.function([x], g2, mode="PY")
        gavg = np.mean([np.asarray(gfn(m)) for m in micro], axis=0)
        assert np.allclose(got, -0.1 * gavg, rtol=1e-6)

    def test_cycle_repeats(self):
        from aesara_tpu.models.optim import accumulate_gradients

        w = shared(np.zeros(2, dtype="float32"), name="w")
        z = at.vector("z", dtype="float64")
        loss = ((w - z) ** 2).sum()
        upd = accumulate_gradients(loss, [w], 0.25, every=2)
        step = atp.function([z], loss, updates=upd, mode="PY")
        zv = np.ones(2, dtype="float32")
        step(zv)
        w1 = w.get_value().copy()
        step(zv)
        w2 = w.get_value().copy()
        assert np.allclose(w1, 0.0) and not np.allclose(w2, 0.0)
        step(zv)
        assert np.allclose(w.get_value(), w2)  # accumulating again


def test_ema_tracks_params():
    from aesara_tpu.models.optim import ema_updates

    w = shared(np.zeros(2, dtype="float32"), name="w")
    z = at.vector("z", dtype="float64")
    loss = ((w - z) ** 2).sum()
    upd = [(w, w - 0.5 * atp.grad(loss, w))]
    ema_upd, (w_ema,) = ema_updates([w], decay=0.5)
    step = atp.function([z], loss, updates=upd + ema_upd, mode="PY")
    zv = np.ones(2, dtype="float32")
    for _ in range(10):
        step(zv)
    # params converge to 1; ema lags behind but approaches
    assert np.allclose(w.get_value(), 1.0, atol=1e-2)
    assert 0.8 < float(w_ema.get_value()[0]) < 1.0


def test_accumulation_and_ema_preserve_float64():
    from aesara_tpu.models.optim import accumulate_gradients, ema_updates

    w = shared(np.zeros(2, dtype="float64"), name="w")
    z = at.vector("z", dtype="float64")
    loss = ((w - z) ** 2).sum()
    upd = accumulate_gradients(loss, [w], 0.1, every=2)
    accs = [v for v, _ in upd if getattr(v, "name", "").endswith("_gacc")]
    assert str(np.asarray(accs[0].get_value()).dtype) == "float64"
    ema_upd, (w_ema,) = ema_updates([w], decay=0.9)
    # the ema update graph must not pass through float32
    assert "float32" not in str(ema_upd[0][1].type)
