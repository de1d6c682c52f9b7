"""Gradients through Scan shared state (BPTT over updated shareds).

Regression tests for the silently-wrong path where the reverse scan
substituted the INITIAL outer shared value at every backward step.  The
fix threads shared states as sit-sot carries: per-step history replayed
by an auxiliary forward Scan, cotangents threaded through pending
windows (reference ``scan/op.py:2379`` saves hidden states the same way).
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.scan.basic import scan


@pytest.mark.parametrize("mode", ["PY", "JAX"])
def test_grad_of_seq_reads_updated_shared(mode):
    # out_t = x_t * s_t, s <- s+1: d sum(out)/dx = [s_1..s_T] = [1,2,3]
    s = atp.shared(np.float64(1.0), name="s")
    x = at.vector("x", dtype="float64")
    outs, _ = scan(lambda xt: (xt * s, {s: s + 1.0}), sequences=[x])
    g = grad(outs.sum(), x)
    f = function([x], [outs, g], mode=mode)
    o, gv = f(np.ones(3))
    np.testing.assert_allclose(np.asarray(o), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(gv), [1.0, 2.0, 3.0])


@pytest.mark.parametrize("mode", ["PY", "JAX"])
def test_cotangent_through_shared_final(mode):
    # s <- s * x_t: final = s0 * prod(x); d/dx_t = prod/x_t; d/ds0 = prod
    s = atp.shared(np.float64(1.0), name="s")
    x = at.vector("x", dtype="float64")
    _, upd = scan(lambda xt: {s: s * xt}, sequences=[x])
    final = upd[s]
    g = grad(final, x)
    gs = grad(final, s)
    f = function([x], [final, g, gs], mode=mode)
    xv = np.array([2.0, 3.0, 4.0])
    fv, gv, gsv = f(xv)
    assert np.isclose(float(np.asarray(fv)), 24.0)
    np.testing.assert_allclose(np.asarray(gv), [12.0, 8.0, 6.0])
    assert np.isclose(float(np.asarray(gsv)), 24.0)


def test_grad_wrt_shared_init():
    # d sum(x_t * s_t)/d s0 with s <- s+1 is sum(x)
    s = atp.shared(np.float64(1.0), name="s")
    x = at.vector("x", dtype="float64")
    outs, _ = scan(lambda xt: (xt * s, {s: s + 1.0}), sequences=[x])
    gs = grad(outs.sum(), s)
    f = function([x], gs, mode="PY")
    xv = np.array([1.5, -0.5, 2.0])
    assert np.isclose(float(np.asarray(f(xv))), xv.sum())


@pytest.mark.parametrize("mode", ["PY", "JAX"])
def test_mixed_shared_and_sit_sot_vs_finite_diff(mode):
    # acc_t = acc_{t-1} + x_t * s_t with s <- s + x_t
    s = atp.shared(np.float64(1.0), name="s")
    x = at.vector("x", dtype="float64")
    h, _ = scan(
        lambda xt, acc: (acc + xt * s, {s: s + xt}),
        sequences=[x],
        outputs_info=[at.constant(np.float64(0.0))],
    )
    g = grad(h.sum(), x)
    f = function([x], g, mode=mode)
    xv = np.array([2.0, 3.0, 4.0])

    def val(xx):
        sv, accv, tot = 1.0, 0.0, 0.0
        for t in range(3):
            accv = accv + xx[t] * sv
            sv = sv + xx[t]
            tot += accv
        return tot

    eps = 1e-6
    gnum = np.array(
        [
            (val(xv + eps * np.eye(3)[i]) - val(xv - eps * np.eye(3)[i]))
            / (2 * eps)
            for i in range(3)
        ]
    )
    np.testing.assert_allclose(np.asarray(f(xv)), gnum, atol=1e-5)


def test_rng_shared_in_scan_grad_raises_loudly():
    # gradients whose expressions depend on an updated RNG stream must
    # error, never silently reuse the initial key at every step
    from aesara_tpu.tensor.random.utils import RandomStream

    srng = RandomStream(seed=42)
    y = at.vector("y", dtype="float64")
    outs, upd = scan(lambda yt: yt * srng.uniform(), sequences=[y])
    with pytest.raises(Exception):
        g = grad(outs.sum(), y)
        function([y], g, updates=upd, mode="PY")


def test_grads_not_reading_shared_unaffected():
    # out_t = x_t + s_t: grads wrt x don't read s — no replay needed
    s = atp.shared(np.float64(5.0), name="s")
    x = at.vector("x", dtype="float64")
    outs, _ = scan(lambda xt: (xt + s, {s: s + 1.0}), sequences=[x])
    g = grad(outs.sum(), x)
    f = function([x], g, mode="PY")
    np.testing.assert_allclose(np.asarray(f(np.ones(4))), np.ones(4))
