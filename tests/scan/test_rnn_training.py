"""The BASELINE config-4 workload: Elman and LSTM RNNs trained via Scan
with BPTT — convergence + py/jax agreement."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.scan.basic import scan

rng = np.random.default_rng(123)


def make_lstm_step(n_in, n_hid):
    def init(*shape):
        return atp.shared(
            (rng.normal(size=shape) * 0.2).astype("float64"),
            name=f"p{shape}",
        )

    Wx = init(n_in, 4 * n_hid)
    Wh = init(n_hid, 4 * n_hid)
    b = atp.shared(np.zeros(4 * n_hid), name="b")

    def step(x_t, h_tm1, c_tm1):
        z = at.dot(x_t, Wx) + at.dot(h_tm1, Wh) + b
        i = at.math.sigmoid(z[:, :n_hid])
        f = at.math.sigmoid(z[:, n_hid:2 * n_hid])
        o = at.math.sigmoid(z[:, 2 * n_hid:3 * n_hid])
        g = at.tanh(z[:, 3 * n_hid:])
        c_t = f * c_tm1 + i * g
        h_t = o * at.tanh(c_t)
        return h_t, c_t

    return step, [Wx, Wh, b]


def test_lstm_bptt_training_converges():
    T, B, n_in, n_hid = 6, 4, 3, 5
    X = at.tensor3("X", dtype="float64")       # (T, B, n_in)
    y = at.matrix("y", dtype="float64")        # (B, n_hid target)
    step, params = make_lstm_step(n_in, n_hid)
    h0 = at.zeros((B, n_hid), dtype="float64")
    c0 = at.zeros((B, n_hid), dtype="float64")
    (h_seq, c_seq), _ = scan(step, sequences=[X], outputs_info=[h0, c0])
    pred = h_seq[-1]
    loss = ((pred - y) ** 2).mean()
    grads = atp.grad(loss, params)
    updates = {p: p - 0.5 * g for p, g in zip(params, grads)}
    train = function([X, y], loss, updates=updates, mode="JAX")

    Xv = rng.normal(size=(T, B, n_in))
    yv = np.tanh(rng.normal(size=(B, n_hid)))
    losses = [float(np.asarray(train(Xv, yv))) for _ in range(60)]
    assert losses[-1] < 0.25 * losses[0], f"{losses[0]} -> {losses[-1]}"


def test_elman_rnn_py_jax_gradients_agree():
    T, B, n_in, n_hid = 5, 3, 2, 4
    X = at.tensor3("X", dtype="float64")
    Wx = at.matrix("Wx", dtype="float64")
    Wh = at.matrix("Wh", dtype="float64")
    h0 = at.zeros((B, n_hid), dtype="float64")
    h, _ = scan(
        lambda x_t, h_tm1, Wx, Wh: at.tanh(at.dot(x_t, Wx) + at.dot(h_tm1, Wh)),
        sequences=[X], outputs_info=[h0], non_sequences=[Wx, Wh],
    )
    cost = (h ** 2).sum()
    gX, gWx, gWh = atp.grad(cost, [X, Wx, Wh])
    args = [rng.normal(size=(T, B, n_in)), rng.normal(size=(n_in, n_hid)) * 0.4,
            rng.normal(size=(n_hid, n_hid)) * 0.4]
    f_jax = function([X, Wx, Wh], [cost, gX, gWx, gWh], mode="JAX")
    f_py = function([X, Wx, Wh], [cost, gX, gWx, gWh], mode="PY")
    for a, b in zip(f_jax(*args), f_py(*args)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9)


def test_second_order_grad_through_scan():
    # Hessian-vector-product through a scan (grad of grad)
    x = at.vector("x", dtype="float64")
    h, _ = scan(
        lambda xt, acc: acc + at.sqr(xt) * acc * 0.5 + xt,
        sequences=[x], outputs_info=[at.constant(np.float64(1.0))],
    )
    cost = h[-1]
    g = atp.grad(cost, x)
    v = at.vector("v", dtype="float64")
    hvp = atp.grad(at.math.sum(g * v), x, disconnected_inputs="ignore")
    f = function([x, v], hvp, mode="PY")
    xv = rng.normal(size=4) * 0.3
    vv = rng.normal(size=4)
    # finite-difference HVP check
    def grad_num(xx):
        fg = function([x], atp.grad(cost, x), mode="PY")
        return np.asarray(fg(xx))
    eps = 1e-6
    num = (grad_num(xv + eps * vv) - grad_num(xv - eps * vv)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(f(xv, vv)), num, rtol=1e-4, atol=1e-7)
