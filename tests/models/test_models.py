"""Model families: each trains a few steps through the full stack
(symbolic graph → BPTT/backprop → optimizer updates → one XLA program)
and the loss must drop."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.models import (GRU, LSTM, MLP, ConvNet, ElmanRNN,
                               LinearRegression, LogisticRegression,
                               TransformerEncoderLayer, adam, momentum,
                               rmsprop, sgd)


rng = np.random.default_rng(0)
XV = rng.normal(size=(64, 10)).astype("float32")
YV = (XV[:, 0] > 0).astype("int64")


def _train(model, inputs, vals, opt, steps=25, **kw):
    cost = model.loss(*inputs)
    f = atp.function(list(inputs), cost, updates=opt(cost, model.params, **kw))
    losses = [float(f(*vals)) for _ in range(steps)]
    return losses


def test_linear_regression_sgd():
    x = at.matrix("x")
    y = at.vector("y")
    yv = (XV @ np.arange(10).astype("float32") * 0.1).astype("float32")
    m = LinearRegression(10)
    ls = _train(m, (x, y), (XV, yv), sgd, lr=0.05)
    assert ls[-1] < ls[0] * 0.2


def test_logreg_adam():
    x = at.matrix("x")
    y = at.lvector("y")
    m = LogisticRegression(10, 2)
    ls = _train(m, (x, y), (XV, YV), adam, lr=0.05)
    assert ls[-1] < ls[0] * 0.5
    # predict head works
    p = atp.function([x], m.predict(x))(XV)
    assert (np.asarray(p) == YV).mean() > 0.9


def test_mlp_momentum():
    x = at.matrix("x")
    y = at.lvector("y")
    m = MLP(10, [16], 2, activation="relu")
    ls = _train(m, (x, y), (XV, YV), momentum, lr=0.05)
    assert ls[-1] < ls[0]


def test_convnet_rmsprop():
    x = at.tensor4("x")
    y = at.lvector("y")
    xv = rng.normal(size=(8, 1, 8, 8)).astype("float32")
    yv = rng.integers(0, 2, size=8).astype("int64")
    m = ConvNet(1, (8, 8), [4, 8], 2)
    ls = _train(m, (x, y), (xv, yv), rmsprop, lr=0.01, steps=20)
    assert ls[-1] < ls[0]


@pytest.mark.parametrize("cls", [ElmanRNN, LSTM, GRU])
def test_recurrent_family(cls):
    xs = at.tensor3("xs")
    y = at.lvector("y")
    xsv = rng.normal(size=(12, 8, 6)).astype("float32")
    ysv = rng.integers(0, 2, size=8).astype("int64")
    m = cls(6, 12, 2)
    ls = _train(m, (xs, y), (xsv, ysv), adam, lr=0.01, steps=15)
    assert ls[-1] < ls[0], (cls.__name__, ls[0], ls[-1])


def test_transformer_layer():
    xt = at.tensor3("xt")
    xtv = rng.normal(size=(4, 10, 32)).astype("float32")
    m = TransformerEncoderLayer(32, 4, 64)
    cost = m.loss(xt)
    f = atp.function([xt], cost, updates=sgd(cost, m.params, lr=0.01))
    ls = [float(f(xtv)) for _ in range(10)]
    assert ls[-1] < ls[0]
    out = atp.function([xt], m(xt))(xtv)
    assert np.asarray(out).shape == (4, 10, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_param_state_roundtrip():
    m = LogisticRegression(10, 2)
    vals = m.get_values()
    m.set_values([v * 0 for v in vals])
    assert all(np.all(v == 0) for v in m.get_values())
    m.set_values(vals)
    assert all(np.allclose(a, b) for a, b in zip(m.get_values(), vals))
