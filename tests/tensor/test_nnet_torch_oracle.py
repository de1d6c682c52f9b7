"""Independent-oracle nnet tests: conv/pool/xent against torch (CPU).

The suite's primary oracle is the per-op ``perform`` (NumPy/SciPy); a
wrong formula there would hide from py-vs-XLA differentials.  torch is
a fully independent implementation — these tests triangulate the conv/
pool/cross-entropy family against it, forward AND gradients.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.gradient import grad

rng = np.random.default_rng(77)


def _t(x):
    return torch.tensor(np.asarray(x, dtype="float64"), requires_grad=True)


class TestConv2dVsTorch:
    @pytest.mark.parametrize("border,subsample", [
        ("valid", (1, 1)),
        ("full", (1, 1)),
        ("half", (1, 1)),
        ("valid", (2, 2)),
        ("half", (2, 1)),
    ])
    def test_forward_and_grads(self, border, subsample):
        from aesara_tpu.tensor.nnet import conv2d

        B, Cin, H, W = 2, 3, 8, 9
        Cout, kh, kw = 4, 3, 3
        xv = rng.standard_normal((B, Cin, H, W))
        kv = rng.standard_normal((Cout, Cin, kh, kw))

        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        out = conv2d(x, k, border_mode=border, subsample=subsample)
        cost = (out ** 2).sum()
        gx, gk = grad(cost, [x, k])
        f = atp.function([x, k], [out, gx, gk], mode="PY")
        o, gxv, gkv = [np.asarray(v) for v in f(xv, kv)]

        # torch oracle: conv2d CORRELATES, aesara convolves (kernel flip)
        tx, tk = _t(xv), _t(kv)
        tkf = torch.flip(tk, dims=[2, 3])
        pad = {"valid": 0, "full": (kh - 1, kw - 1),
               "half": (kh // 2, kw // 2)}[border]
        t_out = torch.nn.functional.conv2d(
            tx, tkf, stride=subsample, padding=pad
        )
        assert o.shape == tuple(t_out.shape), (o.shape, t_out.shape)
        np.testing.assert_allclose(o, t_out.detach().numpy(), rtol=1e-9)

        t_cost = (t_out ** 2).sum()
        t_cost.backward()
        np.testing.assert_allclose(gxv, tx.grad.numpy(), rtol=1e-8)
        # tk.grad already back-propagates THROUGH the flip, so it is
        # directly the convolution-kernel gradient
        np.testing.assert_allclose(gkv, tk.grad.numpy(), rtol=1e-8)


class TestPoolVsTorch:
    @pytest.mark.parametrize("ws,stride,mode", [
        ((2, 2), (2, 2), "max"),
        ((3, 3), (3, 3), "max"),
        ((2, 2), (2, 2), "average_exc_pad"),
    ])
    def test_forward_and_grad(self, ws, stride, mode):
        from aesara_tpu.tensor.nnet import pool_2d

        B, C, H, W = 2, 3, 8, 9
        xv = rng.standard_normal((B, C, H, W))
        x = at.tensor4("x", dtype="float64")
        out = pool_2d(x, ws, stride=stride, mode=mode, ignore_border=True)
        cost = (out ** 2).sum()
        gx = grad(cost, x)
        f = atp.function([x], [out, gx], mode="PY")
        o, gxv = [np.asarray(v) for v in f(xv)]

        tx = _t(xv)
        if mode == "max":
            t_out = torch.nn.functional.max_pool2d(tx, ws, stride=stride)
        else:
            t_out = torch.nn.functional.avg_pool2d(tx, ws, stride=stride)
        np.testing.assert_allclose(o, t_out.detach().numpy(), rtol=1e-10)
        (t_out ** 2).sum().backward()
        np.testing.assert_allclose(gxv, tx.grad.numpy(), rtol=1e-9)


class TestXentVsTorch:
    def test_softmax_cross_entropy(self):
        from aesara_tpu.tensor.nnet import (
            categorical_crossentropy,
            softmax,
        )

        B, C = 5, 7
        logits = rng.standard_normal((B, C))
        targets = rng.integers(0, C, size=B)

        x = at.matrix("x", dtype="float64")
        t = at.lvector("t")
        p = softmax(x)
        loss = categorical_crossentropy(p, t).mean()
        gx = grad(loss, x)
        f = atp.function([x, t], [loss, gx], mode="PY")
        lv, gv = [np.asarray(v) for v in f(logits, targets)]

        tx = _t(logits)
        t_loss = torch.nn.functional.cross_entropy(
            tx, torch.tensor(targets), reduction="mean"
        )
        np.testing.assert_allclose(lv, t_loss.detach().numpy(), rtol=1e-10)
        t_loss.backward()
        np.testing.assert_allclose(gv, tx.grad.numpy(), rtol=1e-9)

    def test_binary_crossentropy(self):
        from aesara_tpu.tensor.nnet import binary_crossentropy

        p = rng.uniform(0.05, 0.95, size=(4, 3))
        y = rng.integers(0, 2, size=(4, 3)).astype("float64")
        x = at.matrix("x", dtype="float64")
        t = at.matrix("t", dtype="float64")
        loss = binary_crossentropy(x, t).mean()
        gx = grad(loss, x)
        f = atp.function([x, t], [loss, gx], mode="PY")
        lv, gv = [np.asarray(v) for v in f(p, y)]
        tx = _t(p)
        t_loss = torch.nn.functional.binary_cross_entropy(
            tx, torch.tensor(y), reduction="mean")
        np.testing.assert_allclose(lv, t_loss.detach().numpy(), rtol=1e-10)
        t_loss.backward()
        np.testing.assert_allclose(gv, tx.grad.numpy(), rtol=1e-9)


class TestBatchNormVsTorch:
    def test_train_mode(self):
        from aesara_tpu.tensor.nnet import batch_normalization_train

        B, C = 6, 4
        xv = rng.standard_normal((B, C))
        gv = rng.uniform(0.5, 1.5, size=C)
        bv = rng.standard_normal(C)

        x = at.matrix("x", dtype="float64")
        g = at.vector("g", dtype="float64")
        b = at.vector("b", dtype="float64")
        out = batch_normalization_train(x, g, b, axes=(0,), epsilon=1e-5)[0]
        f = atp.function([x, g, b], out, mode="PY")
        o = np.asarray(f(xv, gv, bv))

        tx = torch.tensor(xv)
        t_out = torch.nn.functional.batch_norm(
            tx, None, None,
            weight=torch.tensor(gv), bias=torch.tensor(bv),
            training=True, eps=1e-5,
        )
        np.testing.assert_allclose(o, t_out.numpy(), rtol=1e-7)


class TestLSTMVsTorch:
    def test_final_state_matches_torch_lstmcell(self):
        """Our fused-gate LSTM (i,f,g,o over [x,h]·W) maps exactly onto
        torch.nn.LSTMCell: W_ih = w[:D].T, W_hh = w[D:].T, b_ih = b,
        b_hh = 0.  (The GRU is deliberately NOT triangulated: our Cho-
        formulation applies the reset gate before the hidden matmul,
        torch after — two published, non-equivalent variants.)"""
        from aesara_tpu.models import LSTM

        D, H, B, T = 3, 5, 2, 4
        model = LSTM(n_in=D, n_hidden=H, n_out=2, seed=1)
        x = at.tensor3("x", dtype="float32")
        h_last = model.final_state(x)
        f = atp.function([x], h_last, mode="PY")
        xv = rng.standard_normal((T, B, D)).astype("float32")
        ours = np.asarray(f(xv))

        wv = model.w.get_value()          # (D+H, 4H), gates i,f,g,o
        bv = model.b.get_value()
        cell = torch.nn.LSTMCell(D, H)
        with torch.no_grad():
            cell.weight_ih.copy_(torch.tensor(wv[:D].T))
            cell.weight_hh.copy_(torch.tensor(wv[D:].T))
            cell.bias_ih.copy_(torch.tensor(bv))
            cell.bias_hh.zero_()
        h = torch.zeros(B, H)
        c = torch.zeros(B, H)
        for t in range(T):
            h, c = cell(torch.tensor(xv[t]), (h, c))
        np.testing.assert_allclose(ours, h.detach().numpy(), rtol=1e-5,
                                   atol=1e-6)


class TestTransformerLayerVsTorch:
    def test_flagship_layer_matches_torch(self):
        """The flagship TransformerEncoderLayer maps exactly onto
        torch.nn.TransformerEncoderLayer(norm_first=True, relu,
        dropout=0) — packed qkv in_proj, transposed linears."""
        from aesara_tpu.models import TransformerEncoderLayer

        D, H, FF, B, T = 16, 4, 32, 2, 5
        m = TransformerEncoderLayer(D, H, FF, seed=3)
        x = at.tensor3("x", dtype="float32")
        f = atp.function([x], m(x), mode="PY")
        xv = rng.standard_normal((B, T, D)).astype("float32")
        ours = np.asarray(f(xv))

        tl = torch.nn.TransformerEncoderLayer(
            d_model=D, nhead=H, dim_feedforward=FF, dropout=0.0,
            activation="relu", batch_first=True, norm_first=True)
        with torch.no_grad():
            wq, wk, wv = (m.wq.get_value(), m.wk.get_value(),
                          m.wv.get_value())
            tl.self_attn.in_proj_weight.copy_(
                torch.tensor(np.concatenate([wq.T, wk.T, wv.T], 0)))
            tl.self_attn.in_proj_bias.zero_()
            tl.self_attn.out_proj.weight.copy_(
                torch.tensor(m.wo.get_value().T))
            tl.self_attn.out_proj.bias.zero_()
            tl.linear1.weight.copy_(torch.tensor(m.w1.get_value().T))
            tl.linear1.bias.copy_(torch.tensor(m.b1.get_value()))
            tl.linear2.weight.copy_(torch.tensor(m.w2.get_value().T))
            tl.linear2.bias.copy_(torch.tensor(m.b2.get_value()))
            tl.norm1.weight.copy_(torch.tensor(m.ln1_g.get_value()))
            tl.norm1.bias.copy_(torch.tensor(m.ln1_b.get_value()))
            tl.norm2.weight.copy_(torch.tensor(m.ln2_g.get_value()))
            tl.norm2.bias.copy_(torch.tensor(m.ln2_b.get_value()))
        tl.eval()
        with torch.no_grad():
            theirs = tl(torch.tensor(xv)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
