"""nnet depth wave: the ops no prior grid touched — separable_conv2d,
conv2d_transpose, h_softmax, confusion_matrix, the small activation
family (softsign/logsoftmax/hard- & ultra-fast-sigmoid/elu/selu), the
crossentropy_softmax_1hot internal-consistency contracts, and a
torch-CTCLoss oracle (reference ``tests/tensor/nnet/test_basic.py``,
``test_abstract_conv.py``, ``test_ctc.py``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")  # oracle only; skip, don't error
import torch.nn.functional as F  # noqa: E402

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function

rng = np.random.default_rng(515)


def t4(name):
    return at.tensor4(name, dtype="float32")


# ---------------------------------------------------------------------------
# separable_conv2d (depthwise groups + 1x1 pointwise)
# ---------------------------------------------------------------------------

class TestSeparableConv2d:
    @pytest.mark.parametrize("mult", [1, 2])
    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_vs_torch(self, mult, mode):
        from aesara_tpu.tensor.nnet import separable_conv2d

        C = 3
        xv = rng.normal(size=(2, C, 8, 8)).astype("float32")
        dw = rng.normal(size=(C * mult, 1, 3, 3)).astype("float32")
        pw = rng.normal(size=(5, C * mult, 1, 1)).astype("float32")
        x, d, p = t4("x"), t4("d"), t4("p")
        y = separable_conv2d(x, d, p, num_channels=C, filter_flip=False)
        f = function([x, d, p], y, mode=mode)
        got = np.asarray(f(xv, dw, pw))
        tdw = F.conv2d(torch.tensor(xv), torch.tensor(dw), groups=C)
        want = F.conv2d(tdw, torch.tensor(pw)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_static_shapes_stay_on_xla(self):
        # with static filter shapes the group slices are constants and
        # the graph must compile on XLA, not the py fallback
        import warnings

        from aesara_tpu.tensor.nnet import separable_conv2d

        C = 3
        x = at.tensor(dtype="float32", shape=(2, C, 8, 8), name="x")
        d = at.tensor(dtype="float32", shape=(C * 2, 1, 3, 3), name="d")
        p = at.tensor(dtype="float32", shape=(5, C * 2, 1, 1), name="p")
        y = separable_conv2d(x, d, p, num_channels=C, filter_flip=False)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            f = function([x, d, p], y, mode="FAST_RUN")
            f(rng.normal(size=(2, C, 8, 8)).astype("float32"),
              rng.normal(size=(C * 2, 1, 3, 3)).astype("float32"),
              rng.normal(size=(5, C * 2, 1, 1)).astype("float32"))
        assert not [w for w in rec if "py path" in str(w.message)]

    def test_grad_vs_torch(self):
        from aesara_tpu.tensor.nnet import separable_conv2d

        C = 2
        xv = rng.normal(size=(1, C, 6, 6)).astype("float32")
        dw = rng.normal(size=(C, 1, 3, 3)).astype("float32")
        pw = rng.normal(size=(3, C, 1, 1)).astype("float32")
        x, d, p = t4("x"), t4("d"), t4("p")
        loss = tm.sum(
            separable_conv2d(x, d, p, num_channels=C, filter_flip=False) ** 2)
        gx, gd, gp = atp.grad(loss, [x, d, p])
        f = function([x, d, p], [gx, gd, gp], mode="PY")
        got = [np.asarray(g) for g in f(xv, dw, pw)]

        tx = torch.tensor(xv, requires_grad=True)
        td = torch.tensor(dw, requires_grad=True)
        tp = torch.tensor(pw, requires_grad=True)
        tl = (F.conv2d(F.conv2d(tx, td, groups=C), tp) ** 2).sum()
        tl.backward()
        for g, w in zip(got, [tx.grad, td.grad, tp.grad]):
            np.testing.assert_allclose(g, w.numpy(), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# conv2d_transpose
# ---------------------------------------------------------------------------

class TestConv2dTranspose:
    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_vs_torch(self, mode):
        from aesara_tpu.tensor.nnet.abstract_conv import conv2d_transpose

        iv = rng.normal(size=(2, 4, 5, 5)).astype("float32")
        wv = rng.normal(size=(4, 3, 3, 3)).astype("float32")
        i, w = t4("i"), t4("w")
        o = conv2d_transpose(i, w, output_shape=(2, 3, 7, 7),
                             filter_flip=False)
        f = function([i, w], o, mode=mode)
        want = F.conv_transpose2d(torch.tensor(iv), torch.tensor(wv)).numpy()
        np.testing.assert_allclose(np.asarray(f(iv, wv)), want,
                                   rtol=1e-4, atol=1e-4)

    def test_is_adjoint_of_conv2d(self):
        # <conv(x), y> == <x, conv_transpose(y)> — the defining property
        from aesara_tpu.tensor.nnet.abstract_conv import (
            conv2d, conv2d_transpose)

        xv = rng.normal(size=(1, 2, 6, 6)).astype("float32")
        wv = rng.normal(size=(3, 2, 3, 3)).astype("float32")
        yv = rng.normal(size=(1, 3, 4, 4)).astype("float32")
        x, w, y = t4("x"), t4("w"), t4("y")
        lhs = tm.sum(conv2d(x, w, filter_flip=False) * y)
        rhs = tm.sum(x * conv2d_transpose(y, w, output_shape=(1, 2, 6, 6),
                                          filter_flip=False))
        f = function([x, w, y], [lhs, rhs], mode="PY")
        a, b = f(xv, wv, yv)
        np.testing.assert_allclose(float(np.asarray(a)),
                                   float(np.asarray(b)), rtol=1e-4)

    def test_missing_output_shape_raises(self):
        from aesara_tpu.tensor.nnet.abstract_conv import conv2d_transpose

        with pytest.raises(ValueError, match="output_shape"):
            conv2d_transpose(t4("i"), t4("w"))


# ---------------------------------------------------------------------------
# h_softmax
# ---------------------------------------------------------------------------

class TestHSoftmax:
    B, D, NC, P = 4, 6, 3, 4          # n_outputs = 12 (full grid)

    def _params(self):
        W1 = rng.normal(size=(self.D, self.NC)).astype("float64") * 0.3
        b1 = rng.normal(size=(self.NC,)).astype("float64") * 0.1
        W2 = rng.normal(size=(self.D, self.NC, self.P)).astype("float64") * 0.3
        b2 = rng.normal(size=(self.NC, self.P)).astype("float64") * 0.1
        xv = rng.normal(size=(self.B, self.D)).astype("float64")
        return xv, W1, b1, W2, b2

    def test_full_distribution_sums_to_one(self):
        from aesara_tpu.tensor.nnet import h_softmax

        xv, W1, b1, W2, b2 = self._params()
        x = at.matrix("x", dtype="float64")
        out = h_softmax(x, self.B, self.NC * self.P, self.NC, self.P,
                        at.constant(W1), at.constant(b1),
                        at.constant(W2), at.constant(b2))
        f = function([x], out, mode="PY")
        probs = np.asarray(f(xv))
        assert probs.shape == (self.B, self.NC * self.P)
        assert (probs >= 0).all()
        np.testing.assert_allclose(probs.sum(axis=1), np.ones(self.B),
                                   rtol=1e-10)

    def test_target_path_equals_full_gathered(self):
        from aesara_tpu.tensor.nnet import h_softmax

        xv, W1, b1, W2, b2 = self._params()
        tv = rng.integers(0, self.NC * self.P, size=self.B)
        x = at.matrix("x", dtype="float64")
        t = at.lvector("t")
        args = (x, self.B, self.NC * self.P, self.NC, self.P,
                at.constant(W1), at.constant(b1),
                at.constant(W2), at.constant(b2))
        full = h_softmax(*args)
        tgt = h_softmax(*args, target=t)
        f = function([x, t], [full, tgt], mode="PY")
        pf, pt = f(xv, tv)
        np.testing.assert_allclose(
            np.asarray(pt), np.asarray(pf)[np.arange(self.B), tv],
            rtol=1e-10)

    def test_truncated_n_outputs(self):
        # n_outputs < n_classes * P: the tail cells are dropped
        from aesara_tpu.tensor.nnet import h_softmax

        xv, W1, b1, W2, b2 = self._params()
        n_out = self.NC * self.P - 2
        x = at.matrix("x", dtype="float64")
        out = h_softmax(x, self.B, n_out, self.NC, self.P,
                        at.constant(W1), at.constant(b1),
                        at.constant(W2), at.constant(b2))
        f = function([x], out, mode="PY")
        probs = np.asarray(f(xv))
        assert probs.shape == (self.B, n_out)
        assert (probs.sum(axis=1) <= 1.0 + 1e-12).all()


# ---------------------------------------------------------------------------
# confusion_matrix
# ---------------------------------------------------------------------------

class TestConfusionMatrix:
    def test_matches_manual_oracle(self):
        from aesara_tpu.tensor.nnet import confusion_matrix

        a = at.lvector("a")
        p = at.lvector("p")
        conf, order = confusion_matrix(a, p)
        f = function([a, p], [conf, order], mode="PY")
        av = np.array([0, 1, 2, 1, 0])
        pv = np.array([0, 2, 2, 1, 1])
        got_conf, got_order = f(av, pv)
        got_conf = np.asarray(got_conf)
        got_order = np.asarray(got_order)
        labels = np.unique(np.concatenate([av, pv]))
        np.testing.assert_array_equal(got_order, labels)
        want = np.zeros((len(labels), len(labels)), dtype="int64")
        for x, y in zip(av, pv):
            want[np.where(labels == x)[0][0],
                 np.where(labels == y)[0][0]] += 1
        np.testing.assert_array_equal(got_conf, want)

    def test_label_subset_order(self):
        # labels absent from `actual` but present in `pred` still appear
        from aesara_tpu.tensor.nnet import confusion_matrix

        a = at.lvector("a")
        p = at.lvector("p")
        conf, order = confusion_matrix(a, p)
        f = function([a, p], [conf, order], mode="PY")
        got_conf, got_order = f(np.array([3, 3]), np.array([3, 5]))
        np.testing.assert_array_equal(np.asarray(got_order), [3, 5])
        np.testing.assert_array_equal(np.asarray(got_conf),
                                      [[1, 1], [0, 0]])


# ---------------------------------------------------------------------------
# small activation family vs torch
# ---------------------------------------------------------------------------

class TestActivationFamily:
    X = (rng.normal(size=(3, 7)) * 3.0).astype("float32")

    def _run(self, builder, mode="PY"):
        x = at.matrix("x", dtype="float32")
        return np.asarray(function([x], builder(x), mode=mode)(self.X))

    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_softsign(self, mode):
        from aesara_tpu.tensor.nnet import softsign

        got = self._run(softsign, mode)
        want = F.softsign(torch.tensor(self.X)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6)

    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_logsoftmax(self, mode):
        from aesara_tpu.tensor.nnet import logsoftmax

        got = self._run(logsoftmax, mode)
        want = F.log_softmax(torch.tensor(self.X), dim=-1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_elu_selu(self):
        from aesara_tpu.tensor.nnet import elu, selu

        np.testing.assert_allclose(
            self._run(elu), F.elu(torch.tensor(self.X)).numpy(),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            self._run(selu), F.selu(torch.tensor(self.X)).numpy(),
            rtol=1e-4, atol=1e-5)

    def test_hard_sigmoid_bounds_and_slope(self):
        from aesara_tpu.tensor.nnet import hard_sigmoid, sigmoid

        got = self._run(hard_sigmoid)
        assert (got >= 0).all() and (got <= 1).all()
        # agrees with the exact sigmoid to ~.02 in the linear region
        near = self._run(lambda v: hard_sigmoid(v * 0.1))
        exact = self._run(lambda v: sigmoid(v * 0.1))
        np.testing.assert_allclose(near, exact, atol=0.05)

    def test_ultra_fast_sigmoid_props(self):
        from aesara_tpu.tensor.nnet import sigmoid, ultra_fast_sigmoid

        got = self._run(ultra_fast_sigmoid)
        assert (got > 0).all() and (got < 1).all()
        # monotone in x
        xs = np.linspace(-6, 6, 41, dtype="float32")[None]
        x = at.matrix("x", dtype="float32")
        f = function([x], ultra_fast_sigmoid(x), mode="PY")
        ys = np.asarray(f(xs)).ravel()
        assert (np.diff(ys) >= 0).all()
        # within 0.05 of the exact sigmoid everywhere (the reference's
        # documented approximation tolerance)
        exact = 1.0 / (1.0 + np.exp(-xs.ravel()))
        assert np.abs(ys - exact).max() < 0.05


# ---------------------------------------------------------------------------
# crossentropy_softmax_1hot family consistency
# ---------------------------------------------------------------------------

class TestCrossentropyFamily:
    def test_1hot_equals_gathered_logsoftmax(self):
        from aesara_tpu.tensor.nnet import crossentropy_softmax_1hot

        xv = rng.normal(size=(5, 7)).astype("float64")
        yv = rng.integers(0, 7, size=5)
        x = at.matrix("x", dtype="float64")
        y = at.lvector("y")
        xent, sm = crossentropy_softmax_1hot(x, y)
        f = function([x, y], [xent, sm], mode="PY")
        got_xent, got_sm = f(xv, yv)
        t = torch.tensor(xv)
        want_sm = F.softmax(t, dim=-1).numpy()
        want_xent = F.cross_entropy(t, torch.tensor(yv),
                                    reduction="none").numpy()
        np.testing.assert_allclose(np.asarray(got_sm), want_sm, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(got_xent), want_xent,
                                   rtol=1e-10)

    def test_with_bias_consistent(self):
        from aesara_tpu.tensor.nnet import (
            crossentropy_softmax_1hot, crossentropy_softmax_1hot_with_bias)

        xv = rng.normal(size=(4, 6)).astype("float64")
        bv = rng.normal(size=(6,)).astype("float64")
        yv = rng.integers(0, 6, size=4)
        x = at.matrix("x", dtype="float64")
        b = at.vector("b", dtype="float64")
        y = at.lvector("y")
        xent_b, _ = crossentropy_softmax_1hot_with_bias(x, b, y)
        xent_p, _ = crossentropy_softmax_1hot(x + b, y)
        f = function([x, b, y], [xent_b, xent_p], mode="PY")
        ra, rb = f(xv, bv, yv)
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                                   rtol=1e-10)

    def test_argmax_variant(self):
        from aesara_tpu.tensor.nnet import (
            crossentropy_softmax_argmax_1hot_with_bias)

        xv = rng.normal(size=(4, 6)).astype("float64")
        bv = rng.normal(size=(6,)).astype("float64")
        yv = rng.integers(0, 6, size=4)
        x = at.matrix("x", dtype="float64")
        b = at.vector("b", dtype="float64")
        y = at.lvector("y")
        xent, sm, am = crossentropy_softmax_argmax_1hot_with_bias(x, b, y)
        f = function([x, b, y], [xent, am], mode="PY")
        _, got_am = f(xv, bv, yv)
        np.testing.assert_array_equal(np.asarray(got_am),
                                      np.argmax(xv + bv, axis=-1))

    def test_grad_vs_torch(self):
        from aesara_tpu.tensor.nnet import crossentropy_softmax_1hot

        xv = rng.normal(size=(5, 7)).astype("float64")
        yv = rng.integers(0, 7, size=5)
        x = at.matrix("x", dtype="float64")
        y = at.lvector("y")
        xent, _ = crossentropy_softmax_1hot(x, y)
        (gx,) = atp.grad(tm.sum(xent), [x])
        f = function([x, y], gx, mode="PY")
        t = torch.tensor(xv, requires_grad=True)
        F.cross_entropy(t, torch.tensor(yv), reduction="sum").backward()
        np.testing.assert_allclose(np.asarray(f(xv, yv)), t.grad.numpy(),
                                   rtol=1e-8)


# ---------------------------------------------------------------------------
# CTC vs torch.nn.CTCLoss (independent oracle; the in-tree test is a
# brute-force path-sum)
# ---------------------------------------------------------------------------

class TestCTCVsTorch:
    def test_loss_and_grad(self):
        from aesara_tpu.tensor.nnet.ctc import ctc

        T, B, C, L = 6, 2, 4, 3
        av = rng.normal(size=(T, B, C)).astype("float64")
        labels_v = np.array([[1, 2, 1], [3, 1, -1]], dtype="int64")
        ilen_v = np.array([6, 5], dtype="int64")
        llen_v = np.array([3, 2], dtype="int64")

        a = at.tensor3("a", dtype="float64")
        labels = at.lmatrix("labels")
        ilen = at.lvector("ilen")
        llen = at.lvector("llen")
        loss = ctc(a, labels, ilen, llen, blank=0)
        (ga,) = atp.grad(tm.sum(loss), [a])
        f = function([a, labels, ilen, llen], [loss, ga], mode="PY")
        got_loss, got_grad = f(av, labels_v, ilen_v, llen_v)

        ta = torch.tensor(av, requires_grad=True)
        lp = F.log_softmax(ta, dim=-1)
        tl = torch.nn.CTCLoss(blank=0, reduction="none")(
            lp, torch.tensor(np.where(labels_v < 0, 0, labels_v)),
            torch.tensor(ilen_v), torch.tensor(llen_v))
        np.testing.assert_allclose(np.asarray(got_loss),
                                   tl.detach().numpy(), rtol=1e-8)
        tl.sum().backward()
        np.testing.assert_allclose(np.asarray(got_grad), ta.grad.numpy(),
                                   rtol=1e-6, atol=1e-8)
