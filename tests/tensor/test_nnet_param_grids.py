"""nnet parameter-grid density (VERDICT r3 #5): conv2d over the
dilation/group/asymmetric-kernel grid, pooling over mode × stride ×
pad × ignore_border, batchnorm over axes layouts, softmax over axes —
forward and gradients, torch (an independent implementation) as the
oracle where available, NumPy otherwise.

Extends tests/tensor/test_nnet_torch_oracle.py's triangulation idiom to
the parameter corners the reference's conv/pool suites sweep
(``/root/reference/tests/tensor/nnet/test_abstract_conv.py`` grids).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.gradient import grad

rng = np.random.default_rng(2718)


def _t(x, requires_grad=True):
    return torch.tensor(np.asarray(x, dtype="float64"),
                        requires_grad=requires_grad)


class TestConvDilationGroups:
    @pytest.mark.parametrize("dilation", [(1, 1), (2, 2), (2, 1), (1, 3)])
    def test_dilation_grid(self, dilation):
        from aesara_tpu.tensor.nnet import conv2d

        B, Cin, H, W = 2, 2, 10, 11
        Cout, kh, kw = 3, 3, 3
        xv = rng.standard_normal((B, Cin, H, W))
        kv = rng.standard_normal((Cout, Cin, kh, kw))
        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        out = conv2d(x, k, border_mode="valid", filter_dilation=dilation)
        f = atp.function([x, k], out, mode="PY")
        o = np.asarray(f(xv, kv))
        tkf = torch.flip(_t(kv, False), dims=[2, 3])
        t_out = torch.nn.functional.conv2d(_t(xv, False), tkf,
                                           dilation=dilation)
        np.testing.assert_allclose(o, t_out.numpy(), rtol=1e-9)

    @pytest.mark.parametrize("kh,kw", [(1, 1), (1, 5), (5, 1), (2, 4)])
    def test_asymmetric_kernels(self, kh, kw):
        from aesara_tpu.tensor.nnet import conv2d

        B, Cin, H, W = 1, 2, 9, 9
        Cout = 2
        xv = rng.standard_normal((B, Cin, H, W))
        kv = rng.standard_normal((Cout, Cin, kh, kw))
        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        out = conv2d(x, k, border_mode="valid")
        f = atp.function([x, k], out, mode="PY")
        o = np.asarray(f(xv, kv))
        tkf = torch.flip(_t(kv, False), dims=[2, 3])
        t_out = torch.nn.functional.conv2d(_t(xv, False), tkf)
        np.testing.assert_allclose(o, t_out.numpy(), rtol=1e-9)

    @pytest.mark.parametrize("groups", [2, 4])
    def test_grouped_conv(self, groups):
        from aesara_tpu.tensor.nnet.abstract_conv import AbstractConv2d

        B, Cin, H, W = 2, 4, 8, 8
        Cout, kh, kw = 4, 3, 3
        xv = rng.standard_normal((B, Cin, H, W))
        kv = rng.standard_normal((Cout, Cin // groups, kh, kw))
        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        op = AbstractConv2d(border_mode="valid", subsample=(1, 1),
                            filter_flip=True, num_groups=groups)
        out = op(x, k)
        f = atp.function([x, k], out, mode="PY")
        o = np.asarray(f(xv, kv))
        tkf = torch.flip(_t(kv, False), dims=[2, 3])
        t_out = torch.nn.functional.conv2d(_t(xv, False), tkf,
                                           groups=groups)
        np.testing.assert_allclose(o, t_out.numpy(), rtol=1e-9)

    def test_dilated_grad_vs_torch(self):
        from aesara_tpu.tensor.nnet import conv2d

        B, Cin, H, W = 1, 2, 8, 8
        Cout, kh, kw = 2, 3, 3
        xv = rng.standard_normal((B, Cin, H, W))
        kv = rng.standard_normal((Cout, Cin, kh, kw))
        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        out = conv2d(x, k, border_mode="valid", filter_dilation=(2, 2))
        cost = (out ** 2).sum()
        gx, gk = grad(cost, [x, k])
        f = atp.function([x, k], [gx, gk], mode="PY")
        gxv, gkv = [np.asarray(v) for v in f(xv, kv)]
        tx, tk = _t(xv), _t(kv)
        tkf = torch.flip(tk, dims=[2, 3])
        t_cost = (torch.nn.functional.conv2d(tx, tkf, dilation=(2, 2)) ** 2
                  ).sum()
        t_cost.backward()
        np.testing.assert_allclose(gxv, tx.grad.numpy(), rtol=1e-8)
        np.testing.assert_allclose(gkv, tk.grad.numpy(), rtol=1e-8)


class TestPoolGrid:
    @pytest.mark.parametrize("mode,torch_fn", [
        ("max", "max_pool2d"),
        ("average_exc_pad", "avg_pool2d"),
    ])
    @pytest.mark.parametrize("ws,stride", [
        ((2, 2), None), ((2, 2), (2, 2)), ((3, 3), (2, 2)),
        ((2, 3), (1, 2)), ((3, 2), (3, 1)),
    ])
    def test_mode_stride_grid(self, mode, torch_fn, ws, stride):
        from aesara_tpu.tensor.nnet.pool import pool_2d

        xv = rng.standard_normal((2, 3, 8, 9))
        x = at.tensor4("x", dtype="float64")
        out = pool_2d(x, ws=ws, stride=stride, ignore_border=True, mode=mode)
        f = atp.function([x], out, mode="PY")
        o = np.asarray(f(xv))
        t_out = getattr(torch.nn.functional, torch_fn)(
            _t(xv, False), kernel_size=ws, stride=stride or ws)
        np.testing.assert_allclose(o, t_out.numpy(), rtol=1e-10)

    @pytest.mark.parametrize("pad", [(1, 1), (0, 1), (1, 0)])
    def test_padded_max_pool(self, pad):
        from aesara_tpu.tensor.nnet.pool import pool_2d

        xv = rng.standard_normal((1, 2, 7, 7))
        x = at.tensor4("x", dtype="float64")
        out = pool_2d(x, ws=(3, 3), stride=(2, 2), pad=pad,
                      ignore_border=True, mode="max")
        f = atp.function([x], out, mode="PY")
        o = np.asarray(f(xv))
        t_out = torch.nn.functional.max_pool2d(
            _t(xv, False), kernel_size=(3, 3), stride=(2, 2), padding=pad)
        np.testing.assert_allclose(o, t_out.numpy(), rtol=1e-10)

    def test_max_pool_grad_routes_to_argmax(self):
        from aesara_tpu.tensor.nnet.pool import pool_2d

        xv = rng.standard_normal((1, 1, 6, 6))
        x = at.tensor4("x", dtype="float64")
        out = pool_2d(x, ws=(2, 2), ignore_border=True, mode="max")
        g = grad(out.sum(), x)
        f = atp.function([x], g, mode="PY")
        gv = np.asarray(f(xv))
        tx = _t(xv)
        t_out = torch.nn.functional.max_pool2d(tx, kernel_size=(2, 2))
        t_out.sum().backward()
        np.testing.assert_allclose(gv, tx.grad.numpy(), rtol=1e-10)

    def test_avg_pool_grad(self):
        from aesara_tpu.tensor.nnet.pool import pool_2d

        xv = rng.standard_normal((1, 1, 6, 6))
        x = at.tensor4("x", dtype="float64")
        out = pool_2d(x, ws=(3, 3), ignore_border=True,
                      mode="average_exc_pad")
        g = grad(out.sum(), x)
        f = atp.function([x], g, mode="PY")
        gv = np.asarray(f(xv))
        tx = _t(xv)
        t_out = torch.nn.functional.avg_pool2d(tx, kernel_size=(3, 3))
        t_out.sum().backward()
        np.testing.assert_allclose(gv, tx.grad.numpy(), rtol=1e-10)


class TestBatchNormGrid:
    @pytest.mark.parametrize("axes", [(0,), (0, 2, 3)])
    def test_train_layouts(self, axes):
        from aesara_tpu.tensor.nnet.batchnorm import batch_normalization_train

        shape = (4, 3) if axes == (0,) else (4, 3, 5, 5)
        param_shape = tuple(1 if i in axes else s
                            for i, s in enumerate(shape))
        xv = rng.standard_normal(shape)
        gv = np.abs(rng.standard_normal(param_shape)) + 0.5
        bv = rng.standard_normal(param_shape)
        x = at.tensor(dtype="float64", shape=(None,) * len(shape))
        g = at.as_tensor_variable(gv)
        b = at.as_tensor_variable(bv)
        out, mean, invstd, *_ = batch_normalization_train(
            x, g, b, axes=axes, epsilon=1e-5)
        f = atp.function([x], [out, mean], mode="PY")
        o, m = [np.asarray(v) for v in f(xv)]
        exp_mean = xv.mean(axis=axes, keepdims=True)
        exp_std = np.sqrt(xv.var(axis=axes, keepdims=True) + 1e-5)
        np.testing.assert_allclose(m, exp_mean, rtol=1e-10)
        np.testing.assert_allclose(o, (xv - exp_mean) / exp_std * gv + bv,
                                   rtol=1e-9)

    def test_inference_matches_running_stats(self):
        from aesara_tpu.tensor.nnet.batchnorm import batch_normalization_test

        xv = rng.standard_normal((6, 3))
        gv = np.abs(rng.standard_normal((1, 3))) + 0.5
        bv = rng.standard_normal((1, 3))
        mv = rng.standard_normal((1, 3))
        vv = np.abs(rng.standard_normal((1, 3))) + 0.5
        x = at.matrix("x", dtype="float64")
        out = batch_normalization_test(
            x, at.as_tensor_variable(gv), at.as_tensor_variable(bv),
            at.as_tensor_variable(mv), at.as_tensor_variable(vv),
            axes=(0,), epsilon=1e-5)
        f = atp.function([x], out, mode="PY")
        o = np.asarray(f(xv))
        np.testing.assert_allclose(
            o, (xv - mv) / np.sqrt(vv + 1e-5) * gv + bv, rtol=1e-10)

    def test_train_grad_vs_torch(self):
        from aesara_tpu.tensor.nnet.batchnorm import batch_normalization_train

        xv = rng.standard_normal((8, 4))
        x = at.matrix("x", dtype="float64")
        g = at.as_tensor_variable(np.ones((1, 4)))
        b = at.as_tensor_variable(np.zeros((1, 4)))
        out, *_ = batch_normalization_train(x, g, b, axes=(0,),
                                            epsilon=1e-5)
        gx = grad((out ** 2).sum(), x)
        f = atp.function([x], gx, mode="PY")
        gv = np.asarray(f(xv))
        tx = _t(xv)
        t_out = torch.nn.functional.batch_norm(
            tx, None, None, training=True, eps=1e-5)
        (t_out ** 2).sum().backward()
        np.testing.assert_allclose(gv, tx.grad.numpy(), rtol=1e-7,
                                   atol=1e-9)


class TestSoftmaxGrid:
    @pytest.mark.parametrize("axis", [-1, 0, 1])
    def test_softmax_axes_vs_torch(self, axis):
        from aesara_tpu.tensor.special import softmax

        xv = rng.standard_normal((4, 6))
        x = at.matrix("x", dtype="float64")
        out = softmax(x, axis=axis)
        f = atp.function([x], out, mode="PY")
        o = np.asarray(f(xv))
        t_out = torch.nn.functional.softmax(_t(xv, False), dim=axis)
        np.testing.assert_allclose(o, t_out.numpy(), rtol=1e-10)

    def test_softmax_grad_vs_torch(self):
        from aesara_tpu.tensor.special import softmax

        xv = rng.standard_normal((3, 5))
        wv = rng.standard_normal((3, 5))
        x = at.matrix("x", dtype="float64")
        out = (softmax(x, axis=-1) * at.as_tensor_variable(wv)).sum()
        g = grad(out, x)
        f = atp.function([x], g, mode="PY")
        gv = np.asarray(f(xv))
        tx = _t(xv)
        ((torch.nn.functional.softmax(tx, dim=-1)
          * torch.tensor(wv)).sum()).backward()
        np.testing.assert_allclose(gv, tx.grad.numpy(), rtol=1e-9)

    def test_large_logits_stable(self):
        from aesara_tpu.tensor.special import softmax

        xv = np.array([[1000.0, 1000.0, -1000.0]])
        x = at.matrix("x", dtype="float64")
        f = atp.function([x], softmax(x, axis=-1), mode="PY")
        o = np.asarray(f(xv))
        assert np.isfinite(o).all()
        np.testing.assert_allclose(o[0, :2], [0.5, 0.5], rtol=1e-10)
