"""nnet tests: conv2d, pooling, batchnorm, crossentropies."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.gradient import verify_grad
from aesara_tpu.tensor import nnet
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(61)


def dm(*s):
    return rng.normal(size=s)


class TestConv2d:
    @pytest.mark.parametrize("border", ["valid", "full", "half", 1])
    def test_forward_matches_reference_conv(self, border):
        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        out = nnet.conv2d(x, k, border_mode=border)
        xv = dm(2, 3, 8, 8)
        kv = dm(4, 3, 3, 3)
        res = compare_jax_and_py([x, k], out, [xv, kv])
        # cross-check "valid" against an explicit loop
        if border == "valid":
            expected = np.zeros((2, 4, 6, 6))
            kf = kv[:, :, ::-1, ::-1]
            for b in range(2):
                for f in range(4):
                    for i in range(6):
                        for j in range(6):
                            expected[b, f, i, j] = np.sum(
                                xv[b, :, i:i+3, j:j+3] * kf[f]
                            )
            np.testing.assert_allclose(np.asarray(res[0]), expected, rtol=1e-8)

    def test_subsample(self):
        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        out = nnet.conv2d(x, k, subsample=(2, 2))
        res = compare_jax_and_py([x, k], out, [dm(1, 2, 9, 9), dm(3, 2, 3, 3)])
        assert np.asarray(res[0]).shape == (1, 3, 4, 4)

    def test_static_shape(self):
        x = at.tensor("x", dtype="float64", shape=(2, 3, 8, 8))
        k = at.tensor("k", dtype="float64", shape=(4, 3, 3, 3))
        assert nnet.conv2d(x, k).type.shape == (2, 4, 6, 6)

    def test_grads(self):
        verify_grad(
            lambda x, k: nnet.conv2d(x, k).sum(),
            [dm(1, 2, 6, 6), dm(3, 2, 3, 3)],
        )
        verify_grad(
            lambda x, k: nnet.conv2d(x, k, border_mode="half", subsample=(2, 2)).sum(),
            [dm(1, 2, 6, 6), dm(3, 2, 3, 3)],
        )

    def test_conv2d_transpose(self):
        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        out = nnet.conv2d_transpose(x, k, output_shape=(1, 2, 8, 8))
        res = compare_jax_and_py([x, k], out, [dm(1, 3, 6, 6), dm(3, 2, 3, 3)])
        assert np.asarray(res[0]).shape == (1, 2, 8, 8)


class TestPool:
    @pytest.mark.parametrize("mode", ["max", "sum", "average_inc_pad"])
    def test_forward(self, mode):
        x = at.tensor4("x", dtype="float64")
        out = nnet.pool_2d(x, ws=(2, 2), mode=mode)
        xv = dm(2, 3, 6, 6)
        res = compare_jax_and_py([x], out, [xv])
        if mode == "max":
            expected = xv.reshape(2, 3, 3, 2, 3, 2).max(axis=(3, 5))
            np.testing.assert_allclose(np.asarray(res[0]), expected)

    def test_ignore_border_false(self):
        x = at.tensor4("x", dtype="float64")
        out = nnet.pool_2d(x, ws=(2, 2), ignore_border=False)
        xv = dm(1, 1, 5, 5)
        res = compare_jax_and_py([x], out, [xv])
        assert np.asarray(res[0]).shape == (1, 1, 3, 3)

    def test_grad(self):
        verify_grad(
            lambda x: nnet.pool_2d(x, ws=(2, 2), mode="max").sum(),
            [dm(1, 1, 6, 6)],
        )
        verify_grad(
            lambda x: nnet.pool_2d(x, ws=(2, 2), mode="average_inc_pad").sum(),
            [dm(1, 1, 6, 6)],
        )


class TestBasic:
    def test_relu_elu(self):
        x = at.vector("x", dtype="float64")
        v = dm(6)
        res = compare_jax_and_py([x], nnet.relu(x), [v])
        np.testing.assert_allclose(np.asarray(res[0]), np.maximum(v, 0))
        compare_jax_and_py([x], nnet.relu(x, 0.1), [v])
        compare_jax_and_py([x], nnet.elu(x), [v])
        compare_jax_and_py([x], nnet.selu(x), [v])
        verify_grad(lambda m: nnet.elu(m).sum(), [v])

    def test_binary_crossentropy(self):
        p = at.vector("p", dtype="float64")
        t = at.vector("t", dtype="float64")
        pv = rng.uniform(0.1, 0.9, 5)
        tv = rng.integers(0, 2, 5).astype("float64")
        res = compare_jax_and_py([p, t], nnet.binary_crossentropy(p, t), [pv, tv])
        expected = -(tv * np.log(pv) + (1 - tv) * np.log(1 - pv))
        np.testing.assert_allclose(np.asarray(res[0]), expected)

    def test_sigmoid_binary_crossentropy_matches(self):
        x = at.vector("x", dtype="float64")
        t = at.vector("t", dtype="float64")
        xv = dm(5)
        tv = rng.integers(0, 2, 5).astype("float64")
        fused = nnet.sigmoid_binary_crossentropy(x, t)
        naive = nnet.binary_crossentropy(at.math.sigmoid(x), t)
        fa = atp.function([x, t], fused, mode="PY")
        fb = atp.function([x, t], naive, mode="PY")
        np.testing.assert_allclose(fa(xv, tv), fb(xv, tv), rtol=1e-10)

    def test_categorical_crossentropy(self):
        logits = at.matrix("l", dtype="float64")
        y = at.lvector("y")
        xent, sm = nnet.crossentropy_softmax_1hot(logits, y)
        lv = dm(4, 3)
        yv = np.array([0, 2, 1, 1])
        res = compare_jax_and_py([logits, y], xent, [lv, yv])
        p = np.exp(lv) / np.exp(lv).sum(axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(res[0]), -np.log(p[np.arange(4), yv]), rtol=1e-8
        )
        verify_grad(
            lambda l: nnet.crossentropy_softmax_1hot(l, at.constant(yv))[0].sum(),
            [lv],
        )

    def test_batchnorm_train_test(self):
        x = at.tensor4("x", dtype="float64")
        g = at.tensor("g", dtype="float64", shape=(1, None, 1, 1))
        b = at.tensor("b", dtype="float64", shape=(1, None, 1, 1))
        out, mean, invstd = nnet.batch_normalization_train(x, g, b, axes="spatial")
        xv = dm(4, 3, 5, 5)
        gv = np.ones((1, 3, 1, 1))
        bv = np.zeros((1, 3, 1, 1))
        res = compare_jax_and_py([x, g, b], out, [xv, gv, bv])
        r = np.asarray(res[0])
        np.testing.assert_allclose(r.mean(axis=(0, 2, 3)), 0.0, atol=1e-10)
        np.testing.assert_allclose(r.std(axis=(0, 2, 3)), 1.0, atol=1e-3)
        out2 = nnet.batch_normalization_test(
            x, g, b, at.constant(xv.mean(axis=(0, 2, 3), keepdims=True)),
            at.constant(xv.var(axis=(0, 2, 3), keepdims=True)),
        )
        compare_jax_and_py([x, g, b], out2, [xv, gv, bv])

    def test_softmax_with_bias(self):
        x = at.matrix("x", dtype="float64")
        b = at.vector("b", dtype="float64")
        res = compare_jax_and_py([x, b], nnet.softmax_with_bias(x, b), [dm(3, 4), dm(4)])
        np.testing.assert_allclose(np.asarray(res[0]).sum(axis=1), 1.0)


class TestConv3d:
    def test_forward_and_grad(self):
        from aesara_tpu.tensor.nnet.abstract_conv import conv3d

        x = at.tensor5("x", dtype="float64")
        k = at.tensor5("k", dtype="float64")
        out = conv3d(x, k)
        res = compare_jax_and_py(
            [x, k], out, [dm(1, 2, 5, 5, 5), dm(3, 2, 2, 2, 2)]
        )
        assert np.asarray(res[0]).shape == (1, 3, 4, 4, 4)
        verify_grad(
            lambda a, b: conv3d(a, b).sum(),
            [dm(1, 1, 4, 4, 4), dm(2, 1, 2, 2, 2)],
        )


class TestNeighbours:
    def test_images2neibs(self):
        from aesara_tpu.tensor.nnet.neighbours import images2neibs

        x = at.tensor4("x", dtype="float64")
        out = images2neibs(x, at.constant(np.array([2, 2])))
        xv = dm(1, 1, 4, 4)
        res = compare_jax_and_py([x], out, [xv])
        r = np.asarray(res[0])
        assert r.shape == (4, 4)
        np.testing.assert_allclose(r[0], xv[0, 0, :2, :2].ravel())


class TestCTC:
    def test_ctc_matches_bruteforce(self):
        from aesara_tpu.tensor.nnet.ctc import ctc

        T, B, C, L = 4, 2, 3, 2
        acts = at.tensor3("acts", dtype="float64")
        labels = at.lmatrix("labels")
        ilen = at.lvector("ilen")
        loss = ctc(acts, labels, ilen)
        av = rng.normal(size=(T, B, C))
        lv = np.array([[1, 2], [2, 1]])
        iv = np.array([4, 4])
        res = compare_jax_and_py([acts, labels, ilen], loss, [av, lv, iv])
        # brute-force: enumerate all paths for sequence 0
        logp = av - np.log(np.exp(av).sum(-1, keepdims=True))
        import itertools

        def collapse(path):
            out = []
            prev = None
            for s in path:
                if s != prev and s != 0:
                    out.append(s)
                prev = s
            return out

        total = 0.0
        for path in itertools.product(range(C), repeat=T):
            if collapse(path) == [1, 2]:
                total += np.exp(sum(logp[t, 0, path[t]] for t in range(T)))
        np.testing.assert_allclose(np.asarray(res[0])[0], -np.log(total), rtol=1e-6)

    def test_ctc_grad(self):
        from aesara_tpu.tensor.nnet.ctc import ctc

        lv = np.array([[1, 2]])
        iv = np.array([5])

        def build(a):
            return ctc(a, at.constant(lv), at.constant(iv)).sum()

        verify_grad(build, [rng.normal(size=(5, 1, 3)) * 0.5])


class TestBlocksparseConv3d2d:
    def test_sparse_block_dot(self):
        from aesara_tpu.tensor.nnet.blocksparse import sparse_block_dot

        W = at.tensor("W", dtype="float64", shape=(None,) * 4)
        h = at.tensor3("h", dtype="float64")
        bb = at.matrix("b", dtype="float64")
        iIdx = at.lmatrix("iIdx")
        oIdx = at.lmatrix("oIdx")
        out = sparse_block_dot(W, h, iIdx, bb, oIdx)
        Wv = dm(3, 4, 2, 5)
        hv = dm(2, 2, 2)
        iv = np.array([[0, 2], [1, 0]])
        ov = np.array([[1, 3], [0, 2]])
        bv = dm(4, 5)
        res = compare_jax_and_py([W, h, iIdx, bb, oIdx], out, [Wv, hv, iv, bv, ov])
        expected = np.zeros((2, 2, 5))
        for bi in range(2):
            for j in range(2):
                acc = bv[ov[bi, j]].copy()
                for i in range(2):
                    acc += hv[bi, i] @ Wv[iv[bi, i], ov[bi, j]]
                expected[bi, j] = acc
        np.testing.assert_allclose(np.asarray(res[0]), expected, rtol=1e-8)

    def test_conv3d2d_alias(self):
        from aesara_tpu.tensor.nnet.conv3d2d import conv3d

        s = at.tensor5("s", dtype="float64")
        f5 = at.tensor5("f", dtype="float64")
        out = conv3d(s, f5)
        res = compare_jax_and_py(
            [s, f5], out, [dm(1, 4, 2, 5, 5), dm(3, 2, 2, 2, 2)]
        )
        assert np.asarray(res[0]).shape == (1, 3, 3, 4, 4)
