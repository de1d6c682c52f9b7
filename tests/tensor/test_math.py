"""dot/matmul/tensordot differential + gradient tests."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.gradient import verify_grad
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(7)


def fm(*shape):
    return rng.normal(size=shape).astype("float32")


def dm(*shape):
    return rng.normal(size=shape)


class TestDot:
    def test_mat_mat(self):
        x, y = at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        compare_jax_and_py([x, y], at.dot(x, y), [fm(3, 4), fm(4, 5)])

    def test_mat_vec(self):
        x, y = at.matrix("x", dtype="float64"), at.vector("y", dtype="float64")
        compare_jax_and_py([x, y], at.dot(x, y), [fm(3, 4), fm(4)])

    def test_vec_mat(self):
        x, y = at.vector("x", dtype="float64"), at.matrix("y", dtype="float64")
        compare_jax_and_py([x, y], at.dot(x, y), [fm(4), fm(4, 5)])

    def test_vec_vec(self):
        x, y = at.vector("x", dtype="float64"), at.vector("y", dtype="float64")
        compare_jax_and_py([x, y], at.dot(x, y), [fm(4), fm(4)])

    def test_static_mismatch_raises(self):
        x = at.tensor("x", shape=(3, 4))
        y = at.tensor("y", shape=(5, 6))
        with pytest.raises(TypeError):
            at.dot(x, y)

    def test_grad(self):
        verify_grad(lambda a, b: at.dot(a, b).sum(), [dm(3, 4), dm(4, 2)])
        verify_grad(lambda a, b: at.dot(a, b).sum(), [dm(4), dm(4, 2)])
        verify_grad(lambda a, b: at.dot(a, b).sum(), [dm(3, 4), dm(4)])
        verify_grad(lambda a, b: at.dot(a, b), [dm(4), dm(4)])

    def test_outer(self):
        x, y = at.vector("x", dtype="float64"), at.vector("y", dtype="float64")
        compare_jax_and_py([x, y], at.math.outer(x, y), [fm(3), fm(5)])


class TestBatchedDot:
    def test_3d_3d(self):
        x, y = at.tensor3("x", dtype="float64"), at.tensor3("y", dtype="float64")
        compare_jax_and_py([x, y], at.math.batched_dot(x, y), [fm(5, 3, 4), fm(5, 4, 2)])

    def test_grad(self):
        verify_grad(lambda a, b: at.math.batched_dot(a, b).sum(),
                    [dm(5, 3, 4), dm(5, 4, 2)])


class TestMatmulTensordot:
    def test_matmul_2d(self):
        x, y = at.matrix("x", dtype="float64"), at.matrix("y", dtype="float64")
        compare_jax_and_py([x, y], at.math.matmul(x, y), [fm(3, 4), fm(4, 5)])

    def test_matmul_batched(self):
        x, y = at.tensor3("x", dtype="float64"), at.tensor3("y", dtype="float64")
        compare_jax_and_py([x, y], at.math.matmul(x, y), [fm(2, 3, 4), fm(2, 4, 5)])

    def test_tensordot_int_axes(self):
        x, y = at.tensor3("x", dtype="float64"), at.tensor3("y", dtype="float64")
        a, b = fm(2, 3, 4), fm(3, 4, 5)
        out = at.math.tensordot(x, y, axes=2)
        fn = compare_jax_and_py([x, y], out, [a, b])
        np.testing.assert_allclose(
            np.asarray(fn[0]), np.tensordot(a, b, axes=2), rtol=1e-4
        )

    def test_tensordot_axes_lists(self):
        x, y = at.tensor3("x", dtype="float64"), at.tensor3("y", dtype="float64")
        a, b = fm(2, 3, 4), fm(4, 3, 5)
        out = at.math.tensordot(x, y, axes=[[1, 2], [1, 0]])
        fn = compare_jax_and_py([x, y], out, [a, b])
        np.testing.assert_allclose(
            np.asarray(fn[0]), np.tensordot(a, b, axes=[[1, 2], [1, 0]]), rtol=1e-4
        )

    def test_tensordot_grad(self):
        verify_grad(
            lambda a, b: at.math.tensordot(a, b, axes=2).sum(),
            [dm(2, 3, 4), dm(3, 4, 5)],
        )


class TestReductionsGrad:
    def test_sum_grad(self):
        verify_grad(lambda x: x.sum(), [dm(3, 4)])
        verify_grad(lambda x: x.sum(axis=1), [dm(3, 4)])

    def test_prod_grad(self):
        verify_grad(lambda x: x.prod(axis=0), [np.abs(dm(3, 4)) + 0.5])

    def test_max_grad(self):
        verify_grad(lambda x: x.max(axis=1), [dm(3, 4)])

    def test_min_grad(self):
        verify_grad(lambda x: x.min(axis=0), [dm(3, 4)])

    def test_mean_grad(self):
        verify_grad(lambda x: x.mean(axis=1), [dm(3, 4)])

    def test_elemwise_grads(self):
        verify_grad(lambda x: at.exp(x).sum(), [dm(3, 4)])
        verify_grad(lambda x: at.log(x).sum(), [np.abs(dm(3, 4)) + 0.5])
        verify_grad(lambda x: at.tanh(x).sum(), [dm(3, 4)])
        verify_grad(lambda x: at.math.sigmoid(x).sum(), [dm(3, 4)])
        verify_grad(lambda x: at.sqrt(x).sum(), [np.abs(dm(3, 4)) + 0.5])
        verify_grad(lambda x, y: at.math.maximum(x, y).sum(), [dm(3, 4), dm(3, 4)])
        verify_grad(lambda x: at.math.erf(x).sum(), [dm(3, 4)])
        verify_grad(lambda x: at.math.softplus(x).sum(), [dm(3, 4)])

    def test_broadcast_grad(self):
        # gradient through broadcasting sums over the broadcast dims
        verify_grad(lambda r, c: (r * c).sum(), [dm(1, 4), dm(3, 1)])

    def test_switch_grad(self):
        verify_grad(
            lambda x, y: at.switch(at.constant(np.array([[True, False]])), x, y).sum(),
            [dm(1, 2), dm(1, 2)],
        )


def test_clip_norm_misc():
    x = at.matrix("x", dtype="float64")
    v = fm(3, 4)
    compare_jax_and_py([x], at.math.clip(x, -0.5, 0.5), [v])
    compare_jax_and_py([x], at.math.norm(x, 2), [v])
    compare_jax_and_py([x], at.math.reciprocal(x + 10.0), [v])
    compare_jax_and_py([x], at.math.isnan(x), [v])
    compare_jax_and_py([x], at.math.round(x * 3), [v])
