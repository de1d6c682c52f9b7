"""Indexing tests: basic slicing, inc/set_subtensor, advanced indexing."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.gradient import grad, verify_grad
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(99)


def fm(*shape):
    return rng.normal(size=shape).astype("float32")


def dm(*shape):
    return rng.normal(size=shape)


class TestBasicSlicing:
    @pytest.mark.parametrize(
        "idx",
        [
            (slice(1, None),),
            (slice(None, None, 2),),
            (slice(1, 3), slice(None)),
            (2,),
            (slice(None), 1),
            (-1,),
            (slice(None, -1), slice(1, None)),
            (slice(None, None, -1),),
            (Ellipsis, 0),
        ],
    )
    def test_slices(self, idx):
        x = at.matrix("x", dtype="float64")
        v = fm(4, 5)
        res = compare_jax_and_py([x], x[idx], [v])
        np.testing.assert_allclose(np.asarray(res[0]), v[idx], rtol=1e-6)

    def test_symbolic_index(self):
        x = at.matrix("x", dtype="float64")
        i = at.iscalar("i")
        out = x[i]
        from tests.utils import py_mode
        from aesara_tpu.compile.function import function

        v = fm(4, 5)
        f = function([x, i], out, mode=py_mode)
        np.testing.assert_allclose(f(v, 2), v[2])

    def test_newaxis(self):
        x = at.matrix("x", dtype="float64")
        v = fm(4, 5)
        res = compare_jax_and_py([x], x[:, None], [v])
        assert np.asarray(res[0]).shape == (4, 1, 5)

    def test_static_shape(self):
        x = at.tensor("x", shape=(10, 20))
        assert x[2:7].type.shape == (5, 20)
        assert x[::2].type.shape == (5, 20)
        assert x[1].type.shape == (20,)

    def test_subtensor_grad(self):
        verify_grad(lambda x: x[1:3].sum(), [dm(5, 4)])
        verify_grad(lambda x: x[::2, 1:].sum(), [dm(5, 4)])


class TestIncSubtensor:
    def test_set(self):
        x = at.matrix("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = at.set_subtensor(x[1], y)
        xv, yv = fm(3, 4), fm(4)
        res = compare_jax_and_py([x, y], out, [xv, yv])
        expected = xv.copy()
        expected[1] = yv
        np.testing.assert_allclose(np.asarray(res[0]), expected, rtol=1e-6)

    def test_inc(self):
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        out = at.inc_subtensor(x[1:3], y)
        xv, yv = fm(5, 4), fm(2, 4)
        res = compare_jax_and_py([x, y], out, [xv, yv])
        expected = xv.copy()
        expected[1:3] += yv
        np.testing.assert_allclose(np.asarray(res[0]), expected, rtol=1e-6)

    def test_grads(self):
        verify_grad(lambda x, y: at.set_subtensor(x[1:3], y).sum() * 3.0,
                    [dm(5, 4), dm(2, 4)])
        verify_grad(lambda x, y: at.inc_subtensor(x[0], y).sum() * 2.0,
                    [dm(5, 4), dm(4)])


class TestAdvanced:
    def test_int_vector_index(self):
        x = at.matrix("x", dtype="float64")
        v = fm(5, 3)
        idx = np.array([0, 2, 4])
        res = compare_jax_and_py([x], x[idx], [v])
        np.testing.assert_allclose(np.asarray(res[0]), v[idx], rtol=1e-6)

    def test_symbolic_int_vector(self):
        x = at.matrix("x", dtype="float64")
        i = at.lvector("i")
        out = x[i]
        from aesara_tpu.compile.function import function
        from tests.utils import jax_mode, py_mode

        v = fm(5, 3)
        iv = np.array([1, 1, 3])
        fj = function([x, i], out, mode=jax_mode)
        fp = function([x, i], out, mode=py_mode)
        np.testing.assert_allclose(np.asarray(fj(v, iv)), fp(v, iv), rtol=1e-6)

    def test_adv1_grad(self):
        iv = np.array([0, 2, 2])

        def f(x):
            return x[at.constant(iv)].sum()

        verify_grad(f, [dm(5, 4)])

    def test_multi_array_index(self):
        x = at.matrix("x", dtype="float64")
        v = fm(5, 6)
        r = np.array([0, 2])
        c = np.array([1, 3])
        res = compare_jax_and_py([x], x[r, c], [v])
        np.testing.assert_allclose(np.asarray(res[0]), v[r, c], rtol=1e-6)

    def test_array_and_slice(self):
        x = at.matrix("x", dtype="float64")
        v = fm(5, 6)
        r = np.array([0, 2])
        res = compare_jax_and_py([x], x[r, 1:4], [v])
        np.testing.assert_allclose(np.asarray(res[0]), v[r, 1:4], rtol=1e-6)

    def test_set_advanced(self):
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        idx = np.array([0, 3])
        out = at.set_subtensor(x[at.constant(idx)], y)
        xv, yv = fm(5, 4), fm(2, 4)
        res = compare_jax_and_py([x, y], out, [xv, yv])
        expected = xv.copy()
        expected[idx] = yv
        np.testing.assert_allclose(np.asarray(res[0]), expected, rtol=1e-6)

    def test_inc_duplicates(self):
        # duplicate indices must accumulate (np.add.at semantics)
        x = at.vector("x", dtype="float64")
        idx = np.array([0, 0, 1])
        out = at.inc_subtensor(x[at.constant(idx)], at.ones((3,)))
        xv = fm(4)
        res = compare_jax_and_py([x], out, [xv])
        expected = xv.copy()
        np.add.at(expected, idx, 1.0)
        np.testing.assert_allclose(np.asarray(res[0]), expected, rtol=1e-6)

    def test_take(self):
        x = at.matrix("x", dtype="float64")
        v = fm(4, 5)
        res = compare_jax_and_py([x], at.take(x, at.constant(np.array([1, 3])), axis=1), [v])
        np.testing.assert_allclose(np.asarray(res[0]), np.take(v, [1, 3], axis=1), rtol=1e-6)


def test_boolean_mask_jax_mode_actionable_error():
    """Boolean-mask gather is inherently dynamic-length: JAX mode must
    fail at COMPILE time with a message pointing at mode="PY"/where."""
    import aesara_tpu as atp
    from tests.utils import jax_mode

    x = at.matrix("x", dtype="float64")
    with pytest.raises(NotImplementedError, match='mode="PY"'):
        atp.function([x], x[x > 0.3], mode=jax_mode)
