"""Differential tests (XLA vs NumPy oracle) for the elemwise family."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.tensor.elemwise import DimShuffle
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(123)


def fm(*shape):
    return rng.normal(size=shape).astype("float32")


UNARY_CASES = [
    (at.exp, fm(3, 4)),
    (at.log, np.abs(fm(3, 4)) + 0.1),
    (at.log1p, np.abs(fm(3, 4))),
    (at.sqrt, np.abs(fm(3, 4))),
    (at.math.sqr, fm(3, 4)),
    (at.sin, fm(3, 4)),
    (at.cos, fm(3, 4)),
    (at.tanh, fm(3, 4)),
    (at.math.sigmoid, fm(3, 4)),
    (at.math.softplus, fm(3, 4) * 10),
    (at.math.erf, fm(3, 4)),
    (at.math.erfc, fm(3, 4)),
    (at.math.gammaln, np.abs(fm(3, 4)) + 0.5),
    (at.math.psi, np.abs(fm(3, 4)) + 0.5),
    (at.math.neg, fm(3, 4)),
    (at.math.abs, fm(3, 4)),
    (at.math.sgn, fm(3, 4)),
    (at.math.ceil, fm(3, 4) * 3),
    (at.math.floor, fm(3, 4) * 3),
    (at.math.expm1, fm(3, 4)),
    (at.math.arctan, fm(3, 4)),
    (at.math.arcsinh, fm(3, 4)),
]


@pytest.mark.parametrize("fn,val", UNARY_CASES, ids=[f[0].__name__ for f in UNARY_CASES])
def test_unary_elemwise(fn, val):
    x = at.matrix("x", dtype="float64")
    compare_jax_and_py([x], fn(x), [val])


BINARY_CASES = [
    (at.add, fm(3, 4), fm(3, 4)),
    (at.sub, fm(3, 4), fm(3, 4)),
    (at.mul, fm(3, 4), fm(3, 4)),
    (at.true_div, fm(3, 4), np.abs(fm(3, 4)) + 0.5),
    (at.math.maximum, fm(3, 4), fm(3, 4)),
    (at.math.minimum, fm(3, 4), fm(3, 4)),
    (at.math.arctan2, fm(3, 4), np.abs(fm(3, 4)) + 0.5),
    (at.math.pow, np.abs(fm(3, 4)) + 0.5, fm(3, 4)),
]


@pytest.mark.parametrize("fn,a,b", BINARY_CASES, ids=[f[0].__name__ for f in BINARY_CASES])
def test_binary_elemwise(fn, a, b):
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    compare_jax_and_py([x, y], fn(x, y), [a, b])


def test_broadcasting_row_col():
    x = at.matrix("x", dtype="float64")
    r = at.row("r", dtype="float64")
    c = at.col("c", dtype="float64")
    out = x + r * c
    compare_jax_and_py([x, r, c], out, [fm(3, 4), fm(1, 4), fm(3, 1)])


def test_scalar_tensor_mix():
    x = at.matrix("x", dtype="float64")
    s = at.scalar("s", dtype="float64")
    compare_jax_and_py([x, s], x * s + 2.0, [fm(3, 4), np.float32(1.5)])


def test_comparison_dtypes():
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = at.math.lt(x, y)
    res = compare_jax_and_py([x, y], out, [fm(2, 2), fm(2, 2)])
    assert np.asarray(res[0]).dtype == np.bool_


def test_switch():
    x = at.matrix("x", dtype="float64")
    out = at.switch(x > 0, x, -x)
    compare_jax_and_py([x], out, [fm(3, 4)])


def test_int_arithmetic_dtypes():
    x = at.matrix("x", dtype="int32")
    y = at.matrix("y", dtype="int64")
    out = x + y
    assert out.type.dtype == "int64"
    a = rng.integers(0, 10, (2, 3)).astype("int32")
    b = rng.integers(0, 10, (2, 3)).astype("int64")
    compare_jax_and_py([x, y], out, [a, b])


def test_static_broadcast_check():
    x = at.tensor("x", shape=(3, 4))
    y = at.tensor("y", shape=(3, 5))
    with pytest.raises(TypeError):
        x + y


def test_runtime_broadcast_of_unknown_dim_raises_py_mode():
    from aesara_tpu.compile.function import function
    from tests.utils import py_mode

    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    f = function([x, y], x + y, mode=py_mode)
    with pytest.raises(Exception):
        f(fm(3, 4), fm(1, 4))  # y's dim is not statically 1 → error


class TestDimShuffle:
    def test_transpose(self):
        x = at.matrix("x", dtype="float64")
        compare_jax_and_py([x], x.T, [fm(3, 4)])

    def test_insert_broadcast(self):
        x = at.vector("x", dtype="float64")
        out = x.dimshuffle("x", 0, "x")
        res = compare_jax_and_py([x], out, [fm(5)])
        assert np.asarray(res[0]).shape == (1, 5, 1)

    def test_drop_broadcastable(self):
        x = at.row("x", dtype="float64")
        out = x.dimshuffle(1)
        res = compare_jax_and_py([x], out, [fm(1, 7)])
        assert np.asarray(res[0]).shape == (7,)

    def test_drop_non_broadcastable_raises(self):
        x = at.matrix("x", dtype="float64")
        with pytest.raises(TypeError):
            x.dimshuffle(1)


class TestCAReduce:
    @pytest.mark.parametrize("axis", [None, 0, 1, (0, 1)])
    def test_sum(self, axis):
        x = at.matrix("x", dtype="float64")
        compare_jax_and_py([x], at.math.sum(x, axis=axis), [fm(3, 4)])

    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_prod_max_min(self, axis):
        x = at.matrix("x", dtype="float64")
        compare_jax_and_py([x], at.math.prod(x, axis=axis), [fm(3, 4) * 0.5])
        compare_jax_and_py([x], at.math.max(x, axis=axis), [fm(3, 4)])
        compare_jax_and_py([x], at.math.min(x, axis=axis), [fm(3, 4)])

    def test_sum_int_upcast(self):
        x = at.matrix("x", dtype="int8")
        out = at.math.sum(x)
        assert out.type.dtype == "int64"
        a = rng.integers(-5, 5, (3, 4)).astype("int8")
        compare_jax_and_py([x], out, [a])

    def test_all_any(self):
        x = at.matrix("x", dtype="bool")
        a = rng.integers(0, 2, (3, 4)).astype(bool)
        compare_jax_and_py([x], at.math.all(x, axis=0), [a])
        compare_jax_and_py([x], at.math.any(x, axis=1), [a])

    def test_mean_var_std(self):
        x = at.matrix("x", dtype="float64")
        v = fm(4, 5)
        compare_jax_and_py([x], at.math.mean(x, axis=0), [v])
        compare_jax_and_py([x], at.math.var(x, axis=1), [v])
        compare_jax_and_py([x], at.math.std(x), [v])

    def test_keepdims(self):
        x = at.matrix("x", dtype="float64")
        res = compare_jax_and_py([x], at.math.sum(x, axis=1, keepdims=True), [fm(3, 4)])
        assert np.asarray(res[0]).shape == (3, 1)

    def test_argmax(self):
        x = at.matrix("x", dtype="float64")
        v = fm(3, 4)
        compare_jax_and_py([x], at.math.argmax(x, axis=1), [v])
        compare_jax_and_py([x], at.math.argmax(x), [v])
        compare_jax_and_py([x], at.math.argmin(x, axis=0), [v])
        compare_jax_and_py([x], at.math.max_and_argmax(x, axis=0), [v])

    def test_logsumexp(self):
        x = at.matrix("x", dtype="float64")
        compare_jax_and_py([x], at.math.logsumexp(x, axis=1), [fm(3, 4) * 10])
