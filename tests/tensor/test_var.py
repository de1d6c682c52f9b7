"""The NumPy-like TensorVariable method/operator surface (reference
``aesara/tensor/var.py`` ``_tensor_py_operators``; tests/tensor/test_var.py).
Every entry evaluates through ``.eval`` and is compared against the
NumPy expression a user would write."""

import numpy as np
import pytest

import aesara_tpu.tensor as at

rng = np.random.default_rng(4242)

M = rng.normal(size=(3, 4))
V = rng.normal(size=4)
P = np.abs(rng.normal(size=(3, 4))) + 0.5
I8 = rng.integers(1, 7, size=(3, 4)).astype("int64")


def ev(expr, **givens):
    return np.asarray(expr.eval(givens))


@pytest.fixture(scope="module")
def x():
    return at.matrix("x", dtype="float64")


@pytest.fixture(scope="module")
def i():
    return at.matrix("i", dtype="int64")


# --- arithmetic dunders incl. reflected ------------------------------------

@pytest.mark.parametrize(
    "build, ref",
    [
        (lambda x: x + 2.0, lambda m: m + 2.0),
        (lambda x: 2.0 + x, lambda m: 2.0 + m),
        (lambda x: x - 1.5, lambda m: m - 1.5),
        (lambda x: 1.5 - x, lambda m: 1.5 - m),
        (lambda x: x * 3.0, lambda m: m * 3.0),
        (lambda x: 3.0 * x, lambda m: 3.0 * m),
        (lambda x: x / 2.0, lambda m: m / 2.0),
        (lambda x: 2.0 / (x + 10.0), lambda m: 2.0 / (m + 10.0)),
        (lambda x: x // 2.0, lambda m: m // 2.0),
        (lambda x: 7.0 // (abs(x) + 1.0), lambda m: 7.0 // (np.abs(m) + 1.0)),
        (lambda x: x % 3.0, lambda m: m % 3.0),
        (lambda x: 5.0 % (abs(x) + 1.0), lambda m: 5.0 % (np.abs(m) + 1.0)),
        (lambda x: (abs(x) + 0.5) ** 1.5, lambda m: (np.abs(m) + 0.5) ** 1.5),
        (lambda x: 2.0 ** x, lambda m: 2.0 ** m),
        (lambda x: -x, lambda m: -m),
        (lambda x: abs(x), np.abs),
    ],
    ids=["add", "radd", "sub", "rsub", "mul", "rmul", "div", "rdiv",
         "floordiv", "rfloordiv", "mod", "rmod", "pow", "rpow", "neg", "abs"],
)
def test_arith_dunders(x, build, ref):
    np.testing.assert_allclose(ev(build(x), x=M), ref(M), rtol=1e-10)


def test_divmod(x):
    q, r = divmod(x, 3.0)
    np.testing.assert_allclose(ev(q, x=M), M // 3.0, rtol=1e-10)
    np.testing.assert_allclose(ev(r, x=M), M % 3.0, rtol=1e-10)


def test_matmul_dunder(x):
    y = at.matrix("y", dtype="float64")
    Mv, Nv = rng.normal(size=(3, 4)), rng.normal(size=(4, 2))
    np.testing.assert_allclose(
        np.asarray((x @ y).eval({x: Mv, y: Nv})), Mv @ Nv, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray((Mv @ y).eval({y: Nv})), Mv @ Nv, rtol=1e-10
    )


def test_bitwise_and_shifts(i):
    np.testing.assert_array_equal(ev(i & 3, i=I8), I8 & 3)
    np.testing.assert_array_equal(ev(i | 5, i=I8), I8 | 5)
    np.testing.assert_array_equal(ev(i ^ 6, i=I8), I8 ^ 6)
    np.testing.assert_array_equal(ev(~i, i=I8), ~I8)
    np.testing.assert_array_equal(ev(i << 2, i=I8), I8 << 2)
    np.testing.assert_array_equal(ev(i >> 1, i=I8), I8 >> 1)
    np.testing.assert_array_equal(ev(3 & i, i=I8), 3 & I8)
    np.testing.assert_array_equal(ev(5 | i, i=I8), 5 | I8)


def test_comparisons(x):
    np.testing.assert_array_equal(ev(x < 0.0, x=M), M < 0.0)
    np.testing.assert_array_equal(ev(x <= 0.1, x=M), M <= 0.1)
    np.testing.assert_array_equal(ev(x > -0.1, x=M), M > -0.1)
    np.testing.assert_array_equal(ev(x >= 0.0, x=M), M >= 0.0)


def test_bool_raises(x):
    with pytest.raises(TypeError):
        bool(x)


def test_iter_over_leading_dim():
    v = at.tensor("v", dtype="float64", shape=(3, 4))
    rows = list(v)
    assert len(rows) == 3
    np.testing.assert_allclose(np.asarray(rows[1].eval({v: M})), M[1],
                               rtol=1e-12)


# --- shape / layout methods -------------------------------------------------

def test_properties(x):
    assert x.ndim == 2
    assert x.dtype == "float64"
    s = ev(x.shape, x=M)
    np.testing.assert_array_equal(s, (3, 4))
    assert int(x.size.eval({x: M})) == 12


def test_transpose_family(x):
    np.testing.assert_allclose(ev(x.T, x=M), M.T, rtol=1e-12)
    np.testing.assert_allclose(ev(x.transpose(1, 0), x=M), M.T, rtol=1e-12)
    np.testing.assert_allclose(
        ev(x.dimshuffle(1, 0), x=M), M.T, rtol=1e-12
    )
    np.testing.assert_allclose(
        ev(x.dimshuffle("x", 0, 1), x=M), M[None], rtol=1e-12
    )


def test_reshape_flatten_squeeze(x):
    np.testing.assert_allclose(ev(x.reshape((4, 3)), x=M), M.reshape(4, 3))
    np.testing.assert_allclose(ev(x.reshape((2, -1)), x=M), M.reshape(2, -1))
    np.testing.assert_allclose(ev(x.flatten(), x=M), M.ravel())
    np.testing.assert_allclose(ev(x.ravel(), x=M), M.ravel())
    np.testing.assert_allclose(
        ev(x.dimshuffle(0, "x", 1).squeeze(axis=1), x=M), M
    )


def test_astype_copy_fill(x):
    assert x.astype("float32").dtype == "float32"
    np.testing.assert_allclose(ev(x.copy(), x=M), M)
    np.testing.assert_allclose(ev(x.fill(7.0), x=M), np.full_like(M, 7.0))


# --- reductions & scans over axes -------------------------------------------

@pytest.mark.parametrize("axis", [None, 0, 1, -1, (0, 1)])
@pytest.mark.parametrize("keepdims", [False, True])
def test_sum_axis_keepdims(x, axis, keepdims):
    np.testing.assert_allclose(
        ev(x.sum(axis=axis, keepdims=keepdims), x=M),
        M.sum(axis=axis, keepdims=keepdims), rtol=1e-10,
    )


@pytest.mark.parametrize(
    "meth, ref",
    [
        ("prod", np.prod), ("mean", np.mean), ("max", np.max),
        ("min", np.min),
    ],
)
@pytest.mark.parametrize("axis", [None, 0, 1])
def test_reduction_methods(x, meth, ref, axis):
    np.testing.assert_allclose(
        ev(getattr(x, meth)(axis=axis), x=P), ref(P, axis=axis), rtol=1e-10
    )


def test_var_std_ddof(x):
    np.testing.assert_allclose(ev(x.var(), x=M), M.var(), rtol=1e-10)
    np.testing.assert_allclose(ev(x.var(ddof=1), x=M), M.var(ddof=1),
                               rtol=1e-10)
    np.testing.assert_allclose(ev(x.std(axis=0), x=M), M.std(axis=0),
                               rtol=1e-10)


def test_argmin_argmax_all_any(x, i):
    np.testing.assert_array_equal(ev(x.argmax(), x=M), M.argmax())
    np.testing.assert_array_equal(ev(x.argmin(axis=1), x=M), M.argmin(axis=1))
    b = M > 0
    xb = at.matrix("xb", dtype="float64")
    np.testing.assert_array_equal(ev((xb > 0).all(axis=0), xb=M), b.all(axis=0))
    np.testing.assert_array_equal(ev((xb > 0).any(axis=1), xb=M), b.any(axis=1))


def test_cumsum_cumprod_trace(x):
    np.testing.assert_allclose(ev(x.cumsum(axis=1), x=M), M.cumsum(axis=1),
                               rtol=1e-10)
    np.testing.assert_allclose(ev(x.cumprod(axis=0), x=P), P.cumprod(axis=0),
                               rtol=1e-10)
    np.testing.assert_allclose(ev(x.trace(), x=M), M.trace(), rtol=1e-10)
    np.testing.assert_allclose(ev(x.diagonal(), x=M), M.diagonal(),
                               rtol=1e-12)


def test_norm(x):
    np.testing.assert_allclose(ev(x.norm(2), x=M),
                               np.sqrt((M ** 2).sum()), rtol=1e-10)
    np.testing.assert_allclose(ev(x.norm(1, axis=1), x=M),
                               np.abs(M).sum(axis=1), rtol=1e-10)


def test_sort_argsort_round_clip(x):
    np.testing.assert_allclose(ev(x.sort(axis=1), x=M), np.sort(M, axis=1))
    np.testing.assert_array_equal(ev(x.argsort(axis=1), x=M),
                                  np.argsort(M, axis=1))
    np.testing.assert_allclose(ev(x.clip(-0.5, 0.5), x=M),
                               np.clip(M, -0.5, 0.5))
    np.testing.assert_allclose(ev(x.round(), x=M), np.round(M))


def test_dot_take_repeat(x):
    np.testing.assert_allclose(
        np.asarray(x.dot(V).eval({x: M})), M @ V, rtol=1e-10
    )
    np.testing.assert_allclose(
        ev(x.take([0, 2], axis=0), x=M), M.take([0, 2], axis=0)
    )
    np.testing.assert_allclose(
        ev(x.repeat(2, axis=1), x=M), M.repeat(2, axis=1)
    )


def test_real_imag_conj(x):
    np.testing.assert_allclose(ev(x.real, x=M), M)
    np.testing.assert_allclose(ev(x.imag, x=M), np.zeros_like(M))
    np.testing.assert_allclose(ev(x.conj(), x=M), M)


def test_ndarray_left_operand_defers_to_variable(x):
    """ndarray OP variable must produce ONE symbolic node, not an object
    array of per-element graphs (__array_priority__, reference
    var.py:786)."""
    r = M + x
    assert isinstance(r, type(x))
    np.testing.assert_allclose(ev(r, x=M), 2 * M, rtol=1e-12)
    r2 = M * x
    assert isinstance(r2, type(x))
    np.testing.assert_allclose(ev(M - x, x=M), np.zeros_like(M))
    np.testing.assert_allclose(ev(P / (at.constant(P) * 0 + x), x=P),
                               np.ones_like(P), rtol=1e-10)


def test_getitem_forms(x):
    np.testing.assert_allclose(ev(x[1], x=M), M[1])
    np.testing.assert_allclose(ev(x[1:, ::2], x=M), M[1:, ::2])
    np.testing.assert_allclose(ev(x[-1, -2], x=M), M[-1, -2])
    np.testing.assert_allclose(ev(x[:, None, :], x=M), M[:, None, :])
    np.testing.assert_allclose(ev(x[[0, 2]], x=M), M[[0, 2]])
    np.testing.assert_allclose(ev(x[[0, 2], [1, 3]], x=M), M[[0, 2], [1, 3]])
