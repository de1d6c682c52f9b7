"""Degenerate-shape behavior corpus: zero-size dims and 0-d scalars.

The reference's ``tests/tensor/test_basic.py`` exercises empty arrays
throughout (join/stack/alloc/subtensor/reductions on size-0 inputs).
Every case here compiles the same graph under the XLA backend and the
py oracle and asserts they agree — and, where the semantics are
NumPy's, against a NumPy oracle too.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at

floatX = atp.config.floatX


def run_both(inputs, out, vals):
    f_jax = atp.function(inputs, out, mode="JAX")
    f_py = atp.function(inputs, out, mode="PY")
    r_jax = np.asarray(f_jax(*vals))
    r_py = np.asarray(f_py(*vals))
    assert r_jax.shape == r_py.shape, (r_jax.shape, r_py.shape)
    assert r_jax.dtype == r_py.dtype, (r_jax.dtype, r_py.dtype)
    np.testing.assert_allclose(r_jax, r_py, rtol=1e-6, atol=1e-6)
    return r_jax


def e(*shape):
    return np.zeros(shape, dtype=floatX)


# --- join / stack / concatenate -------------------------------------------------


def test_join_with_empty_operand():
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = at.join(0, x, y)
    res = run_both([x, y], out, [e(0, 3), np.ones((2, 3), floatX)])
    np.testing.assert_array_equal(res, np.ones((2, 3), floatX))


def test_join_all_empty():
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = at.join(0, x, y)
    res = run_both([x, y], out, [e(0, 4), e(0, 4)])
    assert res.shape == (0, 4)


def test_join_axis1_empty():
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = at.join(1, x, y)
    res = run_both([x, y], out, [e(2, 0), np.ones((2, 3), floatX)])
    np.testing.assert_array_equal(res, np.ones((2, 3), floatX))


def test_stack_of_empty_vectors():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    out = at.stack([x, y])
    res = run_both([x, y], out, [e(0), e(0)])
    assert res.shape == (2, 0)


# --- reductions -----------------------------------------------------------------


@pytest.mark.parametrize(
    "reducer,oracle",
    [(at.sum, np.sum), (at.prod, np.prod), (at.mean, np.mean)],
    ids=["sum", "prod", "mean"],
)
def test_reduce_empty_axis(reducer, oracle):
    x = at.matrix("x", dtype="float64")
    out = reducer(x, axis=0)
    val = e(0, 3)
    with np.errstate(all="ignore"):
        expect = oracle(val, axis=0)
    res = run_both([x], out, [val])
    np.testing.assert_array_equal(np.isnan(res), np.isnan(expect))
    np.testing.assert_allclose(np.nan_to_num(res), np.nan_to_num(expect))


def test_sum_all_of_empty_is_zero():
    x = at.tensor3("x", dtype="float64")
    res = run_both([x], at.sum(x), [e(2, 0, 3)])
    assert res == 0.0


def test_prod_all_of_empty_is_one():
    x = at.matrix("x", dtype="float64")
    res = run_both([x], at.prod(x), [e(3, 0)])
    assert res == 1.0


def test_cumsum_empty():
    x = at.vector("x", dtype="float64")
    res = run_both([x], at.extra_ops.cumsum(x), [e(0)])
    assert res.shape == (0,)


def test_all_any_empty():
    x = at.matrix("x", dtype="float64")
    res_all = run_both([x], at.all(x, axis=0), [e(0, 4)])
    res_any = run_both([x], at.any(x, axis=0), [e(0, 4)])
    np.testing.assert_array_equal(res_all, np.ones(4, bool))
    np.testing.assert_array_equal(res_any, np.zeros(4, bool))


# --- elemwise / broadcasting ------------------------------------------------------


def test_elemwise_on_empty():
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = at.exp(x) * y + 1.5
    res = run_both([x, y], out, [e(0, 5), e(0, 5)])
    assert res.shape == (0, 5)


def test_broadcast_row_against_empty():
    x = at.matrix("x", dtype="float64")
    r = at.row("r", dtype="float64")
    out = x + r
    res = run_both([x, r], out, [e(0, 3), np.ones((1, 3), floatX)])
    assert res.shape == (0, 3)


def test_zero_dim_scalar_ops():
    x = at.scalar("x", dtype="float64")
    out = at.switch(x > 0, at.exp(x), -x)
    res = run_both([x], out, [np.array(-2.0, floatX)])
    assert res == pytest.approx(2.0)


# --- dot / matmul ------------------------------------------------------------------


def test_dot_contraction_over_zero():
    a = at.matrix("a", dtype="float64")
    b = at.matrix("b", dtype="float64")
    out = at.dot(a, b)
    res = run_both([a, b], out, [e(3, 0), e(0, 4)])
    np.testing.assert_array_equal(res, np.zeros((3, 4), floatX))


def test_dot_empty_result():
    a = at.matrix("a", dtype="float64")
    b = at.matrix("b", dtype="float64")
    out = at.dot(a, b)
    res = run_both([a, b], out, [e(0, 2), np.ones((2, 4), floatX)])
    assert res.shape == (0, 4)


def test_outer_with_empty():
    a = at.vector("a", dtype="float64")
    b = at.vector("b", dtype="float64")
    out = at.outer(a, b)
    res = run_both([a, b], out, [e(0), np.ones(3, floatX)])
    assert res.shape == (0, 3)


# --- subtensor ----------------------------------------------------------------------


def test_empty_slice_of_nonempty():
    x = at.matrix("x", dtype="float64")
    out = x[2:2]
    res = run_both([x], out, [np.ones((4, 3), floatX)])
    assert res.shape == (0, 3)


def test_slice_of_empty():
    x = at.matrix("x", dtype="float64")
    out = x[:, 1:3]
    res = run_both([x], out, [e(0, 5)])
    assert res.shape == (0, 2)


def test_advanced_index_with_empty_indices():
    x = at.matrix("x", dtype="float64")
    i = at.lvector("i")
    out = x[i]
    res = run_both([x, i], out, [np.ones((4, 3), floatX), np.zeros(0, "int64")])
    assert res.shape == (0, 3)


def test_set_subtensor_empty_slice_is_noop():
    x = at.matrix("x", dtype="float64")
    out = at.subtensor.set_subtensor(x[1:1], 0.0)
    val = np.arange(12, dtype=floatX).reshape(4, 3)
    res = run_both([x], out, [val])
    np.testing.assert_array_equal(res, val)


def test_inc_subtensor_with_empty_update():
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = at.subtensor.inc_subtensor(x[0:0], y)
    val = np.arange(6, dtype=floatX).reshape(2, 3)
    res = run_both([x, y], out, [val, e(0, 3)])
    np.testing.assert_array_equal(res, val)


def test_boolean_mask_all_false_py_mode():
    # dynamic output shape: py-oracle path only
    x = at.vector("x", dtype="float64")
    mask = np.zeros(4, bool)
    out = x[at.as_tensor(mask)]
    f = atp.function([x], out, mode="PY")
    assert f(np.ones(4, floatX)).shape == (0,)


# --- constructors ----------------------------------------------------------------------


def test_alloc_zero_sized():
    out = at.alloc(np.asarray(2.5, floatX), 0, 3)
    res = run_both([], out, [])
    assert res.shape == (0, 3)


def test_zeros_ones_empty():
    res_z = run_both([], at.zeros((0, 2)), [])
    res_o = run_both([], at.ones((2, 0)), [])
    assert res_z.shape == (0, 2) and res_o.shape == (2, 0)


def test_eye_zero():
    out = at.eye(0)
    res = run_both([], out, [])
    assert res.shape == (0, 0)


def test_arange_empty():
    out = at.arange(5, 5)
    res = run_both([], out, [])
    assert res.shape == (0,)


def test_arange_negative_step_empty():
    out = at.arange(2, 5, -1)
    res = run_both([], out, [])
    assert res.shape == (0,)


# --- reshape / dimshuffle / repeat -------------------------------------------------------


def test_reshape_empty():
    x = at.matrix("x", dtype="float64")
    out = x.reshape((0, 6))
    res = run_both([x], out, [e(2, 0)])
    assert res.shape == (0, 6)


def test_flatten_empty():
    x = at.tensor3("x", dtype="float64")
    res = run_both([x], x.flatten(), [e(2, 0, 3)])
    assert res.shape == (0,)


def test_dimshuffle_empty():
    x = at.matrix("x", dtype="float64")
    res = run_both([x], x.T, [e(0, 4)])
    assert res.shape == (4, 0)


def test_repeat_zero_times():
    x = at.vector("x", dtype="float64")
    out = at.extra_ops.repeat(x, 0, axis=0)
    res = run_both([x], out, [np.ones(3, floatX)])
    assert res.shape == (0,)


def test_tile_zero_reps():
    x = at.vector("x", dtype="float64")
    out = at.tile(x, (0,))
    res = run_both([x], out, [np.ones(3, floatX)])
    assert res.shape == (0,)


@pytest.mark.parametrize("reps", [(0,), (2, 0), (0, 3), (2, 3)], ids=str)
def test_tile_matches_numpy(reps):
    x = at.matrix("x", dtype="float64")
    out = at.tile(x, reps)
    val = np.arange(6, dtype=floatX).reshape(2, 3)
    res = run_both([x], out, [val])
    np.testing.assert_array_equal(res, np.tile(val, reps))


# --- sort / search ------------------------------------------------------------------------


def test_sort_argsort_empty():
    x = at.vector("x", dtype="float64")
    res_s = run_both([x], at.sort(x), [e(0)])
    res_a = run_both([x], at.argsort(x), [e(0)])
    assert res_s.shape == (0,) and res_a.shape == (0,)


# --- gradients through empties ---------------------------------------------------------------


def test_grad_through_empty_slice():
    x = at.matrix("x", dtype="float64")
    loss = at.sum(x[0:0] * 2.0) + at.sum(x)
    g = atp.grad(loss, x)
    res = run_both([x], g, [np.ones((3, 2), floatX)])
    np.testing.assert_array_equal(res, np.ones((3, 2), floatX))


def test_grad_of_empty_reduction():
    x = at.matrix("x", dtype="float64")
    loss = at.sum(at.exp(x))
    g = atp.grad(loss, x)
    res = run_both([x], g, [e(0, 3)])
    assert res.shape == (0, 3)


def test_grad_through_join_with_empty():
    x = at.matrix("x", dtype="float64")
    y = at.matrix("y", dtype="float64")
    loss = at.sum(at.join(0, x, y) ** 2)
    gx = atp.grad(loss, x)
    res = run_both([x, y], gx, [e(0, 3), np.full((2, 3), 2.0, floatX)])
    assert res.shape == (0, 3)
