"""Gradient-layer behavior corpus.

Behavior specs mirroring the reference gradient suite's intents
(``/root/reference/tests/test_gradient.py``): duplicate/integer inputs,
disconnected policies, second-order derivatives, known_grads edge cases,
subgraph_grad, the grad-manipulator ops (zero/disconnected/undefined
grad, clip, scale), and jacobian/hessian shape contracts.  Written
fresh against this framework's API.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu import gradient

floatX = atp.config.floatX


def val(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=shape).astype(floatX) if shape else np.asarray(
        rng.normal(), dtype=floatX
    )


def ev(expr, givens):
    return np.asarray(expr.eval(givens))


# --- basic contracts -------------------------------------------------------------


def test_dxdx_is_one():
    x = at.scalar("x")
    g = atp.grad(x, x)
    assert ev(g, {x: val()}) == pytest.approx(1.0)


def test_grad_duplicate_input():
    # cost uses x twice; grad accumulates both paths: d(x*x)/dx = 2x
    x = at.scalar("x")
    g = atp.grad(x * x, x)
    assert ev(g, {x: np.asarray(3.0, floatX)}) == pytest.approx(6.0)


def test_grad_wrt_list_preserves_order():
    x, y = at.scalar("x"), at.scalar("y")
    gx, gy = atp.grad(2 * x + 3 * y, [x, y])
    assert ev(gx, {x: val(), y: val()}) == pytest.approx(2.0)
    assert ev(gy, {x: val(), y: val()}) == pytest.approx(3.0)


def test_grad_name_attached():
    x = at.scalar("x")
    g = atp.grad(x**2, x)
    # grad returns a variable whose graph evaluates correctly; name is
    # cosmetic but the reference attaches one mentioning the cost
    assert g.eval({x: np.asarray(2.0, floatX)}) == pytest.approx(4.0)


def test_second_order_quadratic_and_cubic():
    x = at.scalar("x")
    g1 = atp.grad(x**3, x)
    g2 = atp.grad(g1, x)
    xv = np.asarray(2.0, floatX)
    assert ev(g1, {x: xv}) == pytest.approx(12.0)
    assert ev(g2, {x: xv}) == pytest.approx(12.0)  # 6x


def test_second_order_vector():
    x = at.vector("x")
    cost = at.sum(x**2)
    g1 = atp.grad(cost, x)
    g2 = atp.grad(at.sum(g1), x)
    xv = val(4)
    np.testing.assert_allclose(ev(g2, {x: xv}), 2 * np.ones(4), rtol=1e-6)


def test_grad_zero_gradient_has_input_shape():
    x = at.matrix("x")
    y = at.scalar("y")
    g = atp.grad(at.sum(x), y, disconnected_inputs="ignore")
    assert ev(g, {x: val(2, 3), y: val()}).shape == ()


# --- integer / dtype policies ------------------------------------------------------


def test_grad_wrt_integer_input_is_disconnected_policy():
    i = at.lscalar("i")
    x = at.vector("x")
    cost = at.sum(x) * at.cast(i, floatX)
    # integer inputs carry no gradient; framework must not crash and
    # must honor the disconnected_inputs policy for them
    g = atp.grad(cost, i, disconnected_inputs="ignore", return_disconnected="zero")
    res = ev(g, {x: val(3), i: np.asarray(2, "int64")})
    assert res == 0


def test_grad_of_cast_chain():
    x = at.vector("x")
    cost = at.sum(at.cast(at.cast(x, "float64"), floatX) * 2.0)
    g = atp.grad(cost, x)
    np.testing.assert_allclose(ev(g, {x: val(3)}), 2 * np.ones(3), rtol=1e-6)


# --- disconnected policies ------------------------------------------------------------


def test_disconnected_raise_warn_ignore():
    x = at.scalar("x")
    y = at.scalar("y")
    cost = x * 2
    with pytest.raises(Exception):
        atp.grad(cost, y, disconnected_inputs="raise")
    with pytest.warns(UserWarning):
        g = atp.grad(cost, y, disconnected_inputs="warn")
    assert ev(g, {y: val()}) == 0
    g2 = atp.grad(cost, y, disconnected_inputs="ignore")
    assert ev(g2, {y: val()}) == 0


def test_return_disconnected_none():
    x, y = at.scalar("x"), at.scalar("y")
    res = atp.grad(
        x * 2, [x, y], disconnected_inputs="ignore", return_disconnected="none"
    )
    assert res[1] is None
    assert ev(res[0], {x: val()}) == pytest.approx(2.0)


# --- known_grads ------------------------------------------------------------------------


def test_known_grads_override():
    x = at.scalar("x")
    mid = x * 3
    cost = mid * 5
    # overriding d(cost)/d(mid) short-circuits the true chain
    g = atp.grad(
        cost=None, wrt=x, known_grads={mid: at.as_tensor(np.asarray(7.0, floatX))}
    )
    assert ev(g, {x: val()}) == pytest.approx(21.0)


def test_known_grads_multiple_sources_accumulate():
    x = at.scalar("x")
    a = x * 2
    b = x * 3
    one = at.as_tensor(np.asarray(1.0, floatX))
    g = atp.grad(cost=None, wrt=x, known_grads={a: one, b: one})
    assert ev(g, {x: val()}) == pytest.approx(5.0)


def test_known_grads_plus_cost():
    x = at.scalar("x")
    mid = x * 2
    g = atp.grad(
        cost=x * 4, wrt=x,
        known_grads={mid: at.as_tensor(np.asarray(1.0, floatX))},
    )
    # d(x*4)/dx + 1 * d(2x)/dx = 4 + 2
    assert ev(g, {x: val()}) == pytest.approx(6.0)


# --- subgraph_grad -----------------------------------------------------------------------


def test_subgraph_grad_two_stage_chain_rule():
    # successive subgraph_grads over a two-layer net must reproduce the
    # single full grad (the reference's test_subgraph_grad scenario)
    x = at.vector("x")
    t = at.vector("t")
    w1 = atp.shared(val(3, 4, seed=11), name="w1")
    w2 = atp.shared(val(4, 2, seed=12), name="w2")
    a1 = at.tanh(at.dot(x, w1))
    a2 = at.tanh(at.dot(a1, w2))
    cost2 = at.sum((a2 - t) ** 2) + at.sum(w2) ** 2
    cost1 = at.sum(w1) ** 2

    true_g2, true_g1 = atp.grad(cost1 + cost2, [w2, w1])

    params = [[w2], [w1]]
    costs = [cost2, cost1]
    ends = [[a1], [x]]
    next_grad = None
    param_grads = []
    for i in range(2):
        pgrad, end_grads = gradient.subgraph_grad(
            wrt=params[i], end=ends[i], start=next_grad, cost=costs[i]
        )
        next_grad = dict(zip(ends[i], end_grads))
        param_grads.extend(pgrad)

    xv, tv = val(3, seed=13), val(2, seed=14)
    np.testing.assert_allclose(
        ev(param_grads[0], {x: xv, t: tv}), ev(true_g2, {x: xv, t: tv}),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        ev(param_grads[1], {x: xv, t: tv}), ev(true_g1, {x: xv, t: tv}),
        rtol=1e-4,
    )


# --- grad manipulator ops ----------------------------------------------------------------


def test_zero_grad_forward_identity_backward_zero():
    x = at.vector("x")
    out = gradient.zero_grad(x) * 2
    xv = val(3)
    np.testing.assert_allclose(ev(out, {x: xv}), 2 * xv, rtol=1e-6)
    g = atp.grad(at.sum(out), x, disconnected_inputs="ignore",
                 return_disconnected="zero")
    np.testing.assert_allclose(ev(g, {x: xv}), np.zeros(3), atol=0)


def test_disconnected_grad_policy_interaction():
    x = at.vector("x")
    cost = at.sum(gradient.disconnected_grad(x) * 3)
    # the path is severed: behaves exactly like a disconnected input
    with pytest.raises(Exception):
        atp.grad(cost, x, disconnected_inputs="raise")
    g = atp.grad(cost, x, disconnected_inputs="ignore")
    np.testing.assert_allclose(ev(g, {x: val(3)}), np.zeros(3), atol=0)


def test_undefined_grad_raises_only_when_used():
    x = at.vector("x")
    out = gradient.undefined_grad(x)
    # forward works
    xv = val(3)
    np.testing.assert_allclose(ev(out, {x: xv}), xv, rtol=1e-6)
    with pytest.raises(Exception):
        atp.grad(at.sum(out), x)


def test_grad_clip_bounds_gradient_not_value():
    x = at.scalar("x")
    out = gradient.grad_clip(x, -0.1, 0.1) ** 2
    xv = np.asarray(3.0, floatX)
    assert ev(out, {x: xv}) == pytest.approx(9.0)
    g = atp.grad(out, x)
    assert ev(g, {x: xv}) == pytest.approx(0.1)  # clipped from 6.0


def test_grad_scale_scales_gradient_only():
    x = at.scalar("x")
    out = gradient.grad_scale(x, 0.5) ** 2
    xv = np.asarray(3.0, floatX)
    assert ev(out, {x: xv}) == pytest.approx(9.0)
    g = atp.grad(out, x)
    assert ev(g, {x: xv}) == pytest.approx(3.0)  # 6.0 * 0.5


def test_consider_constant_blocks_path():
    x = at.vector("x")
    w = at.vector("w")
    cost = at.sum(x * w)
    g = atp.grad(cost, x, consider_constant=[w])
    xv, wv = val(3, seed=1), val(3, seed=2)
    np.testing.assert_allclose(ev(g, {x: xv, w: wv}), wv, rtol=1e-6)
    # blocking x itself zeroes its own gradient path through x*w
    g2 = atp.grad(cost + at.sum(x), x, consider_constant=[cost])
    np.testing.assert_allclose(ev(g2, {x: xv, w: wv}), np.ones(3), rtol=1e-6)


# --- jacobian / hessian shape contracts --------------------------------------------------------


def test_jacobian_vector_expression():
    x = at.vector("x")
    J = gradient.jacobian(x**2, x)
    xv = val(4)
    np.testing.assert_allclose(ev(J, {x: xv}), np.diag(2 * xv), rtol=1e-5)


def test_jacobian_scalar_expression():
    x = at.scalar("x")
    J = gradient.jacobian(x**3, x)
    assert ev(J, {x: np.asarray(2.0, floatX)}) == pytest.approx(12.0)


def test_jacobian_multiple_wrt_returns_list():
    x, y = at.vector("x"), at.vector("y")
    Js = gradient.jacobian(x * y, [x, y])
    xv, yv = val(3, seed=3), val(3, seed=4)
    np.testing.assert_allclose(ev(Js[0], {x: xv, y: yv}), np.diag(yv), rtol=1e-5)
    np.testing.assert_allclose(ev(Js[1], {x: xv, y: yv}), np.diag(xv), rtol=1e-5)


def test_jacobian_disconnected_inputs_policy():
    x = at.vector("x")
    y = at.vector("y")
    J = gradient.jacobian(x * 2, y, disconnected_inputs="ignore")
    res = ev(J, {x: val(3), y: val(4)})
    assert res.shape == (3, 4)
    np.testing.assert_array_equal(res, np.zeros((3, 4)))


def test_hessian_quadratic_form():
    x = at.vector("x")
    A = np.asarray([[2.0, 1.0], [1.0, 4.0]], floatX)
    cost = 0.5 * at.dot(x, at.dot(at.as_tensor(A), x))
    H = gradient.hessian(cost, x)
    np.testing.assert_allclose(ev(H, {x: val(2)}), A, rtol=1e-5)


def test_hessian_requires_scalar_cost():
    x = at.vector("x")
    with pytest.raises(Exception):
        gradient.hessian(x * 2, x)


# --- Rop/Lop extra contracts ----------------------------------------------------------------


def test_lop_matches_grad_for_scalar_cost():
    x = at.vector("x")
    cost = at.sum(x**2)
    lop = gradient.Lop(cost, x, at.as_tensor(np.asarray(1.0, floatX)))
    g = atp.grad(cost, x)
    xv = val(3)
    np.testing.assert_allclose(ev(lop, {x: xv}), ev(g, {x: xv}), rtol=1e-6)


def test_rop_linearity_in_tangent():
    x = at.vector("x")
    v = at.vector("v")
    out = at.sum(at.exp(x) * x)
    r1 = gradient.Rop(out, x, v)
    xv, vv = val(3, seed=5), val(3, seed=6)
    expect = np.sum((np.exp(xv) * xv + np.exp(xv)) * vv)
    assert ev(r1, {x: xv, v: vv}) == pytest.approx(expect, rel=1e-4)
    # 2v tangent doubles the JVP
    r2 = gradient.Rop(out, x, 2 * v)
    assert ev(r2, {x: xv, v: vv}) == pytest.approx(2 * expect, rel=1e-4)


def test_rop_broadcast_operand_use_op_rop():
    # regression for the round-2 advisor finding: broadcast inputs must
    # not scale the JVP by the broadcast count
    b = at.row("b")
    y = at.matrix("y")
    out = b + y
    vb = at.row("vb")
    r = gradient.Rop(out, b, vb, use_op_rop=True)
    bv = np.ones((1, 3), floatX)
    yv = np.zeros((4, 3), floatX)
    vbv = np.ones((1, 3), floatX)
    res = ev(r, {b: bv, y: yv, vb: vbv})
    np.testing.assert_allclose(res, np.ones((4, 3)), rtol=1e-6)
