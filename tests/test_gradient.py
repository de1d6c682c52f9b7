"""Autodiff engine tests: grad/Lop/Rop semantics, disconnected handling,
grad-manipulation ops (mirrors ``tests/test_gradient.py`` strategy)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import (
    DisconnectedType,
    Lop,
    NullTypeGradError,
    Rop,
    disconnected_grad,
    grad,
    grad_clip,
    grad_scale,
    verify_grad,
    zero_grad,
)

rng = np.random.default_rng(11)


def test_grad_simple():
    x = at.vector("x", dtype="float64")
    g = grad((x ** 2).sum(), x)
    f = function([x], g)
    v = rng.normal(size=5)
    np.testing.assert_allclose(f(v), 2 * v)


def test_grad_requires_scalar_cost():
    x = at.vector("x", dtype="float64")
    with pytest.raises(TypeError):
        grad(x, x)


def test_grad_disconnected_raise_and_zero():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    cost = x.sum()
    with pytest.raises(ValueError):
        grad(cost, y)
    gz = grad(cost, y, disconnected_inputs="ignore")
    f = function([x, y], gz, on_unused_input="ignore")
    np.testing.assert_allclose(f(np.ones(3), np.ones(3)), 0.0)


def test_known_grads():
    x = at.vector("x", dtype="float64")
    y = x * 2.0
    g = grad(None, x, known_grads={y: at.ones_like(y)})
    f = function([x], g)
    np.testing.assert_allclose(f(np.zeros(4)), 2.0)


def test_consider_constant():
    x = at.vector("x", dtype="float64")
    y = x * 3.0
    g = grad((y * x).sum(), x, consider_constant=[y])
    f = function([x], g)
    v = rng.normal(size=4)
    np.testing.assert_allclose(f(v), 3.0 * v)  # y treated as constant


def test_chain_through_multiple_paths():
    x = at.scalar("x", dtype="float64")
    cost = x * x + at.exp(x) * x
    g = grad(cost, x)
    f = function([x], g)
    v = 0.7
    expected = 2 * v + np.exp(v) * (1 + v)
    assert np.isclose(f(v), expected)


def test_Lop():
    x = at.vector("x", dtype="float64")
    y = x ** 3
    v = at.vector("v", dtype="float64")
    lop = Lop(y, x, v)
    f = function([x, v], lop)
    xv, vv = rng.normal(size=4), rng.normal(size=4)
    np.testing.assert_allclose(f(xv, vv), 3 * xv ** 2 * vv)


def test_Rop():
    x = at.vector("x", dtype="float64")
    y = x ** 3
    v = at.vector("v", dtype="float64")
    rop = Rop(y, x, v)
    f = function([x, v], rop)
    xv, vv = rng.normal(size=4), rng.normal(size=4)
    np.testing.assert_allclose(f(xv, vv), 3 * xv ** 2 * vv)


def test_Rop_dot():
    W = at.matrix("W", dtype="float64")
    x = at.vector("x", dtype="float64")
    v = at.vector("v", dtype="float64")
    y = at.dot(W, x)
    rop = Rop(y, x, v)
    f = function([W, x, v], rop)
    Wv = rng.normal(size=(3, 4))
    xv, vv = rng.normal(size=4), rng.normal(size=4)
    np.testing.assert_allclose(f(Wv, xv, vv), Wv @ vv)


def test_zero_grad():
    x = at.scalar("x", dtype="float64")
    cost = (zero_grad(x) * x)
    g = grad(cost, x)
    f = function([x], g)
    # d/dx [stop(x) * x] = stop(x)
    assert np.isclose(f(3.0), 3.0)


def test_disconnected_grad():
    x = at.scalar("x", dtype="float64")
    cost = disconnected_grad(x) * x
    g = grad(cost, x, disconnected_inputs="ignore")
    f = function([x], g)
    assert np.isclose(f(3.0), 3.0)


def test_grad_clip_and_scale():
    x = at.scalar("x", dtype="float64")
    g1 = grad(grad_clip(x ** 2, -0.1, 0.1), x)
    g2 = grad(grad_scale(x ** 2, 0.5), x)
    f = function([x], [g1, g2])
    r1, r2 = f(2.0)
    assert np.isclose(r1, 0.4)  # clip(1, ±0.1) * 2x = 0.1 * 4
    assert np.isclose(r2, 2.0)  # 0.5 * 4


def test_undefined_grad_raises():
    x = at.vector("x", dtype="float64")
    # argmax has no gradient
    with pytest.raises((NullTypeGradError, TypeError, ValueError)):
        grad(at.math.argmax(x).astype("float64") ** 1.0, x)


def test_verify_grad_catches_wrong_grad():
    from aesara_tpu.gradient import GradientError
    from aesara_tpu.graph.op import Op
    from aesara_tpu.graph.ir import Apply

    class BadGradOp(Op):
        __props__ = ()

        def make_node(self, x):
            x = at.as_tensor_variable(x)
            return Apply(self, [x], [x.type()])

        def perform(self, node, inputs, out):
            out[0][0] = inputs[0] * 2

        def grad(self, inputs, gz):
            return [gz[0] * 3.0]  # wrong: should be 2

    with pytest.raises(GradientError):
        verify_grad(lambda x: BadGradOp()(x).sum(), [rng.normal(size=3)], mode="PY")


def test_jacobian():
    pytest.importorskip("aesara_tpu.scan.basic", reason="scan not built yet")
    from aesara_tpu.gradient import jacobian

    x = at.vector("x", dtype="float64")
    J = jacobian(x ** 2, x)
    f = function([x], J)
    v = rng.normal(size=4)
    np.testing.assert_allclose(f(v), np.diag(2 * v))


def test_dimshuffle_grad_sums_augmented_dims():
    """Grad through a scalar→tensor broadcast where the cotangent's
    static shape is unknown: the 'x' dims must be summed, not dropped."""
    import numpy as np

    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.tensor.elemwise import DimShuffle

    c = at.scalar("c", dtype="float64")
    padded = DimShuffle(0, ("x", "x"))(c)      # () → (1, 1)
    x = at.matrix("x", dtype="float64")
    out = (padded * x).sum()
    g = atp.grad(out, c)
    f = atp.function([c, x], g, mode="PY")
    xv = np.arange(6.0).reshape(2, 3)
    assert np.allclose(f(2.0, xv), xv.sum())


def test_numeric_grad_max_err_contract():
    """max_err honors tolerances and returns the reference's aggregated
    (max_arg, max_pos, abs_err, rel_err) shape (ref gradient.py:1556)."""
    from aesara_tpu.gradient import numeric_grad

    def f(a, b):
        return (a ** 2).sum() + (3.0 * b).sum()

    pt = [np.array([1.0, 2.0]), np.array([0.5])]
    ng = numeric_grad(f, pt)
    # exact analytic grads -> tiny errors
    good = [np.array([2.0, 4.0]), np.array([3.0])]
    max_arg, max_pos, abs_err, rel_err = ng.max_err(good, 1e-5, 1e-5)
    assert min(abs_err / 1e-5, rel_err / 1e-5) < 1.0
    # corrupt one element of arg 0 -> it must be flagged, scaled > 1
    bad = [np.array([2.0, 9.0]), np.array([3.0])]
    max_arg, max_pos, abs_err, rel_err = ng.max_err(bad, 1e-5, 1e-5)
    assert max_arg == 0 and max_pos == 1
    assert abs_err > 1.0 and rel_err > 0.1
    with pytest.raises(ValueError):
        ng.max_err([good[0]], 1e-5, 1e-5)


class TestOpLevelRop:
    """``Rop(..., use_op_rop=True)`` — the reference's per-op forward-mode
    traversal (ref ``gradient.py:160`` Rop / ``scan/op.py:3131`` Scan.R_op)
    must agree with the default double-backward construction."""

    def _agree(self, out, wrt, ins, vals):
        import aesara_tpu as atp

        v = [w.type() for w in ([wrt] if not isinstance(wrt, list) else wrt)]
        wrts = [wrt] if not isinstance(wrt, list) else wrt
        r1 = Rop(out, wrts if len(wrts) > 1 else wrts[0],
                 v if len(v) > 1 else v[0])
        r2 = Rop(out, wrts if len(wrts) > 1 else wrts[0],
                 v if len(v) > 1 else v[0], use_op_rop=True)
        f = atp.function(ins + v, [r1, r2])
        tangents = [np.random.default_rng(0).standard_normal(np.shape(x))
                    for x in vals[: len(v)]]
        a, b = f(*(list(vals) + tangents))
        assert np.allclose(a, b, rtol=1e-5, atol=1e-6), (a, b)

    def test_elemwise_chain(self):
        x = at.vector("x", dtype="float64")
        y = (at.tanh(x) * 2.0 + x ** 2).sum()
        self._agree(y, x, [x], [np.linspace(-1, 1, 7)])

    def test_subtensor_join(self):
        x = at.vector("x", dtype="float64")
        y = at.join(0, x[1:], x[:2]).sum() + x[0] * 3.0
        self._agree(y, x, [x], [np.arange(5.0)])

    def test_inc_subtensor(self):
        from aesara_tpu.tensor.subtensor import set_subtensor

        x = at.vector("x", dtype="float64")
        y = set_subtensor(x[1:3], x[0:2] * 2.0).sum()
        self._agree(y, x, [x], [np.arange(5.0)])

    def test_through_scan_sitsot(self):
        from aesara_tpu.scan import scan

        s = at.vector("s", dtype="float64")
        outs, _ = scan(
            fn=lambda a, acc: acc * at.tanh(a),
            sequences=[s],
            outputs_info=[at.as_tensor_variable(np.float64(1.0))],
        )
        self._agree(outs[-1], s, [s], [np.linspace(0.2, 1.0, 5)])

    def test_through_scan_nitsot(self):
        from aesara_tpu.scan import scan

        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: a * a + 1.0, sequences=[s])
        self._agree(outs.sum(), s, [s], [np.linspace(-1, 1, 4)])

    def test_unimplemented_raises(self):
        from aesara_tpu.tensor.sort import argsort

        x = at.vector("x", dtype="float64")
        y = argsort(x)  # integer output; sort path has no R_op rule
        with pytest.raises(NotImplementedError):
            Rop(x[argsort(x)].sum(), x, x.type(), use_op_rop=True)

    def test_dot_and_dimshuffle(self):
        x = at.matrix("x", dtype="float64")
        w = at.matrix("w", dtype="float64")
        y = at.dot(x, w.T).sum()
        import aesara_tpu as atp

        vx, vw = at.matrix("vx", dtype="float64"), at.matrix("vw", dtype="float64")
        r1 = Rop(y, [x, w], [vx, vw])
        r2 = Rop(y, [x, w], [vx, vw], use_op_rop=True)
        f = atp.function([x, w, vx, vw], [r1, r2])
        rng = np.random.default_rng(1)
        args = [rng.standard_normal((3, 4)).astype("float32") for _ in range(4)]
        a, b = f(*args)
        assert np.allclose(a, b, rtol=1e-5)

    def test_disconnected_output_policy(self):
        x = at.vector("x", dtype="float64")
        z = at.vector("z", dtype="float64")
        with pytest.raises(Exception):
            Rop(z.sum(), x, x.type(), use_op_rop=True,
                disconnected_outputs="raise")
        r = Rop(z.sum(), x, x.type(), use_op_rop=True,
                disconnected_outputs="ignore")
        assert r is not None
