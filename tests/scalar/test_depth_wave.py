"""Scalar-layer depth wave (reference ``tests/scalar/test_basic.py`` +
``test_math.py`` + ``test_type.py``): the upgrade-to-float dtype grids,
the zero-not-undefined gradient contracts of comparisons/InRange, grads
through discrete dtypes, Composite nesting/constants/arity, and the
special-function NaN contracts — the reference cases the first scalar
corpus (``test_ops.py``) did not cover."""

import math

import numpy as np
import pytest
import scipy.special as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.config import config
from aesara_tpu.gradient import NullTypeGradError
from aesara_tpu.scalar import ops as s
from aesara_tpu.scalar.composite import Composite, Compositef32
from aesara_tpu.scalar.ops import InRange, ScalarType

rng = np.random.default_rng(5151)


# ---------------------------------------------------------------------------
# upgrade-to-float: discrete inputs promote to floatX, never float16
# (reference TestUpgradeToFloat, tests/scalar/test_basic.py:286 — there
# int8 must give "at least float32"; the TPU-native policy maps ALL
# integer widths to floatX, pinned in scalar/ops.py::upgrade_to_float)
# ---------------------------------------------------------------------------

UNARY_FLOAT_OPS = [
    # (tensor-level fn, valid int sample range)
    (tm.reciprocal, list(range(-20, 0)) + list(range(1, 21))),
    (tm.sqrt, list(range(0, 40))),
    (tm.log, list(range(1, 40))),
    (tm.log2, list(range(1, 40))),
    (tm.log10, list(range(1, 40))),
    (tm.log1p, list(range(0, 40))),
    (tm.exp, list(range(-40, 30))),
    (tm.exp2, list(range(-40, 30))),
    (tm.expm1, list(range(-40, 30))),
    (tm.deg2rad, list(range(-40, 40))),
    (tm.rad2deg, list(range(-40, 40))),
    (tm.cos, list(range(-40, 40))),
    (tm.arccos, [-1, 0, 1]),
    (tm.cosh, list(range(-20, 20))),
    (tm.arccosh, list(range(1, 40))),
    (tm.sin, list(range(-40, 40))),
    (tm.arcsin, [-1, 0, 1]),
    (tm.sinh, list(range(-20, 20))),
    (tm.arcsinh, list(range(-40, 40))),
    (tm.tan, list(range(-1, 2))),
    (tm.arctan, list(range(-40, 40))),
    (tm.tanh, list(range(-40, 40))),
    (tm.arctanh, [0]),
]


@pytest.mark.parametrize(
    "fn,vals", UNARY_FLOAT_OPS, ids=lambda c: getattr(c, "__name__", "")
)
def test_unary_int8_upgrades_and_matches_float32(fn, vals):
    xi = at.vector("xi", dtype="int8")
    xf = at.vector("xf", dtype="float32")
    fi = function([xi], fn(xi), mode="PY")
    ff = function([xf], fn(xf), mode="PY")
    data = np.asarray(vals, dtype="int8")
    outi = np.asarray(fi(data))
    outf = np.asarray(ff(data.astype("float32")))
    assert outi.dtype == outf.dtype, fn
    assert outi.dtype != np.float16, "int8 must not promote to float16"
    np.testing.assert_allclose(outi, outf, rtol=1e-6)


@pytest.mark.parametrize("fn", [tm.exp, tm.log1p, tm.tanh, tm.arctan])
def test_unary_int8_upgrade_on_xla(fn):
    xi = at.vector("xi", dtype="int8")
    f = function([xi], fn(xi), mode="FAST_RUN")
    data = np.asarray(list(range(0, 20)), dtype="int8")
    got = np.asarray(f(data))
    assert str(got.dtype) == config.floatX
    np.testing.assert_allclose(
        got, np.asarray(function([xi], fn(xi), mode="PY")(data)), rtol=1e-6
    )


def test_arctan2_int8_matches_float32():
    xi, yi = at.vector("xi", dtype="int8"), at.vector("yi", dtype="int8")
    xf, yf = at.vector("xf", dtype="float32"), at.vector("yf", dtype="float32")
    fi = function([xi, yi], tm.arctan2(xi, yi), mode="PY")
    ff = function([xf, yf], tm.arctan2(xf, yf), mode="PY")
    a = rng.integers(-100, 100, size=64).astype("int8")
    b = rng.integers(-100, 100, size=64).astype("int8")
    outi, outf = np.asarray(fi(a, b)), np.asarray(
        ff(a.astype("float32"), b.astype("float32")))
    assert outi.dtype == outf.dtype
    np.testing.assert_allclose(outi, outf, rtol=1e-6)


def test_true_div_int8_grid():
    """true_div's upcast is the general int→float policy (reference
    test_true_divide): int8/int8 must equal the float computation."""
    xi, yi = at.vector("xi", dtype="int8"), at.vector("yi", dtype="int8")
    f = function([xi, yi], tm.true_div(xi, yi), mode="PY")
    a = rng.integers(-100, 100, size=128).astype("int8")
    b = np.where(
        (r := rng.integers(-100, 100, size=128)) == 0, 1, r).astype("int8")
    got = np.asarray(f(a, b))
    assert str(got.dtype) == config.floatX
    np.testing.assert_allclose(
        got, a.astype(config.floatX) / b.astype(config.floatX), rtol=1e-6)


def test_mod_complex_fails():
    """% on complex raises at graph build (reference test_mod_complex_fail)."""
    zc = at.scalar("zc", dtype="complex64")
    ii = at.scalar("ii", dtype="int32")
    with pytest.raises(TypeError):
        zc % ii


# ---------------------------------------------------------------------------
# gradient contracts: comparisons and InRange are zero, NOT undefined
# (reference LogicalComparison.L_op scalar/basic.py:1304, InRange:1554,
# tests test_grad_gt/test_grad_switch/test_grad_identity/test_grad_inrange)
# ---------------------------------------------------------------------------

class TestZeroGrads:
    def test_grad_gt_is_zero(self):
        x = at.scalar("x", dtype="float32")
        y = at.scalar("y", dtype="float32")
        g = atp.grad(x > y, y)
        assert float(np.asarray(g.eval({x: 0.0, y: 1.0}))) == 0.0

    @pytest.mark.parametrize("fn", [tm.lt, tm.le, tm.ge, tm.eq, tm.neq])
    def test_all_comparisons_zero_grad(self, fn):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        g = atp.grad(fn(x, y).sum(), [x, y])
        f = function([x, y], g, mode="PY")
        for got in f(np.array([1.0, 2.0]), np.array([2.0, 1.0])):
            np.testing.assert_array_equal(np.asarray(got), 0.0)

    @pytest.mark.parametrize("fn", [tm.isnan, tm.isinf])
    def test_isnan_isinf_zero_grad(self, fn):
        x = at.vector("x", dtype="float64")
        g = atp.grad(fn(x).sum(), x)
        got = np.asarray(function([x], g, mode="PY")(
            np.array([1.0, np.nan, np.inf])))
        np.testing.assert_array_equal(got, 0.0)

    @pytest.mark.parametrize("openness", [(False, False), (True, True)])
    def test_grad_inrange_zero_everywhere(self, openness):
        from aesara_tpu.tensor.elemwise import Elemwise

        op = Elemwise(InRange(*openness))
        x = at.scalar("x", dtype="float32")
        low = at.scalar("low", dtype="float32")
        high = at.scalar("high", dtype="float32")
        gx, glow, ghigh = atp.grad(op(x, low, high), [x, low, high])
        f = function([x, low, high], [gx, glow, ghigh], mode="PY")
        # below / at-low / inside / at-high / above: all exactly zero
        # (the boundary gradient is defined to 0 for stability)
        for xv in (0.0, 1.0, 2.0, 5.0, 7.0):
            assert [float(np.asarray(v)) for v in f(xv, 1.0, 5.0)] == [0, 0, 0]

    def test_grad_switch_integer_branch(self):
        x = at.matrix("x")
        c = at.matrix("c")
        gx = atp.grad(at.switch(c, x, 0).sum(), x)
        f = function([x, c], gx, mode="PY")
        cv = np.array([[1.0, 0.0]])
        np.testing.assert_array_equal(
            np.asarray(f(np.ones((1, 2), config.floatX), cv)), cv)

    def test_grad_identity_int_input(self):
        """grad through tensor_copy of an imatrix: zeros(floatX), not a
        disconnected error (reference test_grad_identity)."""
        xi = at.imatrix("xi")
        g = atp.grad(at.tensor_copy(xi).sum(dtype=config.floatX), xi)
        assert g.type.dtype == config.floatX
        got = np.asarray(function([xi], g, mode="PY")(
            np.arange(4, dtype="int32").reshape(2, 2)))
        np.testing.assert_array_equal(got, 0.0)

    def test_truly_disconnected_int_still_raises(self):
        xi = at.imatrix("xi")
        other = at.imatrix("other")
        with pytest.raises(ValueError, match="disconnected"):
            atp.grad(at.tensor_copy(xi).sum(dtype=config.floatX), other)

    def test_undefined_grad_still_raises_through_discrete(self):
        v = at.vector("v", dtype="float64")
        with pytest.raises((NullTypeGradError, TypeError, ValueError)):
            atp.grad(tm.argmax(v).astype("float64") ** 1.0, v)

    def test_grad_abs_at_zero_is_half(self):
        a = at.scalar("a", dtype="float32")
        b = 0.5 * (a + tm.abs(a))
        g = atp.grad(b, a)
        assert float(np.asarray(function([a], g, mode="PY")(0.0))) == 0.5


# ---------------------------------------------------------------------------
# Composite machinery (reference TestComposite)
# ---------------------------------------------------------------------------

class TestCompositeDepth:
    def _floats(self, n):
        return [ScalarType("float64")() for _ in range(n)]

    def test_nested_composite_value(self):
        x, y = self._floats(2)
        inner = Composite([x, y], [s.add(x, y)])
        x2, y2 = self._floats(2)
        outer = Composite([x2, y2], [inner(s.mul(x2, y2), y2)])
        # value contract regardless of whether nesting is flattened
        assert outer.impl(3.0, 4.0) == 3.0 * 4.0 + 4.0

    def test_nested_composite_through_pipeline(self):
        x, y = self._floats(2)
        inner = Composite([x, y], [s.add(x, y)])
        x2, y2 = self._floats(2)
        outer = Composite([x2, y2], [inner(s.mul(x2, y2), y2)])
        from aesara_tpu.tensor.elemwise import Elemwise

        xv = at.vector("xv", dtype="float64")
        yv = at.vector("yv", dtype="float64")
        out = Elemwise(outer)(xv, yv)
        for mode in ("PY", "FAST_RUN"):
            f = function([xv, yv], out, mode=mode)
            a, b = rng.normal(size=4), rng.normal(size=4)
            np.testing.assert_allclose(np.asarray(f(a, b)), a * b + b)

    def test_with_constants(self):
        x, y = self._floats(2)
        e = s.mul(s.add(s.constant(70.0, dtype="float64"), y),
                  s.true_div(x, y))
        comp = Composite([x, y], [e])
        assert np.isclose(comp.impl(1.0, 2.0), (70.0 + 2.0) * (1.0 / 2.0))

    def test_many_outputs(self):
        x, y, z = self._floats(3)
        e0, e1, e2 = s.add(x, y), s.add(x, s.mul(y, z)), s.sub(x, y)
        comp = Composite([x, y, z], [e0, e1, e2])
        got = comp.impl(1.0, 2.0, 3.0)
        assert got == (3.0, 7.0, -1.0)

    def test_printing_names_inner_ops(self):
        x, y = self._floats(2)
        comp = Composite([x, y], [s.add(s.exp(x), y)])
        assert "Composite" in str(comp)

    def test_wrong_arity_raises(self):
        x, y = self._floats(2)
        comp = Composite([x, y], [s.add(x, y)])
        with pytest.raises(ValueError, match="expects 2 inputs"):
            comp.make_node(x)

    def test_tensor_input_rejected(self):
        x, y = self._floats(2)
        comp = Composite([x, y], [s.add(x, y)])
        with pytest.raises(TypeError):
            comp.make_node(at.matrix("m"), at.matrix("n"))

    def test_compositef32_narrows_math(self):
        x, y = self._floats(2)
        comp = Composite([x, y], [s.exp(s.add(x, y))])
        nc = Compositef32.from_composite(comp)
        assert all(t.dtype == "float32" for t in nc.inputs_type)
        assert all(t.dtype == "float32" for t in nc.outputs_type)
        # inner math really runs in f32
        got = nc.impl(np.float32(0.25), np.float32(0.5))
        assert np.isclose(float(got), math.exp(0.75), rtol=1e-6)


# ---------------------------------------------------------------------------
# special-function NaN contracts (reference tests/scalar/test_math.py)
# ---------------------------------------------------------------------------

class TestSpecialNanContracts:
    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_gammainc_invalid_args_nan(self, mode):
        k, x = at.scalar("k"), at.scalar("x")
        f = function([k, x], tm.gammainc(k, x), mode=mode)
        assert np.isclose(float(np.asarray(f(1.0, 2.0))),
                          sp.gammainc(1.0, 2.0))
        assert np.isnan(float(np.asarray(f(-1.0, 1.0))))

    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_gammaincc_invalid_args_nan(self, mode):
        k, x = at.scalar("k"), at.scalar("x")
        f = function([k, x], tm.gammaincc(k, x), mode=mode)
        assert np.isclose(float(np.asarray(f(1.0, 2.0))),
                          sp.gammaincc(1.0, 2.0))
        assert np.isnan(float(np.asarray(f(-1.0, 1.0))))

    def test_betainc_grad_matches_finite_difference(self):
        a, b, x = at.scalar("a"), at.scalar("b"), at.scalar("x")
        ga, gb = atp.grad(tm.betainc(a, b, x), [a, b])
        f = function([a, b, x], [ga, gb], mode="PY")
        av, bv, xv = 15.0, 10.0, 0.7
        eps = 1e-5
        fd_a = (sp.betainc(av + eps, bv, xv) - sp.betainc(av - eps, bv, xv)) / (2 * eps)
        fd_b = (sp.betainc(av, bv + eps, xv) - sp.betainc(av, bv - eps, xv)) / (2 * eps)
        got_a, got_b = (float(np.asarray(v)) for v in f(av, bv, xv))
        assert np.isclose(got_a, fd_a, rtol=1e-4)
        assert np.isclose(got_b, fd_b, rtol=1e-4)

    def test_betainc_grad_nan_outside_domain(self):
        """The derivative is NaN outside the support (reference
        test_betainc_derivative_nan)."""
        a, b, x = at.scalar("a"), at.scalar("b"), at.scalar("x")
        ga, gb = atp.grad(tm.betainc(a, b, x), [a, b])
        f = function([a, b, x], [ga, gb], mode="PY")
        assert not any(np.isnan(float(np.asarray(v))) for v in f(1.0, 1.0, 0.5))
        for bad in [(1.0, 1.0, -1.0), (1.0, 1.0, 2.0), (1.0, -1.0, 1.0)]:
            assert all(np.isnan(float(np.asarray(v))) for v in f(*bad)), bad
