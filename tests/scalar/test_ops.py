"""The scalar algebra layer itself (reference ``aesara/scalar/basic.py`` +
``scalar/math.py``; tests/scalar/test_basic.py + test_math.py): ``impl``
oracles vs NumPy/SciPy, output-dtype rules, and Composite machinery.

The tensor-level Elemwise lifts of these ops are swept in
``tests/tensor/test_op_matrix.py``; here the scalar ops are driven
directly (the py-thunk path every lowering is differentially tested
against)."""

import math

import numpy as np
import pytest
import scipy.special as sp

from aesara_tpu.scalar import math as sm
from aesara_tpu.scalar import ops as s
from aesara_tpu.scalar.composite import Composite
from aesara_tpu.scalar.ops import ScalarType, upcast

rng = np.random.default_rng(5150)


# ---------------------------------------------------------------------------
# impl oracles: (op instance, reference fn, arg samplers)
# ---------------------------------------------------------------------------

def _pos():
    return float(np.abs(rng.normal()) + 0.4)


def _any():
    return float(rng.normal())


def _unit():
    return float(rng.uniform(-0.85, 0.85))


def _punit():
    return float(rng.uniform(0.05, 0.95))


def _int():
    return int(rng.integers(1, 16))


ARITH = [
    (s.add, lambda a, b: a + b, _any, _any),
    (s.sub, lambda a, b: a - b, _any, _any),
    (s.mul, lambda a, b: a * b, _any, _any),
    (s.true_div, lambda a, b: a / b, _any, _pos),
    (s.int_div, lambda a, b: a // b, _int, _int),
    (s.mod, lambda a, b: a % b, _int, _int),
    (s.pow, lambda a, b: a ** b, _pos, _any),
    (s.maximum, max, _any, _any),
    (s.minimum, min, _any, _any),
]

UNARY = [
    (s.neg, lambda a: -a, _any),
    (s.abs_, abs, _any),
    (s.sgn, np.sign, _any),
    (s.ceil, math.ceil, _any),
    (s.floor, math.floor, _any),
    (s.trunc, math.trunc, _any),
    (s.exp, math.exp, _any),
    (s.log, math.log, _pos),
    (s.sqrt, math.sqrt, _pos),
    (s.sqr, lambda a: a * a, _any),
    (s.reciprocal, lambda a: 1.0 / a, _pos),
    (s.sin, math.sin, _any),
    (s.cos, math.cos, _any),
    (s.tan, math.tan, _unit),
    (s.arcsin, math.asin, _unit),
    (s.arccos, math.acos, _unit),
    (s.arctan, math.atan, _any),
    (s.sinh, math.sinh, _any),
    (s.cosh, math.cosh, _any),
    (s.tanh, math.tanh, _any),
    (s.arcsinh, math.asinh, _any),
    (s.arccosh, math.acosh, lambda: 1.0 + abs(rng.normal())),
    (s.arctanh, math.atanh, _unit),
]

SPECIAL = [
    (sm.erf, sp.erf, _any),
    (sm.erfc, sp.erfc, _any),
    (sm.erfinv, sp.erfinv, _unit),
    (sm.erfcinv, sp.erfcinv, _punit),
    (sm.erfcx, sp.erfcx, _any),
    (sm.gamma, sp.gamma, _pos),
    (sm.gammaln, sp.gammaln, _pos),
    (sm.psi, sp.psi, _pos),
    (sm.tri_gamma, lambda x: sp.polygamma(1, x), _pos),
    (sm.gammainc, sp.gammainc, _pos, _pos),
    (sm.gammaincc, sp.gammaincc, _pos, _pos),
    (sm.gammau, lambda k, x: sp.gammaincc(k, x) * sp.gamma(k), _pos, _pos),
    (sm.gammal, lambda k, x: sp.gammainc(k, x) * sp.gamma(k), _pos, _pos),
    (sm.j0, sp.j0, _any),
    (sm.j1, sp.j1, _any),
    (sm.jv, sp.jv, _pos, _pos),
    (sm.i0, sp.i0, _any),
    (sm.i1, sp.i1, _any),
    (sm.iv, sp.iv, _pos, _pos),
    (sm.betainc, sp.betainc, _pos, _pos, _punit),
    (sm.sigmoid, sp.expit, _any),
    (sm.softplus, lambda x: np.log1p(np.exp(x)), _any),
    (sm.log1mexp, lambda x: np.log1p(-np.exp(x)), lambda: -_pos()),
    (sm.hyp2f1, sp.hyp2f1, _punit, _punit, _pos, _unit),
    (sm.owens_t, sp.owens_t, _any, _any),
]


@pytest.mark.parametrize(
    "case", ARITH + UNARY, ids=lambda c: str(c[0])
)
def test_impl_matches_python(case):
    op, ref, *samplers = case
    for _ in range(8):
        args = [f() for f in samplers]
        got = op.impl(*args)
        want = ref(*args)
        assert np.isclose(float(got), float(want), rtol=1e-10), (
            op, args, got, want,
        )


@pytest.mark.parametrize("case", SPECIAL, ids=lambda c: str(c[0]))
def test_special_impl_matches_scipy(case):
    op, ref, *samplers = case
    for _ in range(6):
        args = [f() for f in samplers]
        got = float(op.impl(*args))
        want = float(ref(*args))
        assert np.isclose(got, want, rtol=1e-7, atol=1e-12), (op, args, got, want)


def test_comparisons_and_logic():
    assert s.lt.impl(1, 2) and not s.lt.impl(2, 1)
    assert s.gt.impl(3, 2) and not s.gt.impl(2, 3)
    assert s.le.impl(2, 2) and s.ge.impl(2, 2)
    assert s.eq.impl(5, 5) and s.neq.impl(5, 6)
    assert s.and_.impl(1, 1) and not s.and_.impl(1, 0)
    assert s.or_.impl(0, 1) and not s.or_.impl(0, 0)
    assert s.xor.impl(1, 0) and not s.xor.impl(1, 1)
    assert s.invert.impl(np.int8(5)) == ~np.int8(5)
    assert s.shift_left.impl(3, 2) == 12
    assert s.shift_right.impl(12, 2) == 3
    assert s.isnan.impl(float("nan")) and not s.isnan.impl(1.0)
    assert s.isinf.impl(float("inf")) and not s.isinf.impl(1.0)


def test_switch_clip_identity_second():
    assert s.switch.impl(True, 1.5, 2.5) == 1.5
    assert s.switch.impl(False, 1.5, 2.5) == 2.5
    assert s.clip_scalar.impl(5.0, 0.0, 2.0) == 2.0
    assert s.clip_scalar.impl(-1.0, 0.0, 2.0) == 0.0
    assert s.clip_scalar.impl(1.0, 0.0, 2.0) == 1.0
    assert s.identity.impl(3.25) == 3.25
    assert s.second.impl(99.0, 3.25) == 3.25


def test_rounding_modes():
    # banker's rounding vs away-from-zero (the reference distinction)
    assert s.round_half_to_even.impl(2.5) == 2.0
    assert s.round_half_to_even.impl(3.5) == 4.0
    assert s.round_half_away_from_zero.impl(2.5) == 3.0
    assert s.round_half_away_from_zero.impl(-2.5) == -3.0


# ---------------------------------------------------------------------------
# dtype rules
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("a", ["int8", "int32", "uint8", "float32", "float64"])
@pytest.mark.parametrize("b", ["int8", "int64", "uint16", "float32", "float64"])
def test_upcast_matches_numpy(a, b):
    assert upcast(a, b) == str(np.promote_types(a, b))


def test_output_dtype_of_comparison_is_bool():
    x, y = ScalarType("float64")(), ScalarType("float64")()
    assert s.lt(x, y).type.dtype == "bool"
    assert s.eq(x, y).type.dtype == "bool"


def test_arith_output_dtype_upcasts():
    x = ScalarType("int32")()
    y = ScalarType("float32")()
    assert s.add(x, y).type.dtype == str(np.promote_types("int32", "float32"))
    xi8 = ScalarType("int8")()
    yi8 = ScalarType("int8")()
    assert s.add(xi8, yi8).type.dtype == "int8"


def test_true_div_of_ints_is_float():
    x, y = ScalarType("int32")(), ScalarType("int32")()
    assert s.true_div(x, y).type.dtype in ("float32", "float64")


# ---------------------------------------------------------------------------
# Composite: the fusion unit
# ---------------------------------------------------------------------------

def test_composite_impl_and_equality():
    x, y = ScalarType("float64")(), ScalarType("float64")()
    g = s.add(s.mul(x, y), s.exp(x))
    c1 = Composite([x, y], [g])
    assert np.isclose(c1.impl(2.0, 3.0), 2.0 * 3.0 + math.exp(2.0))

    x2, y2 = ScalarType("float64")(), ScalarType("float64")()
    c2 = Composite([x2, y2], [s.add(s.mul(x2, y2), s.exp(x2))])
    assert c1 == c2 and hash(c1) == hash(c2)

    c3 = Composite([x2, y2], [s.add(s.mul(x2, y2), s.exp(y2))])
    assert c1 != c3


def test_composite_multiple_outputs():
    x = ScalarType("float64")()
    c = Composite([x], [s.exp(x), s.neg(x)])
    out = c.impl(1.5)
    assert np.isclose(out[0], math.exp(1.5)) and out[1] == -1.5


def test_composite_through_tensor_pipeline():
    """An elemwise chain compiles to ONE Composite node under FAST_RUN
    and matches the raw py evaluation."""
    import aesara_tpu.tensor as at
    from aesara_tpu.compile.function import function
    from aesara_tpu.tensor.elemwise import Elemwise

    xv = at.matrix("x", dtype="float64")
    expr = at.tanh(at.exp(-xv) + xv * 2.0)
    f = function([xv], expr, mode="FAST_RUN")
    comps = [
        n for n in f.fgraph.apply_nodes
        if isinstance(n.op, Elemwise) and isinstance(n.op.scalar_op, Composite)
    ]
    assert len(comps) == 1
    data = rng.normal(size=(4, 3))
    np.testing.assert_allclose(
        np.asarray(f(data)), np.tanh(np.exp(-data) + data * 2.0), rtol=1e-10
    )


def test_scalar_grad_through_elemwise_lift():
    import aesara_tpu.tensor as at
    from aesara_tpu.gradient import verify_grad

    verify_grad(lambda v: at.sigmoid(v).sum(), [rng.normal(size=5)], rng=rng)
    verify_grad(lambda v: at.math.softplus(v).sum(), [rng.normal(size=5)],
                rng=rng)
    verify_grad(lambda v: at.math.erf(v).sum(), [rng.normal(size=5)], rng=rng)
