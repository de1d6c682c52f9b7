"""keepdims + casting depth waves (VERDICT r4 item 4; reference
``tests/tensor/test_keepdims.py`` 258 LoC + ``test_casting.py`` 132 LoC,
no prior analog here).

keepdims contract: for every reduction and axis spec, ``keepdims=True``
equals ``expand_dims``-ing the reduced axes back (numpy semantics), on
both backends.  Casting contract: the full dtype lattice via ``cast``/
``astype``, including complex and bool corners, plus constant folding.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(5656)


def v(*shape, dtype="float64"):
    return rng.normal(size=shape).astype(dtype)


REDUCTIONS = {
    "sum": (lambda x, **kw: x.sum(**kw), np.sum),
    "prod": (lambda x, **kw: x.prod(**kw), np.prod),
    "mean": (lambda x, **kw: x.mean(**kw), np.mean),
    "max": (lambda x, **kw: x.max(**kw), np.max),
    "min": (lambda x, **kw: x.min(**kw), np.min),
    "var": (lambda x, **kw: x.var(**kw), np.var),
    "std": (lambda x, **kw: x.std(**kw), np.std),
}

AXES = [None, 0, 1, 2, -1, (0, 1), (1, 2), (0, 2), (0, 1, 2)]


class TestKeepdims:
    @pytest.mark.parametrize("name", sorted(REDUCTIONS))
    @pytest.mark.parametrize("axis", AXES)
    def test_matches_numpy(self, name, axis):
        build, npfn = REDUCTIONS[name]
        x = at.tensor3("x", dtype="float64")
        xv = np.abs(v(2, 3, 4)) + 0.5  # prod-safe magnitudes
        out = build(x, axis=axis, keepdims=True)
        f = function([x], out, mode="PY")
        got = np.asarray(f(xv))
        expect = npfn(xv, axis=axis, keepdims=True)
        np.testing.assert_allclose(got, expect, rtol=1e-10)
        assert got.shape == expect.shape

    @pytest.mark.parametrize("name", ["sum", "max", "mean"])
    @pytest.mark.parametrize("axis", [None, 1, (0, 2)])
    def test_jax_agrees(self, name, axis):
        build, _ = REDUCTIONS[name]
        x = at.tensor3("x", dtype="float64")
        compare_jax_and_py([x], build(x, axis=axis, keepdims=True),
                           [v(2, 3, 4)])

    @pytest.mark.parametrize("name", ["argmax", "argmin"])
    @pytest.mark.parametrize("axis", [0, 1, -1])
    def test_arg_reductions_keepdims(self, name, axis):
        x = at.matrix("x", dtype="float64")
        xv = v(3, 5)
        out = getattr(tm, name)(x, axis=axis, keepdims=True)
        f = function([x], out, mode="PY")
        got = np.asarray(f(xv))
        expect = getattr(np, name)(xv, axis=axis, keepdims=True)
        np.testing.assert_array_equal(got, expect)

    def test_keepdims_equals_expand_dims(self):
        """The defining identity, checked structurally on static types."""
        x = at.tensor3("x", dtype="float64")
        kd = x.sum(axis=1, keepdims=True)
        assert kd.type.shape[1] == 1
        assert kd.type.ndim == 3
        flat = x.sum(axis=(0, 1, 2), keepdims=True)
        assert flat.type.shape == (1, 1, 1)

    def test_keepdims_broadcast_back(self):
        """The canonical use: normalize along an axis without reshapes."""
        x = at.matrix("x", dtype="float64")
        out = x / x.sum(axis=1, keepdims=True)
        xv = np.abs(v(3, 4)) + 0.1
        f = function([x], out, mode="FAST_RUN")
        got = np.asarray(f(xv))
        np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-12)

    def test_keepdims_grad(self):
        from aesara_tpu.gradient import verify_grad

        verify_grad(lambda m: (m / m.sum(axis=0, keepdims=True)).sum(),
                    [np.abs(v(3, 4)) + 0.5], rng=rng)

    @pytest.mark.parametrize("name", ["all", "any"])
    def test_logical_reductions_keepdims(self, name):
        x = at.matrix("x", dtype="bool")
        xv = rng.integers(0, 2, size=(3, 4)).astype(bool)
        out = getattr(tm, name)(x, axis=1, keepdims=True)
        f = function([x], out, mode="PY")
        np.testing.assert_array_equal(
            np.asarray(f(xv)), getattr(np, name)(xv, axis=1, keepdims=True))


ALL_DTYPES = ["bool", "int8", "int16", "int32", "int64", "uint8",
              "uint16", "uint32", "uint64", "float32", "float64",
              "complex64", "complex128"]


class TestCastLattice:
    @pytest.mark.parametrize("src", ["int32", "float32", "float64", "bool"])
    @pytest.mark.parametrize("dst", ALL_DTYPES)
    def test_cast_grid(self, src, dst):
        x = at.TensorType(src, (None,))("x")
        out = tm.cast(x, dst)
        assert out.type.dtype == dst
        if src == "bool":
            xv = np.array([True, False, True])
        else:
            xv = (rng.normal(size=4) * 10).astype(src)
        f = function([x], out, mode="PY")
        got = np.asarray(f(xv))
        assert got.dtype == np.dtype(dst)
        np.testing.assert_array_equal(got, xv.astype(dst))

    @pytest.mark.parametrize("dst", ["int16", "float32", "complex64"])
    def test_jax_agrees(self, dst):
        x = at.vector("x", dtype="float64")
        compare_jax_and_py([x], tm.cast(x, dst), [v(4)])

    def test_complex_to_real_direct_cast_rejected(self):
        """Dropping the imaginary part silently is an error — use
        real(x) (numpy raises ComplexWarning/TypeError; reference
        disallows it in cast)."""
        x = at.vector("x", dtype="complex128")
        with pytest.raises((TypeError, ValueError)):
            tm.cast(x, "float64")

    def test_real_imag_extraction_instead(self):
        x = at.vector("x", dtype="complex128")
        f = function([x], [tm.real(x), tm.imag(x)], mode="PY")
        xv = np.array([1 + 2j, -3 + 0.5j])
        r, i = f(xv)
        np.testing.assert_allclose(np.asarray(r), xv.real)
        np.testing.assert_allclose(np.asarray(i), xv.imag)

    def test_astype_method_sugar(self):
        x = at.vector("x", dtype="float64")
        out = x.astype("int32")
        assert out.type.dtype == "int32"
        f = function([x], out, mode="PY")
        np.testing.assert_array_equal(np.asarray(f(np.array([1.7, -2.3]))),
                                      np.array([1.7, -2.3]).astype("int32"))

    def test_cast_constant_folds(self):
        from tests.rewrite_corpus import rewrite_and_check

        out = tm.cast(at.constant(np.array([1.5, 2.5])), "int64")
        rewrite_and_check([], out, [], include=("canonicalize",),
                          expect_constant=np.array([1, 2], dtype="int64"))

    def test_cast_noop_elided(self):
        from tests.rewrite_corpus import op_labels, rewrite_only

        x = at.vector("x", dtype="float64")
        res = rewrite_only(tm.cast(x, "float64"), include=("canonicalize",))
        assert res is x or "Cast" not in str(op_labels(res))

    def test_bool_roundtrip_through_int(self):
        x = at.vector("x", dtype="bool")
        out = tm.cast(tm.cast(x, "int8"), "bool")
        f = function([x], out, mode="PY")
        xv = np.array([True, False])
        np.testing.assert_array_equal(np.asarray(f(xv)), xv)

    def test_float_to_int_truncates_toward_zero(self):
        x = at.vector("x", dtype="float64")
        f = function([x], tm.cast(x, "int64"), mode="PY")
        fj = function([x], tm.cast(x, "int64"), mode="JAX")
        xv = np.array([1.9, -1.9, 0.5, -0.5])
        np.testing.assert_array_equal(np.asarray(f(xv)), [1, -1, 0, 0])
        np.testing.assert_array_equal(np.asarray(fj(xv)), [1, -1, 0, 0])

    def test_grad_through_cast_f32_f64(self):
        from aesara_tpu.gradient import grad

        x = at.vector("x", dtype="float32")
        cost = tm.sum(tm.sqr(tm.cast(x, "float64")))
        g = grad(cost, x)
        assert g.type.dtype == "float32"
        f = function([x], g, mode="FAST_RUN")
        xv = v(3, dtype="float32")
        np.testing.assert_allclose(np.asarray(f(xv)), 2 * xv, rtol=1e-6)

    def test_grad_to_int_cast_is_zero_or_disconnected(self):
        from aesara_tpu.gradient import grad

        x = at.vector("x", dtype="float64")
        cost = tm.sum(tm.cast(tm.cast(x, "int64"), "float64"))
        g = grad(cost, x, disconnected_inputs="ignore")
        f = function([x], g, mode="FAST_RUN", on_unused_input="ignore")
        np.testing.assert_allclose(np.asarray(f(v(4))), 0.0)
