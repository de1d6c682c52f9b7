"""Dtype breadth: bfloat16 (the TPU production dtype), small ints, bool,
uint — differential across backends."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from tests.utils import compare_jax_and_py

import ml_dtypes

rng = np.random.default_rng(19)


class TestBfloat16:
    def test_elemwise_chain(self):
        x = at.matrix("x", dtype="bfloat16")
        y = at.matrix("y", dtype="bfloat16")
        out = at.tanh(x) * at.math.sigmoid(y) + x
        xv = rng.normal(size=(4, 4)).astype(ml_dtypes.bfloat16)
        yv = rng.normal(size=(4, 4)).astype(ml_dtypes.bfloat16)
        res = compare_jax_and_py([x, y], out, [xv, yv],
                                 assert_fn=lambda a, b: np.testing.assert_allclose(
                                     np.asarray(a, np.float32), np.asarray(b, np.float32),
                                     rtol=2e-2, atol=1e-2))
        assert str(np.asarray(res[0]).dtype) == "bfloat16"

    def test_dot_upcast_control(self):
        x = at.matrix("x", dtype="bfloat16")
        w = at.matrix("w", dtype="bfloat16")
        out = at.dot(x, w)
        assert out.type.dtype == "bfloat16"
        xv = rng.normal(size=(4, 8)).astype(ml_dtypes.bfloat16)
        wv = rng.normal(size=(8, 2)).astype(ml_dtypes.bfloat16)
        f = function([x, w], out, mode="JAX")
        res = np.asarray(f(xv, wv))
        expected = np.asarray(xv, np.float32) @ np.asarray(wv, np.float32)
        np.testing.assert_allclose(np.asarray(res, np.float32), expected,
                                   rtol=5e-2, atol=5e-2)

    def test_cast_roundtrip(self):
        x = at.matrix("x", dtype="float32")
        out = at.cast(at.cast(x, "bfloat16"), "float32")
        v = rng.normal(size=(3, 3)).astype("float32")
        res = compare_jax_and_py([x], out, [v],
                                 assert_fn=lambda a, b: np.testing.assert_allclose(
                                     a, b, rtol=1e-2, atol=1e-2))

    def test_shared_bf16(self):
        w = atp.shared(np.ones((3,), dtype=ml_dtypes.bfloat16), name="w")
        f = function([], (w * 2).sum(), updates={w: w + 1})
        f()
        np.testing.assert_allclose(np.asarray(w.get_value(), np.float32), 2.0)


class TestIntegers:
    @pytest.mark.parametrize("dtype", ["int8", "int16", "uint8", "uint32"])
    def test_arith(self, dtype):
        x = at.vector("x", dtype=dtype)
        y = at.vector("y", dtype=dtype)
        lo, hi = (0, 50) if dtype.startswith("u") else (-50, 50)
        a = rng.integers(lo, hi, 6).astype(dtype)
        b = rng.integers(1, 7, 6).astype(dtype)
        compare_jax_and_py([x, y], x + y * 2, [a, b])
        compare_jax_and_py([x, y], x // y, [a, b])
        compare_jax_and_py([x, y], x % y, [a, b])

    def test_bool_ops(self):
        x = at.vector("x", dtype="bool")
        y = at.vector("y", dtype="bool")
        a = rng.integers(0, 2, 8).astype(bool)
        b = rng.integers(0, 2, 8).astype(bool)
        compare_jax_and_py([x, y], x & y, [a, b])
        compare_jax_and_py([x, y], x | y, [a, b])
        compare_jax_and_py([x], at.math.invert_bool(x), [a])
        compare_jax_and_py([x], at.math.sum(x), [a])  # bool sum → int64

    def test_mixed_promotion_matches_numpy(self):
        cases = [("int8", "int32"), ("uint8", "int16"), ("int16", "float32"),
                 ("int64", "float32")]
        for d1, d2 in cases:
            x = at.scalar("x", dtype=d1)
            y = at.scalar("y", dtype=d2)
            out = x + y
            expected = np.promote_types(d1, d2).name
            assert out.type.dtype == expected, (d1, d2, out.type.dtype)

    def test_int_pow_and_abs(self):
        x = at.vector("x", dtype="int32")
        a = rng.integers(-5, 5, 6).astype("int32")
        compare_jax_and_py([x], at.math.abs(x), [a])
        compare_jax_and_py([x], x ** 2, [a])


class TestComplex:
    """complex64/128 component ops (reference scalar/basic.py Real:2876,
    Imag, Angle, Complex, ComplexFromPolar)."""

    def test_components_py(self):
        z = at.vector("z", dtype="complex64")
        f = atp.function(
            [z],
            [at.math.real(z), at.math.imag(z), at.math.angle(z), at.math.conj(z)],
            mode="PY",
        )
        zv = np.array([1 + 2j, 3 - 4j], dtype="complex64")
        r, i, a, c = f(zv)
        assert np.allclose(r, zv.real) and np.allclose(i, zv.imag)
        assert np.allclose(a, np.angle(zv)) and np.allclose(c, zv.conj())

    def test_construct_and_jit(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        xv = np.array([1.0, 2.0], dtype="float32")
        yv = np.array([3.0, 4.0], dtype="float32")
        g = atp.function([x, y], at.math.complex(x, y), mode="PY")
        assert g(xv, yv).dtype.kind == "c"
        assert np.allclose(g(xv, yv), xv + 1j * yv)
        # |z|^2 through XLA
        zz = at.math.complex(x, y)
        fj = atp.function([x, y], at.math.real(zz * at.math.conj(zz)))
        assert np.allclose(fj(xv, yv), xv**2 + yv**2)

    def test_polar(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        h = atp.function([x, y], at.math.complex_from_polar(x, y), mode="PY")
        xv = np.array([1.0, 2.0], dtype="float32")
        yv = np.array([0.5, 1.5], dtype="float32")
        assert np.allclose(h(xv, yv), xv * np.exp(1j * yv), rtol=1e-6)


class TestBfloat16Promotion:
    """upcast() must follow jax's accelerator rules for bfloat16 —
    numpy's promote_types refuses bf16 with ints entirely (the round-2
    transformer bench hit this through
    local_upcast_elemwise_constant_inputs)."""

    def test_pairs(self):
        from aesara_tpu.scalar.ops import upcast

        assert upcast("bfloat16", "int64") == "bfloat16"
        assert upcast("bfloat16", "int8") == "bfloat16"
        assert upcast("bfloat16", "bool") == "bfloat16"
        assert upcast("bfloat16", "float16") == "float32"
        assert upcast("bfloat16", "float32") == "float32"
        assert upcast("bfloat16", "float64") == "float64"
        assert upcast("bfloat16", "bfloat16") == "bfloat16"
        assert upcast("bfloat16") == "bfloat16"
        # non-bf16 paths keep exact numpy semantics
        assert upcast("float16", "int64") == "float64"
        assert upcast("float32", "int8") == "float32"

    def test_bf16_graph_with_int_constant_compiles(self):
        import warnings

        import aesara_tpu as atp

        x = at.vector("x", dtype="bfloat16")
        expr = x * np.int64(3) + np.int8(1)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            f = atp.function([x], expr, mode="PY")
        out = f(np.arange(4, dtype="float32").astype(ml_bfloat16()))
        assert np.allclose(np.asarray(out, dtype="float32"),
                           np.arange(4.0) * 3 + 1)


def ml_bfloat16():
    import ml_dtypes

    return ml_dtypes.bfloat16


def test_bf16_three_way_promotion_matches_jax():
    """bf16 + f16 + int64 must give float32 like jax, not float64
    (review finding: numpy's f16-int64 promotion leaked through)."""
    from aesara_tpu.scalar.ops import upcast

    assert upcast("bfloat16", "float16", "int64") == "float32"
    assert upcast("bfloat16", "float32", "int64") == "float32"
    assert upcast("bfloat16", "complex64") == "complex64"
