"""Complex-dtype semantics matrix (VERDICT r3 #5 dtype corners, weak #5
"complex coverage in only 4 test files"): arithmetic identities,
component ops (real/imag/conj/angle/complex/complex_from_polar), the
transcendental family on complex operands, complex dot/reductions,
structural ops, and gradient conventions — differential py-vs-XLA.

Reference: complex scalars in ``/root/reference/aesara/scalar/basic.py``
(Real:2876, Imag:2895, Angle:2914, Complex:2952, Abs complex→real
:2544); grads of real/imag are NullType (non-holomorphic) there too.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)
MODES = [(PY, "py"), (JAX, "jax")]

rng = np.random.default_rng(1618)


def zc(*shape, dtype="complex128"):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(dtype)


def _dual(out, expect, rtol=1e-10, err=""):
    for mode, label in MODES:
        r = np.asarray(function([], out, mode=mode)())
        np.testing.assert_allclose(r, expect, rtol=rtol, atol=1e-12,
                                   err_msg=f"{err} backend={label}")


class TestComponents:
    def test_real_imag_roundtrip(self):
        v = zc(5)
        x = at.as_tensor_variable(v)
        re, im = tm.real(x), tm.imag(x)
        assert re.type.dtype == "float64" and im.type.dtype == "float64"
        _dual(re, v.real, err="real")
        _dual(im, v.imag, err="imag")
        _dual(tm.complex(re, im), v, err="complex(re,im)")

    def test_conj_involution(self):
        v = zc(4)
        x = at.as_tensor_variable(v)
        _dual(tm.conj(tm.conj(x)), v, err="conj∘conj")
        _dual(tm.conj(x), v.conj(), err="conj")

    def test_conj_on_real_is_identity(self):
        v = rng.normal(size=4)
        x = at.as_tensor_variable(v)
        out = tm.conj(x)
        assert out.type.dtype == "float64"
        _dual(out, v, err="conj real")

    def test_angle_modulus_polar_identity(self):
        v = zc(6)
        x = at.as_tensor_variable(v)
        r, th = at.abs(x), tm.angle(x)
        assert r.type.dtype == "float64" and th.type.dtype == "float64"
        _dual(tm.complex_from_polar(r, th), v, rtol=1e-9, err="polar")

    def test_abs_is_modulus(self):
        v = zc(5)
        _dual(at.abs(at.as_tensor_variable(v)), np.abs(v), err="abs")

    def test_z_times_conj_is_abs_sq(self):
        v = zc(5)
        x = at.as_tensor_variable(v)
        out = tm.real(x * tm.conj(x))
        _dual(out, np.abs(v) ** 2, err="z·z̄")

    @pytest.mark.parametrize("dtype,want", [("complex64", "float32"),
                                            ("complex128", "float64")])
    def test_component_dtypes(self, dtype, want):
        x = at.vector("x", dtype=dtype)
        for fn in (tm.real, tm.imag, tm.angle, at.abs):
            assert fn(x).type.dtype == want, fn


class TestComplexTranscendentals:
    CASES = [
        ("exp", at.exp, np.exp),
        ("log", at.log, np.log),
        ("sqrt", at.sqrt, np.sqrt),
        ("sin", at.sin, np.sin),
        ("cos", at.cos, np.cos),
        ("tanh", at.tanh, np.tanh),
        ("sinh", at.sinh, np.sinh),
        ("cosh", at.cosh, np.cosh),
        ("expm1", tm.expm1, np.expm1),
        ("log1p", at.log1p, np.log1p),
    ]

    @pytest.mark.parametrize("name,fn,np_fn", CASES,
                             ids=[c[0] for c in CASES])
    def test_transcendental(self, name, fn, np_fn):
        v = zc(5) * 0.7
        out = fn(at.as_tensor_variable(v))
        assert out.type.dtype == "complex128", name
        _dual(out, np_fn(v), rtol=1e-9, err=name)

    def test_exp_log_branch(self):
        """log uses the principal branch: Im(log z) ∈ (−π, π]."""
        v = np.array([-1.0 + 0.0j, -1.0 - 1e-9j], dtype="complex128")
        out = at.log(at.as_tensor_variable(v))
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            assert abs(r[0].imag - np.pi) < 1e-9, label
            assert abs(r[1].imag + np.pi) < 1e-6, label

    def test_euler_identity(self):
        th = rng.normal(size=5)
        x = at.as_tensor_variable(th)
        out = at.exp(tm.complex(at.zeros_like(x), x))
        _dual(out, np.cos(th) + 1j * np.sin(th), rtol=1e-10, err="euler")


class TestComplexLinalgReduce:
    def test_complex_dot(self):
        a, b = zc(3, 4), zc(4, 2)
        out = at.dot(at.as_tensor_variable(a), at.as_tensor_variable(b))
        assert out.type.dtype == "complex128"
        _dual(out, a @ b, rtol=1e-10, err="dot")

    def test_complex_dot_mixed_real(self):
        a, b = zc(3, 3), rng.normal(size=(3, 3))
        out = at.dot(at.as_tensor_variable(a), at.as_tensor_variable(b))
        assert out.type.dtype == "complex128"
        _dual(out, a @ b, rtol=1e-10, err="dot mixed")

    def test_vdot_via_conj(self):
        a, b = zc(6), zc(6)
        out = at.dot(tm.conj(at.as_tensor_variable(a)),
                     at.as_tensor_variable(b))
        _dual(out, np.vdot(a, b), rtol=1e-10, err="vdot")

    def test_sum_prod_mean(self):
        v = zc(4, 3)
        x = at.as_tensor_variable(v)
        _dual(at.sum(x, axis=0), v.sum(axis=0), err="sum")
        _dual(at.prod(x, axis=1), v.prod(axis=1), rtol=1e-9, err="prod")
        _dual(at.mean(x), v.mean(), err="mean")

    def test_cumsum(self):
        v = zc(5)
        _dual(at.extra_ops.cumsum(at.as_tensor_variable(v)),
              np.cumsum(v), err="cumsum")


class TestComplexStructural:
    def test_reshape_transpose_concat(self):
        v = zc(3, 4)
        x = at.as_tensor_variable(v)
        _dual(at.reshape(x, (4, 3)), v.reshape(4, 3), err="reshape")
        _dual(x.T, v.T, err="T")
        _dual(at.join(0, x, x), np.concatenate([v, v]), err="join")

    def test_subtensor_setsubtensor(self):
        v = zc(5)
        x = at.as_tensor_variable(v)
        _dual(x[1:4], v[1:4], err="slice")
        y = zc(2)
        _dual(at.set_subtensor(x[:2], at.as_tensor_variable(y)),
              np.concatenate([y, v[2:]]), err="set")

    def test_switch_on_complex_values(self):
        c = np.array([1.0, 0.0, 1.0])
        a, b = zc(3), zc(3)
        out = at.switch(at.as_tensor_variable(c), at.as_tensor_variable(a),
                        at.as_tensor_variable(b))
        _dual(out, np.where(c != 0, a, b), err="switch")

    def test_alloc_fill(self):
        val = zc(1)[0]
        out = at.alloc(at.as_tensor_variable(val), 2, 3)
        _dual(out, np.full((2, 3), val), err="alloc")


class TestComplexGradConventions:
    def test_real_grad_is_null(self):
        """grad of real(z) wrt z is non-holomorphic: NullType errors at
        grad() (reference Real.grad returns NullType)."""
        from aesara_tpu.gradient import grad

        z = at.vector("z", dtype="complex128")
        with pytest.raises(Exception):
            g = grad(tm.real(z).sum(), z)
            function([z], g, mode=PY)(zc(3))

    def test_abs_grad_cr(self):
        from aesara_tpu.gradient import grad

        z = at.vector("z", dtype="complex128")
        g = grad(at.abs(z).sum(), z)
        v = zc(4)
        r = np.asarray(function([z], g, mode=PY)(v))
        np.testing.assert_allclose(r, v / np.abs(v), rtol=1e-10)

    def test_holomorphic_sqr_grad(self):
        """d(z²)/dz = 2z under the holomorphic convention where the
        framework supports complex grads."""
        from aesara_tpu.gradient import grad

        z = at.vector("z", dtype="complex128")
        try:
            g = grad(tm.sqr(z).sum(), z)
        except Exception:
            pytest.skip("complex holomorphic grad not supported (matches "
                        "reference: grad requires real-valued cost)")
        v = zc(3)
        r = np.asarray(function([z], g, mode=PY)(v))
        np.testing.assert_allclose(r, 2 * v, rtol=1e-10)


class TestComplexCasts:
    def test_widen_narrow(self):
        v = zc(4, dtype="complex64")
        x = at.as_tensor_variable(v)
        up = at.cast(x, "complex128")
        assert up.type.dtype == "complex128"
        _dual(up, v.astype("complex128"), rtol=1e-6, err="widen")
        down = at.cast(up, "complex64")
        for mode, label in MODES:
            r = np.asarray(function([], down, mode=mode)())
            assert r.dtype == np.complex64, label

    def test_real_to_complex_promotion(self):
        a = rng.normal(size=3)
        out = at.as_tensor_variable(a) + at.as_tensor_variable(zc(3))
        assert out.type.dtype == "complex128"

    def test_float32_complex64_promotion(self):
        x = at.vector("x", dtype="float32")
        z = at.vector("z", dtype="complex64")
        assert (x + z).type.dtype == "complex64"
        assert (at.vector(dtype="float64") + z).type.dtype == "complex128"
