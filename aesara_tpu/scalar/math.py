"""Special-function scalar ops (Erf/Gamma/Psi/Bessel/BetaInc/Hyp2F1 family).

Re-design of the reference's ``aesara/scalar/math.py`` (1,659 LoC) whose C
snippets (``scalar/c_code/gamma.c``) are replaced here by SciPy reference
implementations (py oracle) + XLA lowerings via ``jax.scipy.special`` /
``jax.lax`` registered in ``aesara_tpu.link.jax.dispatch.scalar``
(SURVEY §2.4 "TPU equivalent").
"""

from __future__ import annotations

import math

import numpy as np
import scipy.special as _sp

from aesara_tpu.scalar.ops import (
    BinaryScalarOp,
    ScalarOp,
    UnaryScalarOp,
    add,
    constant,
    cast_to,
    discrete_dtypes,
    exp,
    log,
    log1p,
    mul,
    neg,
    pow,
    sqr,
    sqrt,
    sub,
    switch,
    true_div,
    upgrade_to_float,
    upgrade_to_float64,
    upgrade_to_float_no_complex,
)


class Erf(UnaryScalarOp):
    nfunc = staticmethod(_sp.erf)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        c = constant(2.0 / math.sqrt(math.pi))
        return [mul(gz, mul(c, exp(neg(sqr(x)))))]


class Erfc(UnaryScalarOp):
    nfunc = staticmethod(_sp.erfc)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        c = constant(-2.0 / math.sqrt(math.pi))
        return [mul(gz, mul(c, exp(neg(sqr(x)))))]


class Erfinv(UnaryScalarOp):
    nfunc = staticmethod(_sp.erfinv)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        c = constant(math.sqrt(math.pi) / 2.0)
        return [mul(gz, mul(c, exp(sqr(erfinv(x)))))]


class Erfcinv(UnaryScalarOp):
    nfunc = staticmethod(_sp.erfcinv)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        c = constant(-math.sqrt(math.pi) / 2.0)
        return [mul(gz, mul(c, exp(sqr(erfcinv(x)))))]


class Gamma(UnaryScalarOp):
    nfunc = staticmethod(_sp.gamma)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, mul(gamma(x), psi(x)))]


class GammaLn(UnaryScalarOp):
    nfunc = staticmethod(_sp.gammaln)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, psi(x))]


class Psi(UnaryScalarOp):
    """digamma"""

    nfunc = staticmethod(_sp.psi)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, tri_gamma(x))]


class TriGamma(UnaryScalarOp):
    nfunc = staticmethod(lambda x: _sp.polygamma(1, x))
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0])]


class GammaInc(BinaryScalarOp):
    """Regularized lower incomplete gamma P(k, x)."""

    nfunc = staticmethod(_sp.gammainc)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        k, x = inputs
        (gz,) = output_grads
        gx = mul(gz, gamma_inc_der(k, x))
        gk = mul(gz, gamma_inc_grad_k(k, x))
        return [gk, gx]


class GammaIncC(BinaryScalarOp):
    """Regularized upper incomplete gamma Q(k, x)."""

    nfunc = staticmethod(_sp.gammaincc)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        k, x = inputs
        (gz,) = output_grads
        gx = neg(mul(gz, gamma_inc_der(k, x)))
        gk = neg(mul(gz, gamma_inc_grad_k(k, x)))
        return [gk, gx]


class GammaIncDer(BinaryScalarOp):
    """d/dx gammainc(k, x) = x^(k-1) e^-x / Gamma(k)."""

    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def impl(self, k, x):
        with np.errstate(over="ignore", under="ignore"):
            return np.exp((k - 1) * np.log(x) - x - _sp.gammaln(k))

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, inp) for i, inp in enumerate(inputs)]


class GammaIncGradK(BinaryScalarOp):
    """d/dk gammainc(k, x), by numerical differentiation in the oracle and
    the same finite-difference stencil in the XLA lowering."""

    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def impl(self, k, x):
        eps = 1e-5 * max(1.0, abs(float(k)))
        return (_sp.gammainc(k + eps, x) - _sp.gammainc(k - eps, x)) / (2 * eps)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, inp) for i, inp in enumerate(inputs)]


class GammaU(BinaryScalarOp):
    """Unregularized upper incomplete gamma."""

    nfunc = staticmethod(lambda k, x: _sp.gammaincc(k, x) * _sp.gamma(k))
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, inp) for i, inp in enumerate(inputs)]


class GammaL(BinaryScalarOp):
    """Unregularized lower incomplete gamma."""

    nfunc = staticmethod(lambda k, x: _sp.gammainc(k, x) * _sp.gamma(k))
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, inp) for i, inp in enumerate(inputs)]


class Jv(BinaryScalarOp):
    """Bessel J of real order v."""

    nfunc = staticmethod(_sp.jv)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        v, x = inputs
        (gz,) = output_grads
        from aesara_tpu.gradient import grad_not_implemented

        gx = mul(gz, true_div(sub(jv(sub(v, constant(1.0)), x), jv(add(v, constant(1.0)), x)), constant(2.0)))
        return [grad_not_implemented(self, 0, v), gx]


class J0(UnaryScalarOp):
    nfunc = staticmethod(_sp.j0)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, neg(j1(x)))]


class J1(UnaryScalarOp):
    nfunc = staticmethod(_sp.j1)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, sub(j0(x), true_div(j1(x), x)))]


class Iv(BinaryScalarOp):
    """Modified Bessel I of real order v."""

    nfunc = staticmethod(_sp.iv)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        v, x = inputs
        (gz,) = output_grads
        from aesara_tpu.gradient import grad_not_implemented

        gx = mul(gz, true_div(add(iv(sub(v, constant(1.0)), x), iv(add(v, constant(1.0)), x)), constant(2.0)))
        return [grad_not_implemented(self, 0, v), gx]


class I0(UnaryScalarOp):
    nfunc = staticmethod(_sp.i0)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, i1(x))]


class I1(UnaryScalarOp):
    nfunc = staticmethod(_sp.i1)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, sub(i0(x), true_div(i1(x), x)))]


class BetaInc(ScalarOp):
    """Regularized incomplete beta I_x(a, b)."""

    nin = 3
    nfunc = staticmethod(_sp.betainc)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        a, b, x = inputs
        (gz,) = output_grads
        # dI/dx = x^(a-1) (1-x)^(b-1) / B(a,b)
        log_beta = add(sub(gammaln(a), gammaln(add(a, b))), gammaln(b))
        dx = exp(
            sub(
                add(mul(sub(a, constant(1.0)), log(x)),
                    mul(sub(b, constant(1.0)), log1p(neg(x)))),
                log_beta,
            )
        )
        ga = mul(gz, betainc_grad_a(a, b, x))
        gb = mul(gz, betainc_grad_b(a, b, x))
        return [ga, gb, mul(gz, dx)]


class BetaIncGradA(ScalarOp):
    nin = 3
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def impl(self, a, b, x):
        eps = 1e-6 * max(1.0, abs(float(a)))
        return (_sp.betainc(a + eps, b, x) - _sp.betainc(a - eps, b, x)) / (2 * eps)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, inp) for i, inp in enumerate(inputs)]


class BetaIncGradB(ScalarOp):
    nin = 3
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def impl(self, a, b, x):
        eps = 1e-6 * max(1.0, abs(float(b)))
        return (_sp.betainc(a, b + eps, x) - _sp.betainc(a, b - eps, x)) / (2 * eps)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, inp) for i, inp in enumerate(inputs)]


class Hyp2F1(ScalarOp):
    """Gauss hypergeometric 2F1(a, b; c; z)."""

    nin = 4
    nfunc = staticmethod(_sp.hyp2f1)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        a, b, c, z = inputs
        (gz,) = output_grads
        from aesara_tpu.gradient import grad_not_implemented

        # d/dz 2F1(a,b;c;z) = (a b / c) 2F1(a+1, b+1; c+1; z)
        one = constant(1.0)
        dz = mul(true_div(mul(a, b), c), hyp2f1(add(a, one), add(b, one), add(c, one), z))
        return [
            grad_not_implemented(self, 0, a),
            grad_not_implemented(self, 1, b),
            grad_not_implemented(self, 2, c),
            mul(gz, dz),
        ]


class Sigmoid(UnaryScalarOp):
    nfunc = staticmethod(_sp.expit)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        s = sigmoid(x)
        return [mul(gz, mul(s, sub(constant(1.0), s)))]


class Softplus(UnaryScalarOp):
    """log(1 + exp(x)) with the standard stability branches."""

    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def impl(self, x):
        # np.asarray + ndim check instead of np.float64(x): constant
        # folding hands impl size-1 ARRAYS, and converting those is a
        # numpy-2.x error that would silently disable the fold
        xf = np.asarray(x, dtype=np.float64)
        if xf.ndim:
            with np.errstate(over="ignore"):
                return np.where(
                    xf < -37.0, np.exp(xf),
                    np.where(xf < 18.0,
                             np.log1p(np.exp(np.minimum(xf, 18.0))),
                             np.where(xf < 33.3, xf + np.exp(-xf), xf)))
        xf = float(xf)
        if xf < -37.0:
            return np.exp(xf)
        if xf < 18.0:
            return np.log1p(np.exp(xf))
        if xf < 33.3:
            return xf + np.exp(-xf)
        return xf

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, sigmoid(x))]


class Log1mexp(UnaryScalarOp):
    """log(1 - exp(x)) for x <= 0 (stable)."""

    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def impl(self, x):
        if x < math.log(0.5):
            return np.log1p(-np.exp(x))
        return np.log(-np.expm1(x))

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        return [mul(gz, true_div(constant(-1.0), expm1_neg(x)))]


def expm1_neg(x):
    from aesara_tpu.scalar.ops import expm1

    return expm1(neg(x))


erf = Erf(name="erf")
erfc = Erfc(name="erfc")
erfinv = Erfinv(name="erfinv")
erfcinv = Erfcinv(name="erfcinv")
gamma = Gamma(name="gamma")
gammaln = GammaLn(name="gammaln")
psi = Psi(name="psi")
tri_gamma = TriGamma(name="tri_gamma")
gammainc = GammaInc(name="gammainc")
gammaincc = GammaIncC(name="gammaincc")
gamma_inc_der = GammaIncDer(name="gamma_inc_der")
gamma_inc_grad_k = GammaIncGradK(name="gamma_inc_grad_k")
gammau = GammaU(name="gammau")
gammal = GammaL(name="gammal")
jv = Jv(name="jv")
j0 = J0(name="j0")
j1 = J1(name="j1")
iv = Iv(name="iv")
i0 = I0(name="i0")
i1 = I1(name="i1")
betainc = BetaInc(name="betainc")
betainc_grad_a = BetaIncGradA(name="betainc_grad_a")
betainc_grad_b = BetaIncGradB(name="betainc_grad_b")
hyp2f1 = Hyp2F1(name="hyp2f1")
sigmoid = Sigmoid(name="sigmoid")
softplus = Softplus(name="softplus")
log1mexp = Log1mexp(name="log1mexp")


class Erfcx(UnaryScalarOp):
    """exp(x^2) * erfc(x), overflow-safe (reference ``scalar/math.py``
    Erfcx — backed by gamma.c in the reference)."""

    nfunc = staticmethod(_sp.erfcx)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        from aesara_tpu.scalar.ops import constant as s_const, mul, sub

        # d/dx erfcx = 2 x erfcx(x) - 2/sqrt(pi)
        two_over_sqrt_pi = s_const(2.0 / np.sqrt(np.pi))
        return [mul(gz, sub(mul(s_const(2.0), mul(x, erfcx(x))), two_over_sqrt_pi))]


class OwensT(BinaryScalarOp):
    """Owen's T function T(h, a) (reference ``scalar/math.py`` — scipy)."""

    nfunc = staticmethod(_sp.owens_t)
    output_types_preference = staticmethod(upgrade_to_float_no_complex)


class Hyp2F1Der(ScalarOp):
    """d/d{a|b|c} 2F1 by central difference (reference Hyp2F1Der)."""

    nin = 5  # a, b, c, z, wrt(0/1/2)
    nout = 1
    output_types_preference = staticmethod(upgrade_to_float_no_complex)

    def impl(self, a, b, c, z, wrt):
        import scipy.special as sps

        eps = 1e-6
        args = [float(a), float(b), float(c)]
        i = int(wrt)
        hi, lo = list(args), list(args)
        hi[i] += eps
        lo[i] -= eps
        return (sps.hyp2f1(*hi, float(z)) - sps.hyp2f1(*lo, float(z))) / (2 * eps)


erfcx = Erfcx(name="erfcx")
owens_t = OwensT(name="owens_t")
hyp2f1_der = Hyp2F1Der(name="hyp2f1_der")
