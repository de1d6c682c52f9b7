"""The distribution zoo (reference ``aesara/tensor/random/basic.py:80-2197``,
~45 distributions).  Each op's ``rng_fn`` is expressed in jax.random —
it serves BOTH as the NumPy oracle (run on host keys in ``perform``) and
as the XLA lowering body, so the two paths are draw-for-draw identical.
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.config import config
from aesara_tpu.tensor.random.op import RandomVariable


def _bshape(size_tuple, *params):
    """Resolve the draw shape: explicit size, else broadcast of params."""
    if size_tuple is not None:
        return tuple(size_tuple)
    shapes = [np.shape(p) for p in params]
    return tuple(np.broadcast_shapes(*shapes)) if shapes else ()


def _jnp(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


class UniformRV(RandomVariable):
    def __init__(self):
        super().__init__("uniform", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, low, high):
        import jax.random as jr

        shape = _bshape(size, low, high)
        return jr.uniform(key, shape) * (_jnp(high) - _jnp(low)) + _jnp(low)


class NormalRV(RandomVariable):
    def __init__(self):
        super().__init__("normal", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, loc, scale):
        import jax.random as jr

        shape = _bshape(size, loc, scale)
        return jr.normal(key, shape) * _jnp(scale) + _jnp(loc)


class StandardNormalRV(RandomVariable):
    def __init__(self):
        super().__init__("standard_normal", 0, (), "floatX")

    def rng_fn(self, key, size):
        import jax.random as jr

        return jr.normal(key, _bshape(size))


class LogNormalRV(RandomVariable):
    def __init__(self):
        super().__init__("lognormal", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, mean, sigma):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, mean, sigma)
        return jnp.exp(jr.normal(key, shape) * _jnp(sigma) + _jnp(mean))


class HalfNormalRV(RandomVariable):
    def __init__(self):
        super().__init__("halfnormal", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, loc, scale):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, loc, scale)
        return jnp.abs(jr.normal(key, shape)) * _jnp(scale) + _jnp(loc)


class BernoulliRV(RandomVariable):
    def __init__(self):
        super().__init__("bernoulli", 0, (0,), "int64")

    def rng_fn(self, key, size, p):
        import jax.random as jr

        shape = _bshape(size, p)
        return jr.bernoulli(key, _jnp(p), shape)


class BinomialRV(RandomVariable):
    def __init__(self):
        super().__init__("binomial", 0, (0, 0), "int64")

    def rng_fn(self, key, size, n, p):
        import jax.random as jr

        shape = _bshape(size, n, p)
        return jr.binomial(key, _jnp(n).astype("float32"), _jnp(p), shape)


class BetaRV(RandomVariable):
    def __init__(self):
        super().__init__("beta", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, a, b):
        import jax.random as jr

        shape = _bshape(size, a, b)
        return jr.beta(key, _jnp(a), _jnp(b), shape)


class GammaRV(RandomVariable):
    def __init__(self):
        super().__init__("gamma", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, shape_p, scale):
        import jax.random as jr

        shape = _bshape(size, shape_p, scale)
        return jr.gamma(key, _jnp(shape_p), shape) * _jnp(scale)


class ExponentialRV(RandomVariable):
    def __init__(self):
        super().__init__("exponential", 0, (0,), "floatX")

    def rng_fn(self, key, size, scale):
        import jax.random as jr

        shape = _bshape(size, scale)
        return jr.exponential(key, shape) * _jnp(scale)


class WeibullRV(RandomVariable):
    def __init__(self):
        super().__init__("weibull", 0, (0,), "floatX")

    def rng_fn(self, key, size, shape_p):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, shape_p)
        u = jr.uniform(key, shape, minval=1e-7, maxval=1.0)
        return jnp.power(-jnp.log(u), 1.0 / _jnp(shape_p))


class LaplaceRV(RandomVariable):
    def __init__(self):
        super().__init__("laplace", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, loc, scale):
        import jax.random as jr

        shape = _bshape(size, loc, scale)
        return jr.laplace(key, shape) * _jnp(scale) + _jnp(loc)


class LogisticRV(RandomVariable):
    def __init__(self):
        super().__init__("logistic", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, loc, scale):
        import jax.random as jr

        shape = _bshape(size, loc, scale)
        return jr.logistic(key, shape) * _jnp(scale) + _jnp(loc)


class CauchyRV(RandomVariable):
    def __init__(self):
        super().__init__("cauchy", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, loc, scale):
        import jax.random as jr

        shape = _bshape(size, loc, scale)
        return jr.cauchy(key, shape) * _jnp(scale) + _jnp(loc)


class HalfCauchyRV(RandomVariable):
    def __init__(self):
        super().__init__("halfcauchy", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, loc, scale):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, loc, scale)
        return jnp.abs(jr.cauchy(key, shape)) * _jnp(scale) + _jnp(loc)


class ChiSquareRV(RandomVariable):
    def __init__(self):
        super().__init__("chisquare", 0, (0,), "floatX")

    def rng_fn(self, key, size, df):
        import jax.random as jr

        shape = _bshape(size, df)
        return jr.chisquare(key, _jnp(df), shape=shape)


class GumbelRV(RandomVariable):
    def __init__(self):
        super().__init__("gumbel", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, loc, scale):
        import jax.random as jr

        shape = _bshape(size, loc, scale)
        return jr.gumbel(key, shape) * _jnp(scale) + _jnp(loc)


class ParetoRV(RandomVariable):
    def __init__(self):
        super().__init__("pareto", 0, (0,), "floatX")

    def rng_fn(self, key, size, b):
        import jax.random as jr

        shape = _bshape(size, b)
        return jr.pareto(key, _jnp(b), shape=shape)


class PoissonRV(RandomVariable):
    def __init__(self):
        super().__init__("poisson", 0, (0,), "int64")

    def rng_fn(self, key, size, lam):
        import jax.random as jr

        shape = _bshape(size, lam)
        return jr.poisson(key, _jnp(lam), shape=shape)


class GeometricRV(RandomVariable):
    def __init__(self):
        super().__init__("geometric", 0, (0,), "int64")

    def rng_fn(self, key, size, p):
        import jax.random as jr

        shape = _bshape(size, p)
        return jr.geometric(key, _jnp(p), shape=shape)


class StudentTRV(RandomVariable):
    def __init__(self):
        super().__init__("t", 0, (0, 0, 0), "floatX")

    def rng_fn(self, key, size, df, loc, scale):
        import jax.random as jr

        shape = _bshape(size, df, loc, scale)
        return jr.t(key, _jnp(df), shape) * _jnp(scale) + _jnp(loc)


class TruncNormalRV(RandomVariable):
    def __init__(self):
        super().__init__("truncated_normal", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, lower, upper):
        import jax.random as jr

        shape = _bshape(size, lower, upper)
        return jr.truncated_normal(key, _jnp(lower), _jnp(upper), shape)


class VonMisesRV(RandomVariable):
    def __init__(self):
        super().__init__("vonmises", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, mu, kappa):
        # Best & Fisher (1979) rejection, batched with a fixed proposal
        # budget: 16 rounds x ~66% acceptance -> miss prob < 1e-7 per
        # sample; XLA-friendly (no data-dependent loop).
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, mu, kappa)
        mu = _jnp(mu)
        kappa_in = _jnp(kappa)
        # Best-Fisher is numerically unstable for tiny kappa (catastrophic
        # cancellation in rho); the distribution is uniform there anyway
        kappa = jnp.maximum(kappa_in, 1e-2)
        rounds = 16
        u = jr.uniform(key, (rounds, 3) + tuple(shape))
        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa**2)
        rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa)
        r = (1.0 + rho**2) / (2.0 * rho)
        z = jnp.cos(jnp.pi * u[:, 0])
        f = (1.0 + r * z) / (r + z)
        c = kappa * (r - f)
        accept = jnp.logical_or(
            c * (2.0 - c) - u[:, 1] > 0.0,
            jnp.log(c / jnp.maximum(u[:, 1], 1e-30)) + 1.0 - c >= 0.0,
        )
        # first accepted round per sample
        first = jnp.argmax(accept, axis=0)
        f_sel = jnp.take_along_axis(f, first[None], axis=0)[0]
        u3_sel = jnp.take_along_axis(u[:, 2], first[None], axis=0)[0]
        theta = jnp.sign(u3_sel - 0.5) * jnp.arccos(jnp.clip(f_sel, -1.0, 1.0))
        out = mu + theta
        # tiny-kappa limit: exactly uniform on the circle
        uniform_draw = jnp.pi * (2.0 * u[0, 0] - 1.0) + mu
        out = jnp.where(kappa_in < 1e-2, uniform_draw, out)
        # wrap to [-pi, pi] (numpy.random.vonmises convention)
        return jnp.mod(out + jnp.pi, 2.0 * jnp.pi) - jnp.pi


class RandIntRV(RandomVariable):
    def __init__(self, name="randint"):
        super().__init__(name, 0, (0, 0), "int64")

    def rng_fn(self, key, size, low, high):
        import jax.random as jr

        shape = _bshape(size, low, high)
        return jr.randint(key, shape, _jnp(low), _jnp(high))


class IntegersRV(RandIntRV):
    def __init__(self):
        super().__init__("integers")


class CategoricalRV(RandomVariable):
    """Index draws from a probability vector (last axis)."""

    def __init__(self):
        super().__init__("categorical", 0, (1,), "int64")

    def rng_fn(self, key, size, p):
        import jax.numpy as jnp
        import jax.random as jr

        p = _jnp(p)
        shape = size if size is not None else np.shape(p)[:-1]
        return jr.categorical(key, jnp.log(p), shape=tuple(shape) if shape else ())


class ChoiceRV(RandomVariable):
    __props__ = RandomVariable.__props__ + ("replace",)

    def __init__(self, replace: bool = True):
        super().__init__("choice", 0, (1,), None)
        self.replace = bool(replace)

    def __call__(self, *dist_params, replace=None, **kwargs):
        if replace is not None and bool(replace) != self.replace:
            return ChoiceRV(replace=replace)(*dist_params, **kwargs)
        return super().__call__(*dist_params, **kwargs)

    def make_node(self, rng, size, a, *rest):
        from aesara_tpu.tensor.basic import as_tensor_variable

        a = as_tensor_variable(a)
        op = ChoiceRV(replace=self.replace)
        op.dtype = a.type.dtype
        return RandomVariable.make_node(op, rng, size, a, *rest)

    def rng_fn(self, key, size, a, p=None):
        import jax.numpy as jnp
        import jax.random as jr

        shape = tuple(size) if size is not None else ()
        a = _jnp(a)
        if not self.replace:
            # without replacement needs the whole population ordering —
            # jr.choice(replace=False); a concrete population size is
            # required (as in the reference's Generator.choice)
            return jr.choice(key, a if a.ndim else int(a), shape=shape,
                             replace=False,
                             p=None if p is None else _jnp(p))
        # with replacement: randint/categorical + gather keeps a scalar
        # ``a`` traced-safe under jit (jr.choice needs a concrete size)
        if p is None:
            if a.ndim == 0:
                return jr.randint(key, shape, 0, a)
            idx = jr.randint(key, shape, 0, a.shape[0])
            return a[idx]
        idx = jr.categorical(key, jnp.log(_jnp(p)), shape=shape)
        if a.ndim == 0:
            return idx.astype(a.dtype)
        return a[idx]


class PermutationRV(RandomVariable):
    def __init__(self):
        super().__init__("permutation", 1, (1,), None)

    def make_node(self, rng, size, x):
        from aesara_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        if x.type.ndim == 0:
            # permutation(n) == shuffled arange(n); the output LENGTH is
            # n's value, so n must be constant (XLA static shapes) —
            # materialize the arange here and reuse the array path
            from aesara_tpu.tensor.basic import get_scalar_constant_value

            try:
                n = int(get_scalar_constant_value(x))
            except Exception:
                raise NotImplementedError(
                    "permutation(n) needs a constant n: the output length "
                    "is n's value (pass an explicit arange otherwise)"
                )
            x = as_tensor_variable(np.arange(n, dtype=x.type.dtype))
        op = PermutationRV()
        op.dtype = x.type.dtype
        return RandomVariable.make_node(op, rng, size, x)

    def _supp_shape_from_params(self, dist_params, param_shapes=None):
        # the support is the LAST axis (review finding: shape[0] was
        # wrong for ndim > 1 inputs — permutation shuffles axis 0 but
        # batch dims come first in the output type)
        return (dist_params[0].type.shape[-1],)

    def rng_fn(self, key, size, x):
        import jax.random as jr

        return jr.permutation(key, _jnp(x))


class DirichletRV(RandomVariable):
    def __init__(self):
        super().__init__("dirichlet", 1, (1,), "floatX")

    def _supp_shape_from_params(self, dist_params, param_shapes=None):
        return (dist_params[0].type.shape[-1],)

    def rng_fn(self, key, size, alpha):
        import jax.random as jr

        alpha = _jnp(alpha)
        shape = tuple(size) if size is not None else np.shape(alpha)[:-1]
        return jr.dirichlet(key, alpha, shape=shape if shape else None)


class MultivariateNormalRV(RandomVariable):
    def __init__(self):
        super().__init__("multivariate_normal", 1, (1, 2), "floatX")

    def _supp_shape_from_params(self, dist_params, param_shapes=None):
        return (dist_params[0].type.shape[-1],)

    def rng_fn(self, key, size, mean, cov):
        import jax.random as jr

        shape = tuple(size) if size is not None else None
        return jr.multivariate_normal(key, _jnp(mean), _jnp(cov), shape=shape)


class MultinomialRV(RandomVariable):
    def __init__(self):
        super().__init__("multinomial", 1, (0, 1), "int64")

    def _supp_shape_from_params(self, dist_params, param_shapes=None):
        return (dist_params[1].type.shape[-1],)

    def rng_fn(self, key, size, n, p):
        import jax.random as jr

        try:
            fn = jr.multinomial
        except AttributeError:
            raise NotImplementedError("jax.random.multinomial unavailable")
        p = _jnp(p)
        # jax's shape is the FULL result shape including the event axis
        shape = tuple(size) + (p.shape[-1],) if size is not None else None
        res = fn(key, _jnp(n).astype("float32"), p, shape=shape)
        return res


uniform = UniformRV()
normal = NormalRV()
standard_normal = StandardNormalRV()
lognormal = LogNormalRV()
halfnormal = HalfNormalRV()
bernoulli = BernoulliRV()
binomial = BinomialRV()
beta = BetaRV()
gamma = GammaRV()
exponential = ExponentialRV()
weibull = WeibullRV()
laplace = LaplaceRV()
logistic = LogisticRV()
cauchy = CauchyRV()
halfcauchy = HalfCauchyRV()
chisquare = ChiSquareRV()
gumbel = GumbelRV()
pareto = ParetoRV()
poisson = PoissonRV()
geometric = GeometricRV()
t = StudentTRV()
studentt = t  # reference alias
truncated_normal = TruncNormalRV()
vonmises = VonMisesRV()
randint = RandIntRV()
integers = IntegersRV()
categorical = CategoricalRV()
choice = ChoiceRV()
permutation = PermutationRV()
dirichlet = DirichletRV()
multivariate_normal = MultivariateNormalRV()
multinomial = MultinomialRV()


# --- reference inventory completions (random/basic.py tail ops) --------------

class RayleighRV(RandomVariable):
    def __init__(self):
        super().__init__("rayleigh", 0, (0,), "floatX")

    def rng_fn(self, key, size, scale):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, scale)
        # inverse CDF: scale * sqrt(-2 ln U)
        u = jr.uniform(key, shape, minval=1e-7, maxval=1.0)
        return _jnp(scale) * jnp.sqrt(-2.0 * jnp.log(u))


class InvGammaRV(RandomVariable):
    def __init__(self):
        super().__init__("invgamma", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, shape_p, scale):
        import jax.random as jr

        shape = _bshape(size, shape_p, scale)
        g = jr.gamma(key, _jnp(shape_p), shape)
        return _jnp(scale) / g


class WaldRV(RandomVariable):
    def __init__(self):
        super().__init__("wald", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, mean, scale):
        # Michael, Schucany & Haas (1976) inverse-gaussian transform
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, mean, scale)
        k1, k2 = jr.split(key)
        mu = _jnp(mean)
        lam = _jnp(scale)
        nu = jr.normal(k1, shape)
        y = nu * nu
        x = (mu + mu * mu * y / (2.0 * lam)
             - mu / (2.0 * lam) * jnp.sqrt(4.0 * mu * lam * y + mu * mu * y * y))
        z = jr.uniform(k2, shape)
        return jnp.where(z <= mu / (mu + x), x, mu * mu / x)


class TriangularRV(RandomVariable):
    def __init__(self):
        super().__init__("triangular", 0, (0, 0, 0), "floatX")

    def rng_fn(self, key, size, left, mode, right):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, left, mode, right)
        l, m, r = _jnp(left), _jnp(mode), _jnp(right)
        u = jr.uniform(key, shape)
        fc = (m - l) / (r - l)
        return jnp.where(
            u < fc,
            l + jnp.sqrt(u * (r - l) * (m - l)),
            r - jnp.sqrt((1.0 - u) * (r - l) * (r - m)),
        )


class TruncExponRV(RandomVariable):
    def __init__(self):
        super().__init__("truncexpon", 0, (0, 0, 0), "floatX")

    def rng_fn(self, key, size, b, loc, scale):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, b, loc, scale)
        u = jr.uniform(key, shape)
        bb = _jnp(b)
        # inverse CDF of exponential truncated to [0, b]
        x = -jnp.log1p(-u * (1.0 - jnp.exp(-bb)))
        return _jnp(loc) + _jnp(scale) * x


class PowerRV(RandomVariable):
    def __init__(self):
        super().__init__("power", 0, (0,), "floatX")

    def rng_fn(self, key, size, a):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, a)
        u = jr.uniform(key, shape, minval=1e-7, maxval=1.0)
        return jnp.power(u, 1.0 / _jnp(a))


class FRV(RandomVariable):
    def __init__(self):
        super().__init__("f", 0, (0, 0), "floatX")

    def rng_fn(self, key, size, dfn, dfd):
        import jax.random as jr

        shape = _bshape(size, dfn, dfd)
        k1, k2 = jr.split(key)
        num = jr.gamma(k1, _jnp(dfn) / 2.0, shape) / (_jnp(dfn) / 2.0)
        den = jr.gamma(k2, _jnp(dfd) / 2.0, shape) / (_jnp(dfd) / 2.0)
        return num / den


class GenGammaRV(RandomVariable):
    def __init__(self):
        super().__init__("gengamma", 0, (0, 0, 0), "floatX")

    def rng_fn(self, key, size, alpha, p, lambd):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, alpha, p, lambd)
        g = jr.gamma(key, _jnp(alpha) / _jnp(p), shape)
        return _jnp(lambd) * jnp.power(g, 1.0 / _jnp(p))


class NegBinomialRV(RandomVariable):
    def __init__(self):
        super().__init__("nbinom", 0, (0, 0), "int64")

    def rng_fn(self, key, size, n, p):
        # gamma-Poisson mixture
        import jax.random as jr

        shape = _bshape(size, n, p)
        k1, k2 = jr.split(key)
        pp = _jnp(p)
        lam = jr.gamma(k1, _jnp(n), shape) * (1.0 - pp) / pp
        return jr.poisson(k2, lam, shape)


class BetaBinomialRV(RandomVariable):
    def __init__(self):
        super().__init__("betabinom", 0, (0, 0, 0), "int64")

    def rng_fn(self, key, size, n, a, b):
        import jax.random as jr

        shape = _bshape(size, n, a, b)
        k1, k2 = jr.split(key)
        p = jr.beta(k1, _jnp(a), _jnp(b), shape)
        return jr.binomial(k2, _jnp(n).astype("float32"), p, shape=shape).astype("int64")


class ZipfRV(RandomVariable):
    """Devroye's rejection sampler, batched with a fixed proposal budget
    (the vonmises pattern)."""

    def __init__(self):
        super().__init__("zipf", 0, (0,), "int64")

    def rng_fn(self, key, size, a):
        import jax.numpy as jnp
        import jax.random as jr

        shape = _bshape(size, a)
        aa = _jnp(a)
        rounds = 32
        u = jr.uniform(key, (rounds, 2) + tuple(shape), minval=1e-12, maxval=1.0)
        am1 = aa - 1.0
        b = jnp.power(2.0, am1)
        x = jnp.floor(jnp.power(u[:, 0], -1.0 / am1))
        t = jnp.power(1.0 + 1.0 / x, am1)
        accept = u[:, 1] * x * (t - 1.0) / (b - 1.0) <= t / b
        # guard against float overflow producing inf candidates
        accept = jnp.logical_and(accept, jnp.isfinite(x))
        first = jnp.argmax(accept, axis=0)
        xs = jnp.take_along_axis(x, first[None], axis=0)[0]
        # the tail is legitimately huge for a near 1; saturate instead of
        # letting the float->int64 cast wrap (numpy.random.zipf raises here)
        xs = jnp.clip(xs, 1.0, 2.0**62)
        return xs.astype("int64")


class HyperGeometricRV(RandomVariable):
    """ngood, nbad, nsample → count of good draws without replacement.
    Sequential-urn formulation in a lax.scan over nsample steps (sizes
    must be concrete for the trip count)."""

    def __init__(self):
        super().__init__("hypergeometric", 0, (0, 0, 0), "int64")

    def rng_fn(self, key, size, ngood, nbad, nsample):
        import jax
        import jax.numpy as jnp
        import jax.random as jr

        try:
            steps = int(np.max(np.asarray(nsample)))
        except Exception as e:
            raise NotImplementedError(
                "hypergeometric needs a concrete nsample (the urn scan's "
                "trip count)"
            ) from e
        shape = _bshape(size, ngood, nbad, nsample)
        good0 = jnp.broadcast_to(_jnp(ngood).astype("float32"), shape)
        bad0 = jnp.broadcast_to(_jnp(nbad).astype("float32"), shape)
        ns = jnp.broadcast_to(_jnp(nsample), shape)

        def step(carry, k):
            good, bad, cnt, t = carry
            p = good / jnp.maximum(good + bad, 1.0)
            u = jr.uniform(k, shape)
            active = t < ns
            take_good = jnp.logical_and(u < p, active)
            good = good - take_good
            bad = bad - jnp.logical_and(u >= p, active)
            cnt = cnt + take_good
            return (good, bad, cnt, t + 1), None

        keys = jr.split(key, steps) if steps else jnp.zeros((0, 2), "uint32")
        init = (good0, bad0, jnp.zeros(shape, "int32"), jnp.zeros(shape, "int32"))
        (g, b, cnt, _), _ = jax.lax.scan(step, init, keys)
        return cnt.astype("int64")


rayleigh = RayleighRV()
invgamma = InvGammaRV()
wald = WaldRV()
triangular = TriangularRV()
truncexpon = TruncExponRV()
power = PowerRV()
f = FRV()
gengamma = GenGammaRV()
nbinom = NegBinomialRV()
negative_binomial = nbinom
betabinom = BetaBinomialRV()
zipf = ZipfRV()
hypergeometric = HyperGeometricRV()


def standard_gamma(shape, size=None, rng=None, **kw):
    return gamma(shape, 1.0, size=size, rng=rng, **kw)


def standard_exponential(size=None, rng=None, **kw):
    return exponential(1.0, size=size, rng=rng, **kw)


def standard_cauchy(size=None, rng=None, **kw):
    return cauchy(0.0, 1.0, size=size, rng=rng, **kw)


standard_t = t


def random(size=None, rng=None, **kw):
    """U[0, 1) (reference alias for uniform with defaults)."""
    return uniform(0.0, 1.0, size=size, rng=rng, **kw)
