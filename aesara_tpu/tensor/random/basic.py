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
    def __init__(self):
        super().__init__("choice", 0, (1,), None)

    def make_node(self, rng, size, a, *rest):
        from aesara_tpu.tensor.basic import as_tensor_variable

        a = as_tensor_variable(a)
        op = ChoiceRV()
        op.dtype = a.type.dtype
        return RandomVariable.make_node(op, rng, size, a, *rest)

    def rng_fn(self, key, size, a, p=None):
        import jax.random as jr

        shape = tuple(size) if size is not None else ()
        return jr.choice(key, _jnp(a), shape=shape, p=None if p is None else _jnp(p))


class PermutationRV(RandomVariable):
    def __init__(self):
        super().__init__("permutation", 1, (1,), None)

    def make_node(self, rng, size, x):
        from aesara_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        op = PermutationRV()
        op.dtype = x.type.dtype
        return RandomVariable.make_node(op, rng, size, x)

    def _supp_shape_from_params(self, dist_params, param_shapes=None):
        return (dist_params[0].type.shape[0],)

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
