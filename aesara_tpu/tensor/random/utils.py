"""``RandomStream``: the user API for random graphs
(reference ``aesara/tensor/random/utils.py:144``).

Each distribution call creates a fresh shared PRNG state (a threefry key
split off the stream's master key) whose ``default_update`` rotates the
key, so compiled functions draw new values every call — the functional
equivalent of the reference's mutated RandomState shareds.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from aesara_tpu.compile.sharedvalue import SharedVariable
from aesara_tpu.config import config
from aesara_tpu.tensor.random import basic as rb
from aesara_tpu.tensor.random.op import RandomGeneratorType, default_rng, random_generator_type


class RandomStream:
    """A factory of seeded random variables."""

    def __init__(self, seed: Optional[int] = None, namespace=None):
        self._master = np.asarray(default_rng(seed), dtype=np.uint32)
        self._counter = 0
        self.state_updates = []  # (shared_rng, new_rng) pairs, parity attr
        self.gen_seedgen = self  # parity alias
        self.default_instance_seed = seed

    def _next_key(self) -> np.ndarray:
        import jax.random as jr

        key = jr.wrap_key_data(self._master)
        sub = jr.fold_in(key, self._counter)
        self._counter += 1
        return np.asarray(jr.key_data(sub), dtype=np.uint32)

    def seed(self, seed: Optional[int] = None):
        self._master = np.asarray(default_rng(seed), dtype=np.uint32)
        self._counter = 0
        for shared_rng, _ in self.state_updates:
            shared_rng.set_value(self._next_key())

    def gen(self, op, *args, size=None, **kwargs):
        rng = SharedVariable(
            random_generator_type, self._next_key(),
            name=f"{op.name}_rng",
        )
        out = op(*args, size=size, rng=rng, **kwargs)
        next_rng = out.owner.outputs[0]
        rng.default_update = next_rng
        self.state_updates.append((rng, next_rng))
        out.rng = rng
        out.update = (rng, next_rng)
        return out

    def updates(self):
        return list(self.state_updates)

    # --- distribution methods -------------------------------------------------
    def uniform(self, low=0.0, high=1.0, size=None, **kw):
        return self.gen(rb.uniform, low, high, size=size, **kw)

    def normal(self, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.normal, loc, scale, size=size, **kw)

    def standard_normal(self, size=None, **kw):
        return self.gen(rb.standard_normal, size=size, **kw)

    def lognormal(self, mean=0.0, sigma=1.0, size=None, **kw):
        return self.gen(rb.lognormal, mean, sigma, size=size, **kw)

    def bernoulli(self, p=0.5, size=None, **kw):
        return self.gen(rb.bernoulli, p, size=size, **kw)

    def binomial(self, n=1, p=0.5, size=None, **kw):
        return self.gen(rb.binomial, n, p, size=size, **kw)

    def beta(self, a, b, size=None, **kw):
        return self.gen(rb.beta, a, b, size=size, **kw)

    def gamma(self, shape, scale=1.0, size=None, **kw):
        return self.gen(rb.gamma, shape, scale, size=size, **kw)

    def exponential(self, scale=1.0, size=None, **kw):
        return self.gen(rb.exponential, scale, size=size, **kw)

    def laplace(self, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.laplace, loc, scale, size=size, **kw)

    def logistic(self, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.logistic, loc, scale, size=size, **kw)

    def cauchy(self, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.cauchy, loc, scale, size=size, **kw)

    def chisquare(self, df, size=None, **kw):
        return self.gen(rb.chisquare, df, size=size, **kw)

    def gumbel(self, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.gumbel, loc, scale, size=size, **kw)

    def poisson(self, lam=1.0, size=None, **kw):
        return self.gen(rb.poisson, lam, size=size, **kw)

    def geometric(self, p, size=None, **kw):
        return self.gen(rb.geometric, p, size=size, **kw)

    def randint(self, low, high=None, size=None, **kw):
        if high is None:
            low, high = 0, low
        return self.gen(rb.randint, low, high, size=size, **kw)

    def integers(self, low, high=None, size=None, **kw):
        if high is None:
            low, high = 0, low
        return self.gen(rb.integers, low, high, size=size, **kw)

    def categorical(self, p, size=None, **kw):
        return self.gen(rb.categorical, p, size=size, **kw)

    def choice(self, a, size=None, replace=True, p=None, **kw):
        op = rb.choice if replace else rb.ChoiceRV(replace=False)
        if p is not None:
            return self.gen(op, a, p, size=size, **kw)
        return self.gen(op, a, size=size, **kw)

    def permutation(self, x, size=None, **kw):
        return self.gen(rb.permutation, x, size=size, **kw)

    def dirichlet(self, alpha, size=None, **kw):
        return self.gen(rb.dirichlet, alpha, size=size, **kw)

    def multivariate_normal(self, mean, cov, size=None, **kw):
        return self.gen(rb.multivariate_normal, mean, cov, size=size, **kw)

    def multinomial(self, n, pvals, size=None, **kw):
        return self.gen(rb.multinomial, n, pvals, size=size, **kw)

    def truncated_normal(self, lower=-2.0, upper=2.0, size=None, **kw):
        return self.gen(rb.truncated_normal, lower, upper, size=size, **kw)

    def halfnormal(self, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.halfnormal, loc, scale, size=size, **kw)

    def halfcauchy(self, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.halfcauchy, loc, scale, size=size, **kw)

    def weibull(self, shape, size=None, **kw):
        # np.random convention: standard Weibull; scale via multiplication
        return self.gen(rb.weibull, shape, size=size, **kw)

    def pareto(self, b, size=None, **kw):
        return self.gen(rb.pareto, b, size=size, **kw)

    def standard_t(self, df, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.studentt, df, loc, scale, size=size, **kw)

    t = standard_t

    def vonmises(self, mu=0.0, kappa=1.0, size=None, **kw):
        return self.gen(rb.vonmises, mu, kappa, size=size, **kw)

    def rayleigh(self, scale=1.0, size=None, **kw):
        return self.gen(rb.rayleigh, scale, size=size, **kw)

    def invgamma(self, shape, scale=1.0, size=None, **kw):
        return self.gen(rb.invgamma, shape, scale, size=size, **kw)

    def wald(self, mean=1.0, scale=1.0, size=None, **kw):
        return self.gen(rb.wald, mean, scale, size=size, **kw)

    def triangular(self, left, mode, right, size=None, **kw):
        return self.gen(rb.triangular, left, mode, right, size=size, **kw)

    def truncexpon(self, b, loc=0.0, scale=1.0, size=None, **kw):
        return self.gen(rb.truncexpon, b, loc, scale, size=size, **kw)

    def power(self, a, size=None, **kw):
        return self.gen(rb.power, a, size=size, **kw)

    def f(self, dfn, dfd, size=None, **kw):
        return self.gen(rb.f, dfn, dfd, size=size, **kw)

    def gengamma(self, alpha=1.0, p=1.0, lambd=1.0, size=None, **kw):
        return self.gen(rb.gengamma, alpha, p, lambd, size=size, **kw)

    def negative_binomial(self, n, p, size=None, **kw):
        return self.gen(rb.nbinom, n, p, size=size, **kw)

    nbinom = negative_binomial

    def betabinom(self, n, a, b, size=None, **kw):
        return self.gen(rb.betabinom, n, a, b, size=size, **kw)

    def zipf(self, a, size=None, **kw):
        return self.gen(rb.zipf, a, size=size, **kw)

    def hypergeometric(self, ngood, nbad, nsample, size=None, **kw):
        return self.gen(rb.hypergeometric, ngood, nbad, nsample,
                        size=size, **kw)

    def standard_gamma(self, shape, size=None, **kw):
        return self.gen(rb.gamma, shape, 1.0, size=size, **kw)

    def standard_exponential(self, size=None, **kw):
        return self.gen(rb.exponential, 1.0, size=size, **kw)

    def standard_cauchy(self, size=None, **kw):
        return self.gen(rb.cauchy, 0.0, 1.0, size=size, **kw)

    def random(self, size=None, **kw):
        return self.gen(rb.uniform, 0.0, 1.0, size=size, **kw)


#: parity aliases with the reference
RandomStreams = RandomStream


# reference random/utils exports
from aesara_tpu.tensor.random.op import normalize_size_param  # noqa: E402,F401


def params_broadcast_shapes(param_shapes, ndims_params):
    """Broadcast batch shapes of distribution params (reference
    ``params_broadcast_shapes``): each param keeps its core dims, batch
    dims broadcast together."""
    from aesara_tpu.tensor.extra_ops import broadcast_shape

    batch_shapes = [tuple(s[: len(s) - nd]) if nd else tuple(s)
                    for s, nd in zip(param_shapes, ndims_params)]
    bcast = broadcast_shape(*batch_shapes, arrays_are_shapes=True) \
        if batch_shapes else ()
    return [tuple(bcast) + tuple(s[len(s) - nd:] if nd else ())
            for s, nd in zip(param_shapes, ndims_params)]


def broadcast_params(params, ndims_params):
    """Broadcast distribution params against each other over their batch
    dims (reference ``broadcast_params``)."""
    from aesara_tpu.tensor.basic import as_tensor_variable
    from aesara_tpu.tensor.extra_ops import broadcast_shape, broadcast_to

    params = [as_tensor_variable(p) for p in params]
    shapes = [tuple(p.shape[i] for i in range(p.type.ndim)) for p in params]
    target = params_broadcast_shapes(shapes, ndims_params)
    return [broadcast_to(p, t) if len(t) else p
            for p, t in zip(params, target)]
