"""Statistical sanity for the distribution library: sample moments of
10k draws vs analytic moments (reference ``tests/tensor/random/test_basic.py``
fixture style).  One shared compiled sampler per distribution keeps this
fast; tolerances are ~6 sigma of the sample-mean estimator."""

import numpy as np
import pytest

import aesara_tpu as atp
from aesara_tpu.tensor.random.utils import RandomStream


N = 10_000


@pytest.fixture(scope="module")
def draws():
    """Compile once, sample every distribution in one function call."""
    srng = RandomStream(seed=20260816)
    exprs = {
        "uniform": srng.uniform(low=2.0, high=5.0, size=(N,)),
        "normal": srng.normal(loc=3.0, scale=2.0, size=(N,)),
        "lognormal": srng.lognormal(mean=0.0, sigma=0.5, size=(N,)),
        "halfnormal": srng.halfnormal(loc=0.0, scale=1.0, size=(N,)),
        "bernoulli": srng.bernoulli(p=0.3, size=(N,)),
        "binomial": srng.binomial(n=10, p=0.4, size=(N,)),
        "beta": srng.beta(2.0, 5.0, size=(N,)),
        "gamma": srng.gamma(3.0, scale=0.5, size=(N,)),
        "exponential": srng.exponential(scale=2.0, size=(N,)),
        "laplace": srng.laplace(loc=1.0, scale=2.0, size=(N,)),
        "logistic": srng.logistic(loc=0.0, scale=1.0, size=(N,)),
        "chisquare": srng.chisquare(df=4.0, size=(N,)),
        "gumbel": srng.gumbel(loc=0.0, scale=1.0, size=(N,)),
        "poisson": srng.poisson(lam=3.0, size=(N,)),
        "geometric": srng.geometric(p=0.25, size=(N,)),
        "studentt": srng.standard_t(df=10.0, size=(N,)),
        "vonmises": srng.vonmises(mu=0.5, kappa=4.0, size=(N,)),
    }
    names = list(exprs)
    f = atp.function([], [exprs[k] for k in names])
    vals = f()
    return dict(zip(names, [np.asarray(v) for v in vals]))


# (name, analytic mean, analytic std)
EULER = 0.5772156649
CASES = [
    ("uniform", 3.5, np.sqrt(9 / 12)),
    ("normal", 3.0, 2.0),
    ("lognormal", np.exp(0.125), np.sqrt((np.exp(0.25) - 1) * np.exp(0.25))),
    ("halfnormal", np.sqrt(2 / np.pi), np.sqrt(1 - 2 / np.pi)),
    ("bernoulli", 0.3, np.sqrt(0.21)),
    ("binomial", 4.0, np.sqrt(2.4)),
    ("beta", 2 / 7, np.sqrt(2 * 5 / (49 * 8))),
    ("gamma", 1.5, np.sqrt(3) / 2),
    ("exponential", 2.0, 2.0),
    ("laplace", 1.0, np.sqrt(8)),
    ("logistic", 0.0, np.pi / np.sqrt(3)),
    ("chisquare", 4.0, np.sqrt(8)),
    ("gumbel", EULER, np.pi / np.sqrt(6)),
    ("poisson", 3.0, np.sqrt(3)),
    ("studentt", 0.0, np.sqrt(10 / 8)),
]


@pytest.mark.parametrize("name,mean,std", CASES, ids=[c[0] for c in CASES])
def test_moments(draws, name, mean, std):
    x = draws[name]
    assert x.shape == (N,)
    se = std / np.sqrt(N)
    assert abs(x.mean() - mean) < 6 * se, (x.mean(), mean)
    # sample std within 10% (loose: std-of-std depends on kurtosis)
    assert abs(x.std() - std) / std < 0.1, (x.std(), std)


def test_geometric_support(draws):
    x = draws["geometric"]
    assert x.min() >= 1  # NumPy convention: #trials until first success
    assert abs(x.mean() - 4.0) < 0.25


def test_vonmises_support(draws):
    x = draws["vonmises"]
    assert np.all(x >= -np.pi) and np.all(x <= np.pi)
    # circular mean near mu
    ang = np.angle(np.exp(1j * x).mean())
    assert abs(ang - 0.5) < 0.05


def test_bounded_supports(draws):
    assert draws["uniform"].min() >= 2.0 and draws["uniform"].max() <= 5.0
    assert draws["beta"].min() >= 0.0 and draws["beta"].max() <= 1.0
    assert set(np.unique(draws["bernoulli"])) <= {0.0, 1.0}
    assert draws["exponential"].min() >= 0.0
    assert draws["chisquare"].min() >= 0.0


def test_multivariate_normal_cov():
    srng = RandomStream(seed=7)
    mean = np.array([1.0, -2.0], dtype="float32")
    cov = np.array([[2.0, 0.8], [0.8, 1.0]], dtype="float32")
    d = srng.multivariate_normal(mean=mean, cov=cov, size=(5000,))
    x = np.asarray(atp.function([], d)())
    assert x.shape == (5000, 2)
    assert np.allclose(x.mean(axis=0), mean, atol=0.1)
    assert np.allclose(np.cov(x.T), cov, atol=0.15)


def test_dirichlet_simplex():
    srng = RandomStream(seed=8)
    alpha = np.array([2.0, 3.0, 5.0], dtype="float32")
    d = srng.dirichlet(alpha, size=(4000,))
    x = np.asarray(atp.function([], d)())
    assert x.shape == (4000, 3)
    assert np.allclose(x.sum(axis=1), 1.0, atol=1e-5)
    assert np.allclose(x.mean(axis=0), alpha / alpha.sum(), atol=0.02)


def test_multinomial_counts():
    srng = RandomStream(seed=9)
    p = np.array([0.2, 0.3, 0.5], dtype="float32")
    d = srng.multinomial(20, p, size=(3000,))
    x = np.asarray(atp.function([], d)())
    assert x.shape == (3000, 3)
    assert np.all(x.sum(axis=1) == 20)
    assert np.allclose(x.mean(axis=0), 20 * p, atol=0.3)


def test_categorical_frequencies():
    srng = RandomStream(seed=10)
    p = np.array([0.1, 0.6, 0.3], dtype="float32")
    d = srng.categorical(p=p, size=(8000,))
    x = np.asarray(atp.function([], d)())
    freqs = np.bincount(x.astype(int), minlength=3) / x.size
    assert np.allclose(freqs, p, atol=0.02)


def test_permutation_is_permutation():
    srng = RandomStream(seed=11)
    d = srng.permutation(np.arange(50))
    x = np.asarray(atp.function([], d)())
    assert sorted(x.tolist()) == list(range(50))
    assert not np.array_equal(x, np.arange(50))  # astronomically unlikely


def test_vonmises_kappa_extremes():
    """Best-Fisher sampler: finite and in-range for tiny and huge kappa;
    tiny kappa is the uniform limit."""
    from scipy import stats

    srng = RandomStream(seed=5)
    for kappa in (1e-5, 1e-2, 500.0):
        d = srng.vonmises(mu=0.0, kappa=kappa, size=(5000,))
        x = np.asarray(atp.function([], d)())
        assert np.all(np.isfinite(x)), kappa
        assert x.min() >= -np.pi and x.max() <= np.pi, kappa
    d0 = srng.vonmises(mu=0.0, kappa=1e-5, size=(20000,))
    x0 = np.asarray(atp.function([], d0)())
    p = stats.kstest(x0, stats.uniform(loc=-np.pi, scale=2 * np.pi).cdf).pvalue
    assert p > 1e-3, p


def test_vonmises_ks_vs_scipy():
    from scipy import stats

    srng = RandomStream(seed=5)
    for kappa in (0.05, 0.5, 3.0):
        d = srng.vonmises(mu=0.0, kappa=kappa, size=(20000,))
        x = np.asarray(atp.function([], d)())
        p = stats.kstest(x, stats.vonmises(kappa=kappa).cdf).pvalue
        assert p > 1e-3, (kappa, p)


def test_new_stream_methods_finite():
    srng = RandomStream(seed=6)
    for name, kw in [("halfcauchy", {}), ("weibull", {"shape": 2.0}),
                     ("pareto", {"b": 3.0}), ("standard_t", {"df": 5.0}),
                     ("halfnormal", {})]:
        expr = getattr(srng, name)(size=(200,), **kw)
        val = np.asarray(atp.function([], expr)())
        assert val.shape == (200,) and np.all(np.isfinite(val)), name


def test_multinomial_no_size():
    srng = RandomStream(seed=12)
    p = np.array([0.5, 0.5], dtype="float32")
    d = srng.multinomial(10, p)
    v = np.asarray(atp.function([], d)())
    assert v.shape == (2,) and v.sum() == 10


def test_extended_distribution_inventory():
    """The 18 round-1-gap distributions: KS vs scipy for continuous,
    moments/support for discrete (reference random/basic.py tail)."""
    from scipy import stats

    import aesara_tpu.tensor.random.basic as rb

    M = 6000

    def draw(rv, *params):
        return np.asarray(atp.function([], rv(*params, size=(M,)), mode="PY")())

    for name, x, dist in [
        ("rayleigh", draw(rb.rayleigh, 2.0), stats.rayleigh(scale=2)),
        ("invgamma", draw(rb.invgamma, 3.0, 2.0), stats.invgamma(3, scale=2)),
        ("wald", draw(rb.wald, 1.5, 2.0), stats.invgauss(0.75, scale=2.0)),
        ("triangular", draw(rb.triangular, 0.0, 1.0, 4.0),
         stats.triang(0.25, 0, 4)),
        ("truncexpon", draw(rb.truncexpon, 2.0, 0.5, 1.5),
         stats.truncexpon(2.0, 0.5, 1.5)),
        ("power", draw(rb.power, 3.0), stats.powerlaw(3.0)),
        ("f", draw(rb.f, 5.0, 12.0), stats.f(5, 12)),
        ("gengamma", draw(rb.gengamma, 3.0, 2.0, 1.5),
         stats.gengamma(1.5, 2.0, scale=1.5)),
    ]:
        p = stats.kstest(x, dist.cdf).pvalue
        assert p > 1e-3, (name, p)

    x = draw(rb.nbinom, 5.0, 0.4)
    assert abs(x.mean() - 7.5) < 0.4
    x = draw(rb.betabinom, 10, 2.0, 3.0)
    assert abs(x.mean() - 4.0) < 0.2
    x = draw(rb.zipf, 3.0)
    assert x.min() >= 1 and abs((x == 1).mean() - 1 / 1.2020569) < 0.03
    x = draw(rb.hypergeometric, 7, 5, 6)
    ref = stats.hypergeom(12, 7, 6)
    assert abs(x.mean() - ref.mean()) < 0.15
    assert x.min() >= 1 and x.max() <= 6


def test_random_basic_all_parity():
    import ast
    import os

    if not os.path.exists("/root/reference/aesara/tensor/random/basic.py"):
        pytest.skip("reference not mounted")
    tree = ast.parse(open("/root/reference/aesara/tensor/random/basic.py").read())
    names = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if (isinstance(t, ast.Name) and t.id == "__all__"
                        and isinstance(node.value, (ast.List, ast.Tuple))):
                    names = {e.value for e in node.value.elts
                             if isinstance(e, ast.Constant)}
    import aesara_tpu.tensor.random.basic as rb

    miss = sorted(n for n in names if not hasattr(rb, n))
    assert not miss, miss
