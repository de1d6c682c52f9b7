"""Random-variable case matrices (VERDICT r3 #5): per-distribution
grids over parameter broadcasting, explicit/inferred sizes, dtype
overrides, and the backend-parity contract — py and XLA draws are
BIT-IDENTICAL (the threefry formulation is the single source of truth
for both paths, SURVEY §2.5 random).

Reference breadth model: ``/root/reference/tests/tensor/random/test_basic.py``
(one test per distribution × param grid).
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.tensor.random.utils import RandomStream

rng = np.random.default_rng(64)


def draw(dist, backend="JAX", seed=123, **kwargs):
    s = RandomStream(seed=seed)
    v = getattr(s, dist)(**kwargs)
    return np.asarray(function([], v, mode=backend)())


# ---------------------------------------------------------------------------
# backend bit-parity across the full stream surface
# ---------------------------------------------------------------------------

PARITY_GRID = [
    ("uniform", dict(low=-1.0, high=3.0, size=(7,))),
    ("normal", dict(loc=2.0, scale=0.5, size=(3, 4))),
    ("standard_normal", dict(size=(5,))),
    ("lognormal", dict(mean=0.1, sigma=0.7, size=(6,))),
    ("bernoulli", dict(p=0.3, size=(10,))),
    ("binomial", dict(n=7, p=0.4, size=(8,))),
    ("beta", dict(a=2.0, b=3.0, size=(5,))),
    ("gamma", dict(shape=2.5, scale=2.0, size=(5,))),
    ("exponential", dict(scale=1.7, size=(6,))),
    ("laplace", dict(loc=0.0, scale=2.0, size=(5,))),
    ("logistic", dict(loc=1.0, scale=0.5, size=(5,))),
    ("cauchy", dict(loc=0.0, scale=1.0, size=(5,))),
    ("chisquare", dict(df=3.0, size=(5,))),
    ("gumbel", dict(loc=0.5, scale=1.2, size=(5,))),
    ("poisson", dict(lam=6.0, size=(9,))),
    ("geometric", dict(p=0.35, size=(9,))),
    ("randint", dict(low=0, high=50, size=(12,))),
    ("categorical", dict(p=np.array([0.2, 0.5, 0.3]), size=(11,))),
    ("halfnormal", dict(loc=0.0, scale=1.5, size=(5,))),
    ("halfcauchy", dict(loc=0.0, scale=1.0, size=(5,))),
    ("weibull", dict(shape=1.8, size=(5,))),
    ("pareto", dict(b=3.0, size=(5,))),
    ("standard_t", dict(df=5.0, size=(5,))),
    ("vonmises", dict(mu=0.5, kappa=2.0, size=(5,))),
    ("rayleigh", dict(scale=2.0, size=(5,))),
    ("invgamma", dict(shape=3.0, scale=1.0, size=(5,))),
    ("wald", dict(mean=2.0, scale=1.0, size=(5,))),
    ("triangular", dict(left=-1.0, mode=0.5, right=2.0, size=(5,))),
    ("truncated_normal", dict(lower=-1.5, upper=1.5, size=(5,))),
    ("dirichlet", dict(alpha=np.array([2.0, 3.0, 4.0]), size=(4,))),
    ("multivariate_normal", dict(mean=np.zeros(2),
                                 cov=np.array([[2.0, 0.3], [0.3, 1.0]]),
                                 size=(5,))),
    ("multinomial", dict(n=12, pvals=np.array([0.3, 0.3, 0.4]),
                         size=(6,))),
]


@pytest.mark.parametrize("dist,kwargs", PARITY_GRID,
                         ids=[g[0] for g in PARITY_GRID])
def test_py_jax_bit_parity(dist, kwargs):
    """Same seed → the SAME numbers from the py oracle and the XLA
    lowering (both run the one threefry formulation)."""
    a = draw(dist, backend="JAX", **kwargs)
    b = draw(dist, backend="PY", **kwargs)
    np.testing.assert_allclose(a.astype("float64"), b.astype("float64"),
                               rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize("dist,kwargs", PARITY_GRID[:8],
                         ids=[g[0] for g in PARITY_GRID[:8]])
def test_seed_determinism_and_divergence(dist, kwargs):
    a = draw(dist, seed=5, **kwargs)
    b = draw(dist, seed=5, **kwargs)
    c = draw(dist, seed=6, **kwargs)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c), "different seeds must differ"


# ---------------------------------------------------------------------------
# parameter broadcasting and size inference
# ---------------------------------------------------------------------------

class TestParamBroadcast:
    def test_vector_params_infer_size(self):
        locs = np.array([0.0, 10.0, -10.0, 100.0])
        r = draw("normal", loc=locs, scale=1e-3, size=None)
        assert r.shape == (4,)
        np.testing.assert_allclose(r, locs, atol=0.1)

    def test_matrix_params(self):
        locs = np.arange(6.0).reshape(2, 3) * 10
        r = draw("normal", loc=locs, scale=1e-3, size=None)
        assert r.shape == (2, 3)
        np.testing.assert_allclose(r, locs, atol=0.1)

    def test_size_broadcasts_params(self):
        """size=(5, 3) with a (3,)-param row: each row uses the params."""
        lows = np.array([0.0, 100.0, 200.0])
        r = draw("uniform", low=lows, high=lows + 1.0, size=(5, 3))
        assert r.shape == (5, 3)
        for j, lo in enumerate(lows):
            assert ((r[:, j] >= lo) & (r[:, j] <= lo + 1.0)).all()

    def test_scalar_size_none_gives_scalar(self):
        r = draw("normal", loc=0.0, scale=1.0, size=None)
        assert r.shape == ()

    def test_incompatible_size_raises(self):
        s = RandomStream(seed=0)
        with pytest.raises(Exception):
            v = s.normal(loc=np.zeros(3), scale=1.0, size=(4,))
            function([], v, mode="PY")()

    def test_mvn_batched_mean(self):
        means = np.array([[0.0, 0.0], [50.0, -50.0]])
        cov = np.eye(2) * 1e-4
        r = draw("multivariate_normal", mean=means, cov=cov, size=None)
        assert r.shape == (2, 2)
        np.testing.assert_allclose(r, means, atol=0.1)


# ---------------------------------------------------------------------------
# dtype control
# ---------------------------------------------------------------------------

class TestDtypes:
    @pytest.mark.parametrize("dtype", ["float32", "float64"])
    def test_float_dtype_override(self, dtype):
        r = draw("uniform", low=0.0, high=1.0, size=(5,), dtype=dtype)
        assert str(r.dtype) == dtype

    def test_default_float_is_floatX(self):
        from aesara_tpu.config import config

        r = draw("normal", loc=0.0, scale=1.0, size=(3,))
        assert str(r.dtype) == config.floatX

    @pytest.mark.parametrize("dist,kwargs,kind", [
        ("bernoulli", dict(p=0.5, size=(6,)), "i"),
        ("poisson", dict(lam=3.0, size=(6,)), "i"),
        ("randint", dict(low=0, high=9, size=(6,)), "i"),
        ("geometric", dict(p=0.4, size=(6,)), "i"),
        ("categorical", dict(p=np.array([0.5, 0.5]), size=(6,)), "i"),
    ])
    def test_discrete_outputs_integral(self, dist, kwargs, kind):
        r = draw(dist, **kwargs)
        assert np.dtype(r.dtype).kind in ("i", "u"), r.dtype
        np.testing.assert_array_equal(r, np.round(r.astype("float64")))


# ---------------------------------------------------------------------------
# support contracts per distribution
# ---------------------------------------------------------------------------

SUPPORT_GRID = [
    ("uniform", dict(low=2.0, high=5.0, size=(200,)),
     lambda r: ((r >= 2.0) & (r <= 5.0)).all()),
    ("beta", dict(a=0.5, b=0.5, size=(200,)),
     lambda r: ((r >= 0) & (r <= 1)).all()),
    ("exponential", dict(scale=2.0, size=(200,)), lambda r: (r >= 0).all()),
    ("gamma", dict(shape=1.5, scale=1.0, size=(200,)),
     lambda r: (r > 0).all()),
    ("chisquare", dict(df=2.0, size=(200,)), lambda r: (r >= 0).all()),
    ("lognormal", dict(mean=0.0, sigma=1.0, size=(200,)),
     lambda r: (r > 0).all()),
    ("halfnormal", dict(loc=0.0, scale=1.0, size=(200,)),
     lambda r: (r >= 0).all()),
    ("rayleigh", dict(scale=1.0, size=(200,)), lambda r: (r >= 0).all()),
    ("wald", dict(mean=1.0, scale=1.0, size=(200,)), lambda r: (r > 0).all()),
    ("pareto", dict(b=2.0, size=(200,)), lambda r: (r >= 1.0 - 1e-9).all()),
    ("triangular", dict(left=-2.0, mode=0.0, right=1.0, size=(200,)),
     lambda r: ((r >= -2.0) & (r <= 1.0)).all()),
    ("truncated_normal", dict(lower=-1.0, upper=1.0, size=(200,)),
     lambda r: ((r >= -1.0) & (r <= 1.0)).all()),
    ("bernoulli", dict(p=0.5, size=(200,)),
     lambda r: np.isin(r, [0, 1]).all()),
    ("binomial", dict(n=5, p=0.5, size=(200,)),
     lambda r: ((r >= 0) & (r <= 5)).all()),
    ("categorical", dict(p=np.array([0.1, 0.6, 0.3]), size=(200,)),
     lambda r: np.isin(r, [0, 1, 2]).all()),
    ("randint", dict(low=3, high=8, size=(200,)),
     lambda r: ((r >= 3) & (r < 8)).all()),
]


@pytest.mark.parametrize("dist,kwargs,check", SUPPORT_GRID,
                         ids=[g[0] for g in SUPPORT_GRID])
def test_support(dist, kwargs, check):
    r = draw(dist, **kwargs)
    assert check(r.astype("float64")), f"{dist} support violated"


# ---------------------------------------------------------------------------
# stream state threading
# ---------------------------------------------------------------------------

class TestStreamState:
    def test_two_draws_one_function_differ(self):
        s = RandomStream(seed=3)
        a = s.normal(size=(4,))
        b = s.normal(size=(4,))
        f = function([], [a, b], mode="JAX")
        ra, rb = f()
        assert not np.allclose(np.asarray(ra), np.asarray(rb))

    def test_sequential_calls_advance_state(self):
        s = RandomStream(seed=3)
        u = s.uniform(size=(4,))
        f = function([], u, mode="JAX")
        draws = [np.asarray(f()) for _ in range(4)]
        for i in range(3):
            assert not np.allclose(draws[i], draws[i + 1])

    def test_independent_streams_differ(self):
        a = draw("normal", seed=1, size=(6,))
        b = draw("normal", seed=2, size=(6,))
        assert not np.allclose(a, b)

    def test_permutation_covers_choice_consistency(self):
        s = RandomStream(seed=9)
        p = s.permutation(at.as_tensor_variable(np.arange(10)))
        f = function([], p, mode="PY")
        r = np.asarray(f())
        np.testing.assert_array_equal(np.sort(r), np.arange(10))

    def test_choice_without_replacement_unique(self):
        s = RandomStream(seed=9)
        c = s.choice(at.as_tensor_variable(np.arange(20)), size=(8,),
                     replace=False)
        f = function([], c, mode="PY")
        r = np.asarray(f())
        assert len(np.unique(r)) == 8
