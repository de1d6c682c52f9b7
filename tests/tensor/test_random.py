"""RandomVariable / RandomStream tests (reference ``tests/tensor/random``)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.tensor.random.utils import RandomStream


def test_draws_change_and_reseed():
    srng = RandomStream(seed=7)
    u = srng.uniform(size=(4,))
    f = function([], u, mode="JAX")
    a, b = f(), f()
    assert not np.allclose(a, b)
    srng.seed(7)
    c = f()
    np.testing.assert_allclose(a, c)


def test_py_and_jax_draws_identical():
    for dist, args in [
        ("uniform", dict(low=0.0, high=2.0, size=(5,))),
        ("normal", dict(loc=1.0, scale=3.0, size=(5,))),
        ("bernoulli", dict(p=0.4, size=(8,))),
        ("gamma", dict(shape=2.0, scale=1.5, size=(5,))),
        ("poisson", dict(lam=4.0, size=(6,))),
    ]:
        s1 = RandomStream(seed=11)
        s2 = RandomStream(seed=11)
        v1 = getattr(s1, dist)(**args)
        v2 = getattr(s2, dist)(**args)
        fj = function([], v1, mode="JAX")
        fp = function([], v2, mode="PY")
        np.testing.assert_allclose(np.asarray(fj()), np.asarray(fp()), rtol=1e-6)


def test_statistics():
    srng = RandomStream(seed=0)
    n = srng.normal(loc=3.0, scale=2.0, size=(20000,))
    f = function([], [n.mean(), n.std()], mode="JAX")
    m, s = f()
    assert abs(float(m) - 3.0) < 0.1
    assert abs(float(s) - 2.0) < 0.1


def test_broadcast_params():
    srng = RandomStream(seed=1)
    locs = np.array([0.0, 100.0], dtype="float32")
    n = srng.normal(loc=locs, scale=0.1)
    f = function([], n, mode="JAX")
    v = np.asarray(f())
    assert v.shape == (2,)
    assert abs(v[0]) < 5 and abs(v[1] - 100) < 5


def test_int_dists():
    srng = RandomStream(seed=2)
    r = srng.randint(0, 5, size=(100,))
    f = function([], r, mode="JAX")
    v = np.asarray(f())
    assert v.min() >= 0 and v.max() < 5
    assert str(v.dtype).startswith("int")


def test_dirichlet_and_mvn():
    srng = RandomStream(seed=3)
    d = srng.dirichlet(np.array([2.0, 3.0, 4.0], dtype="float64"))
    f = function([], d, mode="JAX")
    v = np.asarray(f())
    assert v.shape == (3,)
    np.testing.assert_allclose(v.sum(), 1.0, rtol=1e-5)

    mvn = srng.multivariate_normal(np.zeros(2, "float64"), np.eye(2), size=(5,))
    fm = function([], mvn, mode="JAX")
    assert np.asarray(fm()).shape == (5, 2)


def test_permutation_choice():
    srng = RandomStream(seed=4)
    p = srng.permutation(at.constant(np.arange(6)))
    f = function([], p, mode="JAX")
    v = np.asarray(f())
    assert sorted(v.tolist()) == list(range(6))

    c = srng.choice(at.constant(np.arange(10).astype("float64")), size=(4,))
    fc = function([], c, mode="JAX")
    assert np.asarray(fc()).shape == (4,)


def test_updates_thread_through_user_function():
    # the rng shared state must rotate via default updates even when the
    # user also has their own updates
    srng = RandomStream(seed=5)
    w = atp.shared(np.zeros(3, dtype="float64"), name="w")
    noise = srng.normal(size=(3,))
    f = function([], noise, updates={w: w + noise})
    a = f()
    b = f()
    assert not np.allclose(a, b)
    np.testing.assert_allclose(w.get_value(), np.asarray(a) + np.asarray(b))


def test_no_default_updates_freezes_draws():
    srng = RandomStream(seed=6)
    u = srng.uniform(size=(3,))
    f = function([], u, no_default_updates=True, mode="JAX")
    np.testing.assert_allclose(f(), f())


def test_choice_permutation_jit_bit_identity():
    """choice (scalar + array population, with p) and permutation
    (scalar n + array) draw bit-identically on py and JAX paths —
    scalar choice used to hit jr.choice's concrete-size requirement,
    scalar permutation crashed shape inference."""
    import sys

    sys.path.insert(0, "tests")
    from tests.utils import jax_mode, py_mode

    cases = [
        ("choice", dict(a=5, size=(4,))),
        ("choice", dict(a=np.arange(10.0, 15.0), size=(6,))),
        ("choice", dict(a=4, p=np.array([0.1, 0.2, 0.3, 0.4]), size=(5,))),
        ("permutation", dict(x=6)),
        ("permutation", dict(x=np.arange(8.0))),
    ]
    for name, kw in cases:
        draws = []
        for mode in (py_mode, jax_mode):
            srng = RandomStream(seed=7)
            f = atp.function([], getattr(srng, name)(**kw), mode=mode)
            draws.append(np.asarray(f()))
        assert np.array_equal(draws[0], draws[1]), (name, kw)
    # scalar permutation of a NON-constant n is rejected with guidance
    n = at.scalar("n", dtype="int64")
    srng = RandomStream(seed=7)
    with pytest.raises(NotImplementedError, match="constant n"):
        srng.permutation(n)


def test_distribution_inventory_bit_identity():
    """Broad py-vs-JAX bit-identity matrix (rng_fn is both the oracle
    and the lowering; a 26-distribution sweep ran clean)."""
    import sys

    sys.path.insert(0, "tests")
    from tests.utils import jax_mode, py_mode

    specs = [
        ("beta", dict(a=2.0, b=3.0, size=(4,))),
        ("dirichlet", dict(alpha=np.array([1.0, 2.0, 3.0]), size=(2,))),
        ("vonmises", dict(mu=0.5, kappa=2.0, size=(4,))),
        ("hypergeometric", dict(ngood=7, nbad=3, nsample=5, size=(4,))),
        ("betabinom", dict(n=5, a=1.0, b=2.0, size=(4,))),
        ("triangular", dict(left=0.0, mode=0.5, right=1.0, size=(4,))),
        ("wald", dict(mean=1.0, scale=2.0, size=(4,))),
        ("truncexpon", dict(b=2.0, loc=0.0, scale=1.0, size=(4,))),
        ("integers", dict(low=0, high=9, size=(6,))),
    ]
    for name, kw in specs:
        draws = []
        for mode in (py_mode, jax_mode):
            srng = RandomStream(seed=11)
            f = atp.function([], getattr(srng, name)(**kw), mode=mode)
            draws.append(np.asarray(f()))
        assert draws[0].shape == draws[1].shape, name
        np.testing.assert_allclose(
            draws[0].astype("float64"), draws[1].astype("float64"),
            rtol=1e-6, err_msg=name,
        )


class TestReviewRegressions:
    def test_implicit_rngs_are_independent(self):
        # two anonymous draws must not be bit-identical (and must not
        # merge into one node)
        import aesara_tpu as atp
        from aesara_tpu.tensor.random.basic import normal

        x = normal(0.0, 1.0, size=(100,))
        y = normal(0.0, 1.0, size=(100,))
        f = atp.function([], [x, y, x + y], mode="FAST_RUN")
        xv, yv, sv = (np.asarray(a) for a in f())
        assert not np.allclose(xv, yv), "independent draws were identical"
        np.testing.assert_allclose(sv, xv + yv, rtol=1e-6)
        # two RandomVariable applies must survive in the compiled graph
        from aesara_tpu.tensor.random.op import RandomVariable

        rv_nodes = [n for n in f.fgraph.apply_nodes
                    if isinstance(n.op, RandomVariable)]
        assert len(rv_nodes) == 2

    def test_symbolic_size_tuple(self):
        import aesara_tpu as atp
        import aesara_tpu.tensor as at
        from aesara_tpu.tensor.random.utils import RandomStream

        srng = RandomStream(seed=7)
        x = at.matrix("x", dtype="float64")
        draw = srng.normal(0.0, 1.0, size=(x.shape[0], 3))
        f = atp.function([x], draw, mode="PY")
        res = np.asarray(f(np.zeros((5, 2), dtype="float32")))
        assert res.shape == (5, 3)

    def test_choice_without_replacement(self):
        import aesara_tpu as atp
        from aesara_tpu.tensor.random.utils import RandomStream

        srng = RandomStream(seed=11)
        draw = srng.choice(10, size=(10,), replace=False)
        f = atp.function([], draw, mode="PY")
        res = np.asarray(f())
        assert sorted(res.tolist()) == list(range(10)), res

    def test_permutation_matrix_support_dim(self):
        import aesara_tpu as atp
        from aesara_tpu.tensor.random.utils import RandomStream

        srng = RandomStream(seed=3)
        m = np.arange(15, dtype="float64").reshape(3, 5)
        draw = srng.permutation(m)
        assert draw.type.shape[-1] == 5
        f = atp.function([], draw, mode="PY")
        res = np.asarray(f())
        assert res.shape == (3, 5)
        # row shuffle: the set of rows is preserved
        assert sorted(map(tuple, res)) == sorted(map(tuple, m))
