"""BLAS recognition operand-pattern density (reference
``tests/tensor/test_blas.py`` 2,727 LoC: ~10 variants per fusion
pattern): alpha/beta positions, subtraction and negation forms,
transposed operands, chained accumulation — each asserting the fused
value matches the numpy oracle on both backends."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function

rng = np.random.default_rng(2323)

MODES = ["PY", "FAST_RUN"]


def mats():
    return (rng.normal(size=(3, 4)), rng.normal(size=(4, 5)),
            rng.normal(size=(3, 5)))


def check(build, arrays, oracle):
    syms = [at.tensor(dtype="float64", shape=(None,) * a.ndim, name=f"m{k}")
            for k, a in enumerate(arrays)]
    out = build(*syms)
    want = oracle(*arrays)
    for mode in MODES:
        f = function(syms, out, mode=mode)
        np.testing.assert_allclose(np.asarray(f(*arrays)), want,
                                   rtol=1e-7, err_msg=f"mode={mode}")


class TestGemmPatterns:
    def test_z_plus_alpha_dot(self):
        check(lambda x, y, z: z + 0.5 * tm.dot(x, y), mats(),
              lambda x, y, z: z + 0.5 * (x @ y))

    def test_z_minus_alpha_dot(self):
        check(lambda x, y, z: z - 0.5 * tm.dot(x, y), mats(),
              lambda x, y, z: z - 0.5 * (x @ y))

    def test_alpha_dot_minus_z(self):
        check(lambda x, y, z: 2.0 * tm.dot(x, y) - z, mats(),
              lambda x, y, z: 2.0 * (x @ y) - z)

    def test_beta_z_plus_alpha_dot(self):
        check(lambda x, y, z: 0.25 * z + 0.5 * tm.dot(x, y), mats(),
              lambda x, y, z: 0.25 * z + 0.5 * (x @ y))

    def test_neg_dot_plus_z(self):
        check(lambda x, y, z: z + (-tm.dot(x, y)), mats(),
              lambda x, y, z: z - x @ y)

    def test_two_dots_accumulate(self):
        a = rng.normal(size=(3, 4))
        b = rng.normal(size=(4, 5))
        c = rng.normal(size=(3, 6))
        d = rng.normal(size=(6, 5))
        check(lambda s, t, u, v: tm.dot(s, t) + tm.dot(u, v),
              [a, b, c, d], lambda s, t, u, v: s @ t + u @ v)

    def test_transposed_left(self):
        a = rng.normal(size=(4, 3))
        b = rng.normal(size=(4, 5))
        z = rng.normal(size=(3, 5))
        check(lambda s, t, u: u + tm.dot(s.T, t), [a, b, z],
              lambda s, t, u: u + s.T @ t)

    def test_transposed_right(self):
        a = rng.normal(size=(3, 4))
        b = rng.normal(size=(5, 4))
        z = rng.normal(size=(3, 5))
        check(lambda s, t, u: u + tm.dot(s, t.T), [a, b, z],
              lambda s, t, u: u + s @ t.T)

    def test_symbolic_alpha(self):
        x, y, z = mats()
        sx = at.matrix("x", dtype="float64")
        sy = at.matrix("y", dtype="float64")
        sz = at.matrix("z", dtype="float64")
        a = at.scalar("a", dtype="float64")
        f = function([sx, sy, sz, a], sz + a * tm.dot(sx, sy), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(x, y, z, 0.3)),
                                   z + 0.3 * (x @ y), rtol=1e-10)

    def test_chained_accumulation(self):
        x, y, z = mats()
        check(lambda s, t, u: (u + tm.dot(s, t)) + 2.0 * tm.dot(s, t),
              [x, y, z], lambda s, t, u: u + 3.0 * (s @ t))


class TestGemvGerPatterns:
    def test_gemv_plus_vector(self):
        m = rng.normal(size=(4, 3))
        v = rng.normal(size=(3,))
        b = rng.normal(size=(4,))
        check(lambda s, t, u: u + tm.dot(s, t), [m, v, b],
              lambda s, t, u: u + s @ t)

    def test_gemv_transposed(self):
        m = rng.normal(size=(3, 4))
        v = rng.normal(size=(3,))
        b = rng.normal(size=(4,))
        check(lambda s, t, u: u + tm.dot(s.T, t), [m, v, b],
              lambda s, t, u: u + s.T @ t)

    def test_gemv_scaled(self):
        m = rng.normal(size=(4, 3))
        v = rng.normal(size=(3,))
        b = rng.normal(size=(4,))
        check(lambda s, t, u: 0.5 * u - 2.0 * tm.dot(s, t), [m, v, b],
              lambda s, t, u: 0.5 * u - 2.0 * (s @ t))

    def test_ger_rank1_update(self):
        a = rng.normal(size=(4,))
        b = rng.normal(size=(5,))
        z = rng.normal(size=(4, 5))
        check(lambda s, t, u: u + tm.outer(s, t), [a, b, z],
              lambda s, t, u: u + np.outer(s, t))

    def test_ger_scaled_negative(self):
        a = rng.normal(size=(4,))
        b = rng.normal(size=(5,))
        z = rng.normal(size=(4, 5))
        check(lambda s, t, u: u - 0.1 * tm.outer(s, t), [a, b, z],
              lambda s, t, u: u - 0.1 * np.outer(s, t))

    def test_sgd_step_shape(self):
        # the canonical W -= lr * outer(x, g) training update
        import aesara_tpu as atp

        W = atp.shared(np.zeros((4, 5)), name="W")
        xv = at.vector("xv", dtype="float64")
        gv = at.vector("gv", dtype="float64")
        step = function([xv, gv], [],
                        updates={W: W - 0.1 * tm.outer(xv, gv)}, mode="FAST_RUN")
        a = rng.normal(size=4)
        b = rng.normal(size=5)
        step(a, b)
        step(a, b)
        np.testing.assert_allclose(W.get_value(), -0.2 * np.outer(a, b),
                                   rtol=1e-7)
