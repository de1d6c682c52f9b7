"""OpFromGraph / ifelse / assert tests."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.builders import OpFromGraph
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad, verify_grad
from aesara_tpu.ifelse import ifelse
from aesara_tpu.raise_op import Assert, assert_op
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(31)


class TestOpFromGraph:
    def test_forward(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        e = x * 2 + y
        op = OpFromGraph([x, y], [e])
        a = at.vector("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        out = op(a, b)
        av, bv = rng.normal(size=4), rng.normal(size=4)
        res = compare_jax_and_py([a, b], out, [av, bv])
        np.testing.assert_allclose(np.asarray(res[0]), av * 2 + bv)

    def test_grad(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        op = OpFromGraph([x, y], [at.tanh(x * y).sum()])

        def build(a, b):
            return op(a, b)

        verify_grad(build, [rng.normal(size=3), rng.normal(size=3)])

    def test_grad_override(self):
        x = at.scalar("x", dtype="float64")

        def custom_lop(inputs, output_grads):
            return [output_grads[0] * 7.0]

        op = OpFromGraph([x], [x * 2.0], lop_overrides=custom_lop)
        a = at.scalar("a", dtype="float64")
        g = grad(op(a), a)
        f = function([a], g)
        assert np.isclose(f(1.0), 7.0)

    def test_shared_capture(self):
        s = atp.shared(np.float64(3.0), name="s")
        x = at.scalar("x", dtype="float64")
        op = OpFromGraph([x], [x * s])
        a = at.scalar("a", dtype="float64")
        f = function([a], op(a))
        assert np.isclose(f(2.0), 6.0)

    def test_multiple_outputs(self):
        x = at.vector("x", dtype="float64")
        op = OpFromGraph([x], [x.sum(), x * 2])
        a = at.vector("a", dtype="float64")
        s, d = op(a)
        av = rng.normal(size=3)
        compare_jax_and_py([a], [s, d], [av])


class TestIfElse:
    def test_forward_both_modes(self):
        c = at.scalar("c", dtype="bool")
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = ifelse(c, x * 2, y + 1)
        xv, yv = rng.normal(size=3), rng.normal(size=3)
        for mode in ("PY", "JAX"):
            f = function([c, x, y], out, mode=mode)
            np.testing.assert_allclose(f(True, xv, yv), xv * 2)
            np.testing.assert_allclose(f(False, xv, yv), yv + 1)

    def test_multiple_outputs(self):
        c = at.scalar("c", dtype="bool")
        x = at.vector("x", dtype="float64")
        outs = ifelse(c, [x * 2, x + 1], [x - 1, x * 3])
        f = function([c, x], outs, mode="JAX")
        xv = rng.normal(size=3)
        r = f(True, xv)
        np.testing.assert_allclose(r[0], xv * 2)
        np.testing.assert_allclose(r[1], xv + 1)

    def test_grad(self):
        c_val = np.bool_(True)

        def build(x, y):
            return ifelse(at.constant(c_val), (x ** 2).sum(), (y ** 3).sum())

        verify_grad(build, [rng.normal(size=3), rng.normal(size=3)])

    def test_dtype_upcast(self):
        c = at.scalar("c", dtype="bool")
        x = at.vector("x", dtype="float32")
        y = at.vector("y", dtype="float64")
        out = ifelse(c, x, y)
        assert out.type.dtype == "float64"


class TestAssert:
    def test_passes(self):
        x = at.vector("x", dtype="float64")
        out = assert_op(x.sum(), at.math.gt(x.shape[0], 0))
        f = function([x], out, mode="PY")
        assert np.isclose(f(np.ones(3)), 3.0)

    def test_raises_py(self):
        x = at.vector("x", dtype="float64")
        from aesara_tpu.raise_op import Assert

        out = Assert("must be positive")(x.sum(), at.math.all(x > 0))
        f = function([x], out, mode="PY")
        with pytest.raises(AssertionError):
            f(np.array([1.0, -1.0]))

    def test_grad_passthrough(self):
        def build(x):
            return assert_op((x ** 2).sum(), at.constant(True))

        verify_grad(build, [rng.normal(size=3)], mode="PY")


class TestRemat:
    """remat: the gradient recomputes the forward behind an
    optimization barrier instead of sharing activations."""

    def _setup(self):
        from aesara_tpu.compile.builders import remat
        from aesara_tpu.gradient import grad

        x = at.matrix("x")
        w = at.matrix("w")
        h = remat([x, w], [at.tanh(at.dot(x, w))])(x, w)
        loss = (h ** 2).sum()
        gx, gw = grad(loss, [x, w])
        rng = np.random.default_rng(0)
        vals = (rng.standard_normal((3, 4)).astype("float32"),
                rng.standard_normal((4, 2)).astype("float32"))
        return x, w, loss, gx, gw, vals

    def test_grads_match_oracle(self):
        x, w, loss, gx, gw, vals = self._setup()
        f = atp.function([x, w], [loss, gx, gw], mode="JAX")
        fp = atp.function([x, w], [loss, gx, gw], mode="PY")
        for g, r in zip(f(*vals), fp(*vals)):
            assert np.allclose(np.asarray(g), np.asarray(r), rtol=1e-5)

    def test_forward_actually_recomputed(self):
        """The remat program carries one MORE forward dot than the plain
        program (the symbolic recompute), fenced by an optimization
        barrier.  Counted on the pre-optimization program: late XLA
        pipelines (CPU) may elide the barrier and re-CSE — on TPU the
        barrier is what jax.checkpoint itself relies on."""
        from aesara_tpu.gradient import grad

        x, w, loss, gx, gw, vals = self._setup()
        f = atp.function([x, w], [loss, gx, gw], mode="JAX")
        txt = f.fn.jit_fn.lower(*vals).as_text()
        assert "opt_barrier" in txt or "optimization_barrier" in txt

        h2 = at.tanh(at.dot(x, w))
        loss2 = (h2 ** 2).sum()
        g2 = grad(loss2, [x, w])
        f2 = atp.function([x, w], [loss2] + g2, mode="JAX")
        txt2 = f2.fn.jit_fn.lower(*vals).as_text()
        assert txt.count("dot_general") == txt2.count("dot_general") + 1

    def test_without_remat_forward_is_shared(self):
        from aesara_tpu.gradient import grad

        x = at.matrix("x")
        w = at.matrix("w")
        h = at.tanh(at.dot(x, w))
        loss = (h ** 2).sum()
        gx, gw = grad(loss, [x, w])
        f = atp.function([x, w], [loss, gx, gw], mode="JAX")
        rng = np.random.default_rng(0)
        vals = (rng.standard_normal((3, 4)).astype("float32"),
                rng.standard_normal((4, 2)).astype("float32"))
        import re

        opt = f.fn.jit_fn.lower(*vals).compile().as_text()
        mm = re.findall(r"f32\[\d+,\d+\]\{[0-9,]*\} dot\(", opt)
        assert len(mm) == 3  # forward shared with grads (post-XLA CSE)

    def test_remat_with_captured_shared_weights(self):
        """The model-layer pattern: remat over [x] with shared weights
        captured implicitly as extra inputs."""
        from aesara_tpu.compile.builders import remat
        from aesara_tpu.gradient import grad

        w = atp.shared(
            np.random.default_rng(0).standard_normal((4, 4)).astype("float32"),
            name="w",
        )
        x = at.matrix("x")
        h = remat([x], [at.tanh(at.dot(x, w))])(x)
        loss = (h ** 2).sum()
        gx, gw = grad(loss, [x, w])
        f = atp.function([x], [loss, gx, gw], mode="JAX")
        fp = atp.function([x], [loss, gx, gw], mode="PY")
        xv = np.random.default_rng(1).standard_normal((3, 4)).astype("float32")
        for a, b in zip(f(xv), fp(xv)):
            assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-5)

    def test_stacked_remat_grads_not_double_counted(self):
        """Chained remat ops (layer-stacking) and remat over a DERIVED
        input must not double-count gradients: the VJP is taken wrt the
        fenced roots (regression: grads came out 2x per remat level
        because a node input that is an ancestor of another was reached
        through both paths)."""
        from aesara_tpu.compile.builders import remat
        from aesara_tpu.gradient import grad

        x = at.vector("x")
        xv = np.array([1.0, 2.0], dtype="float32")
        h1 = remat([x], [x * 3.0])(x)
        h2 = remat([h1], [h1 * 3.0])(h1)
        g = atp.function([x], grad(h2.sum(), x), mode="PY")(xv)
        assert np.allclose(np.asarray(g), 9.0)

        p = x * 2.0
        h3 = remat([p], [p * 3.0])(p)
        g3 = atp.function([x], grad(h3.sum(), x), mode="PY")(xv)
        assert np.allclose(np.asarray(g3), 6.0)

    def test_deep_transformer_remat_matches_plain(self):
        from aesara_tpu.compile.builders import remat
        from aesara_tpu.gradient import grad
        from aesara_tpu.models import TransformerEncoderLayer
        from aesara_tpu.tensor import math as tm

        layers = [TransformerEncoderLayer(16, 2, 32, seed=i)
                  for i in range(3)]
        x = at.tensor3("x")
        xv = np.random.default_rng(0).standard_normal((2, 4, 16)).astype(
            "float32")
        params = [p for l in layers for p in l.params]

        def build(use_remat, mode):
            h = x
            for l in layers:
                h = remat([h], [l(h)])(h) if use_remat else l(h)
            return atp.function(
                [x], grad(tm.mean(tm.sqr(h)), [x] + params), mode=mode)

        for mode in ("PY", "JAX"):
            a = [np.asarray(v) for v in build(False, mode)(xv)]
            b = [np.asarray(v) for v in build(True, mode)(xv)]
            for p, q in zip(a, b):
                assert np.allclose(p, q, rtol=1e-5, atol=1e-7)
