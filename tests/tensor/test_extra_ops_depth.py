"""extra_ops depth wave (VERDICT r4 item 4): parameter grids + gradients
+ error paths for the whole ``tensor/extra_ops.py`` surface, at the
density of the reference's ``tests/tensor/test_extra_ops.py`` — cum ops,
repeat, unique, searchsorted, (un)ravel index, fill_diagonal family,
broadcast_to/arrays/shape, bartlett, squeeze/compress/diff/bincount,
one-hot and the space constructors.

Static-shape-friendly ops check py vs XLA; data-dependent-shape ops
(unique, bincount, vector-repeat, compress) pin py-oracle vs numpy.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import verify_grad
from aesara_tpu.tensor import extra_ops as eo
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(86420)


def v(*shape, dtype="float64"):
    return rng.normal(size=shape).astype(dtype)


# ---------------------------------------------------------------------------
# cum ops
# ---------------------------------------------------------------------------

class TestCumOps:
    @pytest.mark.parametrize("op,npop", [(eo.cumsum, np.cumsum),
                                         (eo.cumprod, np.cumprod)])
    @pytest.mark.parametrize("axis", [None, 0, 1, -1])
    def test_axis_grid_2d(self, op, npop, axis):
        x = at.matrix("x", dtype="float64")
        xv = v(3, 4)
        out = op(x, axis=axis)
        compare_jax_and_py([x], out, [xv])
        f = function([x], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f(xv)), npop(xv, axis=axis))

    @pytest.mark.parametrize("axis", [0, 1, 2])
    def test_axis_grid_3d(self, axis):
        x = at.tensor3("x", dtype="float64")
        xv = v(2, 3, 4)
        compare_jax_and_py([x], eo.cumsum(x, axis=axis), [xv])

    def test_cumsum_grad(self):
        verify_grad(lambda m: eo.cumsum(m, axis=1), [v(3, 4)], rng=rng)
        verify_grad(lambda m: eo.cumsum(m, axis=None), [v(3, 4)], rng=rng)

    def test_cumprod_grad(self):
        verify_grad(lambda m: eo.cumprod(m, axis=0),
                    [np.abs(v(3, 4)) + 0.5], rng=rng)

    def test_int_dtype_passthrough(self):
        x = at.lvector("x")
        f = function([x], eo.cumsum(x), mode="PY")
        got = np.asarray(f(np.array([1, 2, 3])))
        assert got.dtype == np.int64
        np.testing.assert_array_equal(got, [1, 3, 6])

    def test_axis_out_of_range_rejected(self):
        x = at.matrix("x", dtype="float64")
        with pytest.raises((ValueError, IndexError)):
            eo.cumsum(x, axis=5)


# ---------------------------------------------------------------------------
# repeat
# ---------------------------------------------------------------------------

class TestRepeat:
    @pytest.mark.parametrize("axis", [None, 0, 1])
    @pytest.mark.parametrize("reps", [1, 2, 3])
    def test_scalar_reps_grid(self, axis, reps):
        x = at.matrix("x", dtype="float64")
        xv = v(2, 3)
        out = eo.repeat(x, reps, axis=axis)
        compare_jax_and_py([x], out, [xv])
        f = function([x], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f(xv)),
                                   np.repeat(xv, reps, axis=axis))

    def test_vector_reps_py(self):
        x = at.vector("x", dtype="float64")
        r = at.lvector("r")
        f = function([x, r], eo.repeat(x, r, axis=0), mode="PY")
        xv = v(4)
        rv = np.array([0, 2, 1, 3])
        np.testing.assert_allclose(np.asarray(f(xv, rv)),
                                   np.repeat(xv, rv))

    def test_scalar_reps_grad(self):
        verify_grad(lambda m: eo.repeat(m, 3, axis=0), [v(2, 3)], rng=rng)

    def test_repeat_zero(self):
        x = at.vector("x", dtype="float64")
        f = function([x], eo.repeat(x, 0, axis=0), mode="PY")
        assert np.asarray(f(v(3))).shape == (0,)


# ---------------------------------------------------------------------------
# unique (data-dependent shape: py oracle)
# ---------------------------------------------------------------------------

class TestUnique:
    def test_flags_grid(self):
        xv = np.array([3, 1, 2, 3, 1, 0])
        x = at.lvector("x")
        outs = eo.unique(x, return_index=True, return_inverse=True,
                         return_counts=True)
        f = function([x], list(outs), mode="PY")
        got = [np.asarray(o) for o in f(xv)]
        exp = np.unique(xv, return_index=True, return_inverse=True,
                        return_counts=True)
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(g, e)

    def test_axis0(self):
        xv = np.array([[1, 2], [1, 2], [3, 4]])
        x = at.lmatrix("x")
        f = function([x], eo.unique(x, axis=0), mode="PY")
        np.testing.assert_array_equal(np.asarray(f(xv)),
                                      np.unique(xv, axis=0))

    def test_float_values(self):
        xv = np.array([1.5, 1.5, -0.5])
        x = at.vector("x", dtype="float64")
        f = function([x], eo.unique(x), mode="PY")
        np.testing.assert_allclose(np.asarray(f(xv)), [-0.5, 1.5])


# ---------------------------------------------------------------------------
# searchsorted
# ---------------------------------------------------------------------------

class TestSearchsorted:
    @pytest.mark.parametrize("side", ["left", "right"])
    def test_sides_with_duplicates(self, side):
        a = at.vector("a", dtype="float64")
        q = at.vector("q", dtype="float64")
        av = np.array([0.0, 1.0, 1.0, 2.0, 5.0])
        qv = np.array([1.0, 2.5, -1.0, 6.0])
        out = eo.searchsorted(a, q, side=side)
        compare_jax_and_py([a, q], out, [av, qv])
        f = function([a, q], out, mode="PY")
        np.testing.assert_array_equal(np.asarray(f(av, qv)),
                                      np.searchsorted(av, qv, side=side))

    def test_matrix_queries(self):
        a = at.vector("a", dtype="float64")
        q = at.matrix("q", dtype="float64")
        av = np.sort(v(6))
        qv = v(2, 3)
        compare_jax_and_py([a, q], eo.searchsorted(a, q), [av, qv])

    def test_sorter_argument(self):
        a = at.vector("a", dtype="float64")
        s = at.lvector("s")
        q = at.vector("q", dtype="float64")
        av = v(5)
        sv = np.argsort(av)
        qv = v(3)
        f = function([a, s, q], eo.searchsorted(a, q, sorter=s), mode="PY")
        np.testing.assert_array_equal(
            np.asarray(f(av, sv, qv)), np.searchsorted(av, qv, sorter=sv))

    def test_bad_side_rejected(self):
        a = at.vector("a", dtype="float64")
        with pytest.raises((ValueError, TypeError)):
            eo.searchsorted(a, a, side="middle")


# ---------------------------------------------------------------------------
# unravel_index / ravel_multi_index
# ---------------------------------------------------------------------------

class TestIndexRaveling:
    @pytest.mark.parametrize("order", ["C", "F"])
    def test_roundtrip(self, order):
        idx = at.lvector("idx")
        dims = (3, 4, 5)
        iv = np.array([0, 7, 59, 23])
        outs = eo.unravel_index(idx, dims, order=order)
        f = function([idx], list(outs), mode="PY")
        got = [np.asarray(o) for o in f(iv)]
        exp = np.unravel_index(iv, dims, order=order)
        for g, e in zip(got, exp):
            np.testing.assert_array_equal(g, e)
        multi = [at.lvector(f"m{i}") for i in range(3)]
        back = eo.ravel_multi_index(multi, dims, order=order)
        fb = function(multi, back, mode="PY")
        np.testing.assert_array_equal(np.asarray(fb(*exp)), iv)

    def test_ravel_mode_wrap_clip(self):
        dims = (3, 4)
        mi = [at.lvector("r"), at.lvector("c")]
        rv = np.array([5, -1])
        cv = np.array([1, 7])
        for mode in ("wrap", "clip"):
            out = eo.ravel_multi_index(mi, dims, mode=mode)
            f = function(mi, out, mode="PY")
            np.testing.assert_array_equal(
                np.asarray(f(rv, cv)),
                np.ravel_multi_index((rv, cv), dims, mode=mode))

    def test_ravel_mode_raise_out_of_bounds(self):
        mi = [at.lvector("r"), at.lvector("c")]
        out = eo.ravel_multi_index(mi, (3, 4), mode="raise")
        f = function(mi, out, mode="PY")
        with pytest.raises(Exception):
            f(np.array([5]), np.array([0]))

    def test_unravel_jax_backend(self):
        idx = at.lvector("idx")
        outs = eo.unravel_index(idx, (4, 6))
        compare_jax_and_py([idx], list(outs), [np.array([0, 5, 23])])


# ---------------------------------------------------------------------------
# fill_diagonal family
# ---------------------------------------------------------------------------

class TestFillDiagonal:
    @pytest.mark.parametrize("shape", [(4, 4), (3, 5), (5, 3)])
    def test_shapes(self, shape):
        x = at.matrix("x", dtype="float64")
        xv = v(*shape)
        out = eo.fill_diagonal(x, np.float64(9.0))
        compare_jax_and_py([x], out, [xv])
        f = function([x], out, mode="PY")
        exp = xv.copy(); np.fill_diagonal(exp, 9.0)
        np.testing.assert_allclose(np.asarray(f(xv)), exp)

    @pytest.mark.parametrize("offset", [0, 1, 2, -1, -2])
    def test_offsets(self, offset):
        x = at.matrix("x", dtype="float64")
        xv = v(5, 5)
        out = eo.fill_diagonal_offset(x, np.float64(-3.0), offset)
        f = function([x], out, mode="PY")
        got = np.asarray(f(xv))
        exp = xv.copy()
        n = exp.shape[0]
        for i in range(n):
            j = i + offset
            if 0 <= j < n:
                exp[i, j] = -3.0
        np.testing.assert_allclose(got, exp)
        fj = function([x], out, mode="JAX")
        np.testing.assert_allclose(np.asarray(fj(xv)), exp)

    def test_grad_wrt_matrix(self):
        verify_grad(lambda m: eo.fill_diagonal(m, np.float64(0.0)),
                    [v(4, 4)], rng=rng)

    def test_grad_wrt_value(self):
        verify_grad(
            lambda val: eo.fill_diagonal(at.as_tensor_variable(v(3, 3)),
                                         val).sum(),
            [np.float64(2.0)], rng=rng)


# ---------------------------------------------------------------------------
# broadcast_to / broadcast_arrays / broadcast_shape
# ---------------------------------------------------------------------------

class TestBroadcasting:
    @pytest.mark.parametrize("src,dst", [((1, 4), (3, 4)), ((3, 1), (3, 5)),
                                         ((4,), (2, 3, 4)), ((), (2, 2))])
    def test_broadcast_to_grid(self, src, dst):
        x = at.TensorType("float64",
                          tuple(1 if s == 1 else None for s in src))("x")
        xv = v(*src) if src else np.float64(1.5)
        out = eo.broadcast_to(x, dst)
        f = function([x], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f(xv)),
                                   np.broadcast_to(xv, dst))

    def test_broadcast_to_grad_sums(self):
        verify_grad(
            lambda m: eo.broadcast_to(m.dimshuffle(0, "x"), (3, 5)),
            [v(3)], rng=rng)

    def test_broadcast_arrays(self):
        a = at.TensorType("float64", (None, 1))("a")
        b = at.vector("b", dtype="float64")
        oa, ob = eo.broadcast_arrays(a, b)
        f = function([a, b], [oa, ob], mode="PY")
        av, bv = v(3, 1), v(4)
        ra, rb = f(av, bv)
        ea, eb = np.broadcast_arrays(av, bv)
        np.testing.assert_allclose(np.asarray(ra), ea)
        np.testing.assert_allclose(np.asarray(rb), eb)

    def test_broadcast_shape_static(self):
        a = at.TensorType("float64", (3, 1))("a")
        b = at.TensorType("float64", (1, 4))("b")
        shp = eo.broadcast_shape(a, b)
        f = function([a, b], [at.as_tensor_variable(s) for s in shp],
                     mode="PY", on_unused_input="ignore")
        assert [int(np.asarray(s)) for s in f(v(3, 1), v(1, 4))] == [3, 4]

    def test_incompatible_runtime_shapes_raise_unrewritten(self):
        """Without rewrites the fill op checks shapes at runtime.  (With
        canonicalize ON, useless-fill elision can remove the check — the
        reference documents the same caveat: rewrites may elide shape
        errors.)"""
        from tests.rewrite_corpus import py_mode

        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = eo.broadcast_arrays(a, b)[0]
        f = function([a, b], out, mode=py_mode)
        with pytest.raises(Exception):
            f(v(3, 2), v(3, 4))


# ---------------------------------------------------------------------------
# bartlett / squeeze / compress / diff / bincount / one-hot / spaces
# ---------------------------------------------------------------------------

class TestSmallOps:
    @pytest.mark.parametrize("n", [0, 1, 2, 7])
    def test_bartlett(self, n):
        k = at.lscalar("k")
        f = function([k], eo.bartlett(k), mode="PY")
        np.testing.assert_allclose(np.asarray(f(n)), np.bartlett(n))

    @pytest.mark.parametrize("axis", [None, 0, 2, (0, 2)])
    def test_squeeze_grid(self, axis):
        x = at.TensorType("float64", (1, None, 1))("x")
        xv = v(1, 3, 1)
        out = eo.squeeze(x, axis=axis)
        f = function([x], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f(xv)),
                                   np.squeeze(xv, axis=axis))

    def test_squeeze_non1_axis_rejected(self):
        x = at.TensorType("float64", (None, 3))("x")
        with pytest.raises((ValueError, TypeError)):
            eo.squeeze(x, axis=1)

    @pytest.mark.parametrize("axis", [None, 0])
    def test_compress(self, axis):
        x = at.matrix("x", dtype="float64")
        c = at.vector("c", dtype="int8")
        xv = v(4, 3)
        cv = np.array([1, 0, 1, 1], dtype="int8")
        out = eo.compress(c, x, axis=axis)
        f = function([c, x], out, mode="PY")
        np.testing.assert_allclose(
            np.asarray(f(cv, xv)),
            np.compress(cv.astype(bool), xv, axis=axis))

    @pytest.mark.parametrize("n", [1, 2, 3])
    @pytest.mark.parametrize("axis", [0, 1, -1])
    def test_diff_grid(self, n, axis):
        x = at.matrix("x", dtype="float64")
        xv = v(5, 6)
        out = eo.diff(x, n=n, axis=axis)
        compare_jax_and_py([x], out, [xv])
        f = function([x], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f(xv)),
                                   np.diff(xv, n=n, axis=axis))

    def test_diff_grad(self):
        verify_grad(lambda m: eo.diff(m, n=2, axis=1), [v(3, 6)], rng=rng)

    def test_bincount_weights_minlength(self):
        x = at.lvector("x")
        w = at.vector("w", dtype="float64")
        xv = np.array([0, 1, 1, 3])
        wv = np.array([0.5, 1.0, 2.0, 4.0])
        f = function([x, w], eo.bincount(x, weights=w, minlength=6),
                     mode="PY")
        np.testing.assert_allclose(
            np.asarray(f(xv, wv)), np.bincount(xv, wv, minlength=6))

    def test_bincount_negative_rejected(self):
        x = at.lvector("x")
        f = function([x], eo.bincount(x), mode="PY")
        with pytest.raises(Exception):
            f(np.array([1, -2]))

    def test_to_one_hot(self):
        y = at.lvector("y")
        out = eo.to_one_hot(y, 5)
        f = function([y], out, mode="PY")
        got = np.asarray(f(np.array([0, 3, 4])))
        assert got.shape == (3, 5)
        np.testing.assert_allclose(got, np.eye(5)[[0, 3, 4]])
        fj = function([y], out, mode="JAX")
        np.testing.assert_allclose(np.asarray(fj(np.array([0, 3, 4]))),
                                   got)

    @pytest.mark.parametrize("fn,npfn", [
        (eo.linspace, np.linspace),
        (eo.logspace, np.logspace),
        (eo.geomspace, np.geomspace),
    ])
    @pytest.mark.parametrize("endpoint", [True, False])
    def test_space_constructors(self, fn, npfn, endpoint):
        # outputs follow floatX (float32 default), so compare at f32 tol
        out = fn(1.0, 3.0, num=7, endpoint=endpoint)
        f = function([], out, mode="PY")
        np.testing.assert_allclose(
            np.asarray(f()), npfn(1.0, 3.0, num=7, endpoint=endpoint),
            rtol=2e-4)
