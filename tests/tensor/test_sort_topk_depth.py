"""Sort/argsort/topk depth wave (VERDICT r4 item 4; reference
``tests/tensor/test_sort.py`` ~500 LoC): axis grids, negative axes,
stability, duplicate handling, gradients, dtype grids, topk sign/edge
grids, and py-vs-XLA differentials throughout.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import verify_grad
from aesara_tpu.tensor.sort import argsort, argtopk, sort, topk, topk_and_argtopk
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(9797)


def v(*shape, dtype="float64"):
    return rng.normal(size=shape).astype(dtype)


class TestSortGrids:
    @pytest.mark.parametrize("axis", [0, 1, -1, None])
    def test_sort_axis_grid(self, axis):
        x = at.matrix("x", dtype="float64")
        xv = v(4, 6)
        out = sort(x, axis=axis)
        compare_jax_and_py([x], out, [xv])
        f = function([x], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f(xv)),
                                   np.sort(xv, axis=axis))

    @pytest.mark.parametrize("axis", [0, 2, -2])
    def test_sort_3d(self, axis):
        x = at.tensor3("x", dtype="float64")
        xv = v(2, 3, 4)
        compare_jax_and_py([x], sort(x, axis=axis), [xv])

    @pytest.mark.parametrize("dtype", ["float32", "int64", "int32"])
    def test_sort_dtypes(self, dtype):
        x = at.TensorType(dtype, (None,))("x")
        xv = (v(7) * 10).astype(dtype)
        out = sort(x)
        f = function([x], out, mode="PY")
        r = np.asarray(f(xv))
        assert r.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(r, np.sort(xv))

    def test_sort_with_duplicates(self):
        x = at.vector("x", dtype="float64")
        xv = np.array([3.0, 1.0, 3.0, 1.0, 2.0])
        compare_jax_and_py([x], sort(x), [xv])

    def test_sort_grad_permutation_property(self):
        """d sort(x) / dx is the sorting permutation — verify_grad."""
        verify_grad(lambda m: sort(m, axis=1), [v(3, 5)], rng=rng)

    def test_sort_grad_axis_none(self):
        verify_grad(lambda m: sort(m, axis=None), [v(2, 3)], rng=rng)

    def test_empty_input(self):
        x = at.vector("x", dtype="float64")
        f = function([x], sort(x), mode="PY")
        assert np.asarray(f(np.array([], dtype="float64"))).shape == (0,)


class TestArgsortGrids:
    @pytest.mark.parametrize("axis", [0, 1, -1, None])
    def test_argsort_axis_grid(self, axis):
        x = at.matrix("x", dtype="float64")
        xv = v(4, 6)
        out = argsort(x, axis=axis)
        compare_jax_and_py([x], out, [xv])
        f = function([x], out, mode="PY")
        np.testing.assert_array_equal(np.asarray(f(xv)),
                                      np.argsort(xv, axis=axis))

    def test_argsort_stability_with_ties(self):
        """kind='stable' must preserve the order of equal elements."""
        x = at.vector("x", dtype="float64")
        xv = np.array([2.0, 1.0, 2.0, 1.0])
        out = argsort(x, kind="stable")
        f = function([x], out, mode="PY")
        np.testing.assert_array_equal(np.asarray(f(xv)),
                                      np.argsort(xv, kind="stable"))

    def test_argsort_gather_recovers_sort(self):
        x = at.vector("x", dtype="float64")
        out = x[argsort(x)]
        xv = v(8)
        f = function([x], out, mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(xv)), np.sort(xv))

    def test_argsort_grad_is_zero(self):
        """Indices are discrete: grad wrt x through argsort alone is 0
        (or disconnected) — pinned via a cost that only uses indices."""
        x = at.vector("x", dtype="float64")
        cost = tm.sum(tm.cast(argsort(x), "float64"))
        from aesara_tpu.gradient import grad

        g = grad(cost, x, disconnected_inputs="ignore")
        f = function([x], g, mode="FAST_RUN", on_unused_input="ignore")
        np.testing.assert_allclose(np.asarray(f(v(5))), 0.0)


class TestTopKGrids:
    @pytest.mark.parametrize("kth", [1, 2, 4])
    def test_topk_values_match_numpy(self, kth):
        x = at.vector("x", dtype="float64")
        xv = v(9)
        out = topk(x, kth, sorted=True)
        f = function([x], out, mode="PY")
        got = np.sort(np.asarray(f(xv)))
        expect = np.sort(np.sort(xv)[-kth:])
        np.testing.assert_allclose(got, expect)

    @pytest.mark.parametrize("kth", [-1, -3])
    def test_negative_kth_bottom_k(self, kth):
        """Negative kth selects the SMALLEST |kth| (reference TopK sign
        contract)."""
        x = at.vector("x", dtype="float64")
        xv = v(9)
        out = topk(x, kth, sorted=True)
        f = function([x], out, mode="PY")
        got = np.sort(np.asarray(f(xv)))
        expect = np.sort(np.sort(xv)[: -kth])
        np.testing.assert_allclose(got, expect)

    def test_topk_axis_matrix(self):
        x = at.matrix("x", dtype="float64")
        xv = v(3, 7)
        out = topk(x, 2, axis=1, sorted=True)
        f = function([x], out, mode="PY")
        got = np.sort(np.asarray(f(xv)), axis=1)
        expect = np.sort(np.sort(xv, axis=1)[:, -2:], axis=1)
        np.testing.assert_allclose(got, expect)

    def test_argtopk_indices_recover_values(self):
        x = at.vector("x", dtype="float64")
        xv = v(9)
        idx = argtopk(x, 3)
        f = function([x], [idx, x[idx]], mode="PY")
        iv, vals = f(xv)
        np.testing.assert_allclose(np.sort(np.asarray(vals)),
                                   np.sort(np.sort(xv)[-3:]))

    def test_topk_and_argtopk_consistent(self):
        x = at.vector("x", dtype="float64")
        xv = v(8)
        vals, idx = topk_and_argtopk(x, 3)
        f = function([x], [vals, idx], mode="PY")
        vv_, iv = f(xv)
        np.testing.assert_allclose(np.asarray(vv_), xv[np.asarray(iv)])

    def test_topk_jax_backend(self):
        x = at.vector("x", dtype="float64")
        xv = v(10)
        out = topk(x, 4, sorted=True)
        fp = function([x], out, mode="PY")
        fj = function([x], out, mode="JAX")
        np.testing.assert_allclose(np.sort(np.asarray(fp(xv))),
                                   np.sort(np.asarray(fj(xv))))

    def test_kth_equal_to_length(self):
        x = at.vector("x", dtype="float64")
        xv = v(5)
        out = topk(x, 5, sorted=True)
        f = function([x], out, mode="PY")
        np.testing.assert_allclose(np.sort(np.asarray(f(xv))),
                                   np.sort(xv))

    def test_kth_zero_rejected(self):
        x = at.vector("x", dtype="float64")
        with pytest.raises((ValueError, TypeError)):
            topk(x, 0)

    def test_idx_dtype_honored(self):
        x = at.vector("x", dtype="float64")
        idx = argtopk(x, 2, idx_dtype="int32")
        assert idx.type.dtype == "int32"

    def test_topk_grad(self):
        """Gradient routes to the selected entries only."""
        verify_grad(lambda m: topk(m, 2, sorted=True), [v(6)], rng=rng)


class TestSortInGraphs:
    def test_median_via_sort(self):
        x = at.vector("x", dtype="float64")
        n = x.shape[0]
        s = sort(x)
        med = s[n // 2]
        f = function([x], med, mode="FAST_RUN")
        xv = v(9)
        assert np.isclose(float(np.asarray(f(xv))), np.median(xv))

    def test_rank_transform_roundtrip(self):
        x = at.vector("x", dtype="float64")
        ranks = argsort(argsort(x))
        f = function([x], ranks, mode="FAST_RUN")
        xv = v(7)
        np.testing.assert_array_equal(np.asarray(f(xv)),
                                      np.argsort(np.argsort(xv)))

    def test_sort_then_diff_nonnegative(self):
        x = at.vector("x", dtype="float64")
        from aesara_tpu.tensor import extra_ops as eo

        d = eo.diff(sort(x))
        f = function([x], d, mode="FAST_RUN")
        assert (np.asarray(f(v(10))) >= 0).all()
