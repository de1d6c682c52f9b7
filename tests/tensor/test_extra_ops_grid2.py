"""extra_ops parameter-grid wave 2: the thinly-covered tails —
fill_diagonal_offset sweeps, to_one_hot dtypes, compress axis forms,
searchsorted sides/sorter on both backends (reference
``tests/tensor/test_extra_ops.py`` 1,413 LoC)."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.tensor.extra_ops import (
    compress, fill_diagonal_offset, searchsorted, to_one_hot)

rng = np.random.default_rng(3131)

MODES = ["PY", "FAST_RUN"]


class TestFillDiagonalOffset:
    @pytest.mark.parametrize("offset", [-2, -1, 0, 1, 2])
    @pytest.mark.parametrize("shape", [(4, 4), (3, 5), (5, 3)])
    def test_offset_grid(self, offset, shape):
        x = at.matrix("x", dtype="float64")
        out = fill_diagonal_offset(x, 9.0, offset)
        f = function([x], out, mode="PY")
        xv = rng.normal(size=shape)
        want = xv.copy()
        m, n = shape
        if offset >= 0:
            i = np.arange(0, min(m, n - offset))
            want[i, i + offset] = 9.0
        else:
            i = np.arange(0, min(m + offset, n))
            want[i - offset, i] = 9.0
        np.testing.assert_allclose(np.asarray(f(xv)), want)

    def test_input_not_mutated(self):
        x = at.matrix("x", dtype="float64")
        out = fill_diagonal_offset(x, 0.0, 0)
        f = function([x], out, mode="PY")
        xv = rng.normal(size=(3, 3))
        keep = xv.copy()
        f(xv)
        np.testing.assert_allclose(xv, keep)


class TestToOneHot:
    @pytest.mark.parametrize("mode", MODES)
    def test_values(self, mode):
        i = at.lvector("i")
        f = function([i], to_one_hot(i, 5), mode=mode)
        iv = np.array([0, 3, 4, 3])
        got = np.asarray(f(iv))
        want = np.zeros((4, 5))
        want[np.arange(4), iv] = 1.0
        np.testing.assert_allclose(got, want)

    def test_dtype_param(self):
        i = at.lvector("i")
        y = to_one_hot(i, 4, dtype="int32")
        assert y.type.dtype == "int32"
        f = function([i], y, mode="PY")
        got = np.asarray(f(np.array([1, 2])))
        assert got.dtype == np.int32 and got.sum() == 2


class TestCompress:
    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_axis_forms(self, axis):
        x = at.matrix("x", dtype="float64")
        c = at.vector("c", dtype="bool")
        out = compress(c, x, axis=axis)
        f = function([c, x], out, mode="PY")
        xv = rng.normal(size=(3, 4))
        n = {None: 12, 0: 3, 1: 4}[axis]
        cv = rng.integers(0, 2, size=n).astype(bool)
        np.testing.assert_allclose(np.asarray(f(cv, xv)),
                                   np.compress(cv, xv, axis=axis))


class TestSearchsortedGrid:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("side", ["left", "right"])
    def test_sides(self, mode, side):
        a = at.vector("a", dtype="float64")
        v = at.vector("v", dtype="float64")
        f = function([a, v], searchsorted(a, v, side=side), mode=mode)
        av = np.array([1.0, 2.0, 2.0, 3.0])
        vv = np.array([0.0, 2.0, 3.5, 2.0])
        np.testing.assert_array_equal(
            np.asarray(f(av, vv)), np.searchsorted(av, vv, side=side))

    def test_sorter(self):
        a = at.vector("a", dtype="float64")
        v = at.vector("v", dtype="float64")
        s = at.lvector("s")
        f = function([a, v, s], searchsorted(a, v, sorter=s), mode="PY")
        av = np.array([3.0, 1.0, 2.0])
        sv = np.argsort(av)
        vv = np.array([2.5, 0.5])
        np.testing.assert_array_equal(
            np.asarray(f(av, vv, sv)),
            np.searchsorted(av, vv, sorter=sv))
