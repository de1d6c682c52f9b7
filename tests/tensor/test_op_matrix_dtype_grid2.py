"""Dtype-corner op matrices, wave 2 (VERDICT r3 #5): bitwise algebra,
shifts, clip, nan-propagating min/max, sort/argsort/argmax, integer
wraparound at iinfo bounds, power corners, index-dtype grids, and
join/stack promotion — across the full dtype grid, differentially
checked py-oracle vs whole-graph XLA vs numpy.

Companion to ``test_op_matrix_dtype_grid.py`` (same conventions);
reference case matrices: ``/root/reference/tests/tensor/test_math.py``
(bitwise/clip/maximum sections) and ``test_sort.py``.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)

UINTS = ["uint8", "uint16", "uint32", "uint64"]
INTS = ["int8", "int16", "int32", "int64"]
FLOATS = ["float16", "float32", "float64"]

rng = np.random.default_rng(20260819)


def both(out, expect, exact=True, tol=None):
    """Evaluate a constant graph on both backends; dtype + value must
    match the numpy oracle exactly (or within tol)."""
    for mode, label in ((PY, "py"), (JAX, "jax")):
        r = np.asarray(function([], out, mode=mode)())
        assert str(r.dtype) == str(expect.dtype), (
            f"{label}: {r.dtype} != {expect.dtype}"
        )
        if exact:
            np.testing.assert_array_equal(r, expect, err_msg=label)
        else:
            np.testing.assert_allclose(r, expect, err_msg=label, **(tol or {}))


def c(v):
    return at.as_tensor_variable(v)


# ---------------------------------------------------------------------------
# bitwise algebra
# ---------------------------------------------------------------------------

class TestBitwiseGrid:
    @pytest.mark.parametrize("dtype", ["bool"] + UINTS + INTS)
    @pytest.mark.parametrize("opname", ["and_", "or_", "xor"])
    def test_binary_same_dtype(self, dtype, opname):
        if dtype == "bool":
            a = np.array([True, False, True, False])
            b = np.array([True, True, False, False])
        else:
            a = rng.integers(0, 16, size=6).astype(dtype)
            b = rng.integers(0, 16, size=6).astype(dtype)
        np_op = {"and_": np.bitwise_and, "or_": np.bitwise_or,
                 "xor": np.bitwise_xor}[opname]
        both(getattr(tm, opname)(c(a), c(b)), np_op(a, b))

    @pytest.mark.parametrize("dtype", ["bool", "uint8", "int8", "int32",
                                       "uint64"])
    def test_invert(self, dtype):
        a = (np.array([True, False]) if dtype == "bool"
             else np.array([0, 1, 7, 255 % np.iinfo(dtype).max]).astype(dtype))
        both(tm.invert(c(a)), np.invert(a))

    @pytest.mark.parametrize("dtype", INTS + ["uint8", "uint16"])
    def test_shifts_same_dtype(self, dtype):
        a = np.array([1, 2, 3, 7]).astype(dtype)
        s = np.array([0, 1, 2, 3]).astype(dtype)
        both(c(a) << c(s), np.left_shift(a, s))
        both(c(a) >> c(s), np.right_shift(a, s))

    def test_shift_mixed_width_promotes(self):
        a = np.array([1, 2], "int8")
        s = np.array([2, 3], "int32")
        both(c(a) << c(s), np.left_shift(a, s))  # int32 result

    def test_right_shift_negative_is_arithmetic(self):
        a = np.array([-8, -1, 16], "int32")
        both(c(a) >> np.int32(2), np.right_shift(a, 2))

    @pytest.mark.parametrize("dtype", ["float32", "complex64"])
    def test_bitwise_rejects_inexact(self, dtype):
        a = c(np.ones(3, dtype))
        with pytest.raises(Exception):
            out = tm.and_(a, a)
            function([], out, mode=PY)()


# ---------------------------------------------------------------------------
# clip
# ---------------------------------------------------------------------------

class TestClipGrid:
    @pytest.mark.parametrize("dtype", INTS + UINTS[:2] + FLOATS)
    def test_same_dtype(self, dtype):
        a = np.array([0, 1, 5, 9, 3]).astype(dtype)
        lo = np.asarray(1).astype(dtype)
        hi = np.asarray(6).astype(dtype)
        both(at.clip(c(a), c(lo), c(hi)), np.clip(a, lo, hi))

    def test_promotion_int8_bounds_int32(self):
        a = np.array([1, 120], "int8")
        out = at.clip(c(a), np.int32(0), np.int32(100))
        both(out, np.clip(a.astype("int32"), 0, 100))

    def test_lo_greater_than_hi_picks_hi(self):
        a = np.array([1.0, 5.0])
        both(at.clip(c(a), 3.0, 2.0), np.clip(a, 3.0, 2.0))

    def test_nan_input_propagates(self):
        a = np.array([np.nan, 0.5, 2.0])
        both(at.clip(c(a), 0.0, 1.0), np.clip(a, 0.0, 1.0))

    def test_grad_flat_outside_window(self):
        from aesara_tpu.gradient import grad

        x = at.dvector("x")
        g = grad(at.clip(x, -1.0, 1.0).sum(), x)
        gv = function([x], g, mode=PY)(np.array([-2.0, 0.0, 2.0]))
        np.testing.assert_array_equal(np.asarray(gv), [0.0, 1.0, 0.0])


# ---------------------------------------------------------------------------
# nan-propagating maximum/minimum
# ---------------------------------------------------------------------------

class TestMinMaxNan:
    @pytest.mark.parametrize("dtype", FLOATS)
    @pytest.mark.parametrize("opname", ["maximum", "minimum"])
    def test_nan_propagates_either_side(self, dtype, opname):
        np_op = getattr(np, opname)
        a = np.array([np.nan, 1.0, 0.0]).astype(dtype)
        b = np.array([0.0, np.nan, 2.0]).astype(dtype)
        both(getattr(tm, opname)(c(a), c(b)), np_op(a, b))

    @pytest.mark.parametrize("dtype", INTS[:2] + UINTS[:1] + FLOATS[1:]
                             )
    def test_plain_grid(self, dtype):
        a = np.array([0, 3, 1, 7]).astype(dtype)
        b = np.array([2, 2, 5, 7]).astype(dtype)
        both(tm.maximum(c(a), c(b)), np.maximum(a, b))
        both(tm.minimum(c(a), c(b)), np.minimum(a, b))

    def test_signed_zero(self):
        a = np.array([-0.0])
        b = np.array([0.0])
        r = np.asarray(function([], tm.maximum(c(a), c(b)), mode=PY)())
        assert r[0] == 0.0


# ---------------------------------------------------------------------------
# sort / argsort / argmax across dtypes
# ---------------------------------------------------------------------------

class TestSortGrid:
    @pytest.mark.parametrize("dtype", ["bool", "uint8", "int16", "int64",
                                       "float16", "float32", "float64"])
    def test_sort_values(self, dtype):
        a = (np.array([True, False, True, False]) if dtype == "bool"
             else np.array([3, 1, 4, 1, 5, 9, 2]).astype(dtype))
        both(at.sort(c(a)), np.sort(a))

    @pytest.mark.parametrize("dtype", ["uint8", "int32", "float64"])
    def test_argsort_is_int64_and_stable(self, dtype):
        a = np.array([2, 1, 2, 1, 0]).astype(dtype)
        expect = np.argsort(a, kind="stable")
        both(at.argsort(c(a), kind="stable"), expect)

    def test_sort_complex_matches_numpy_lexicographic(self):
        a = np.array([3 + 1j, 1 + 2j, 1 + 1j], "complex128")
        r = np.asarray(function([], at.sort(c(a)), mode=PY)())
        np.testing.assert_array_equal(r, np.sort(a))

    @pytest.mark.parametrize("axis", [0, 1, -1])
    def test_sort_axis_grid(self, axis):
        a = rng.normal(size=(3, 4))
        both(at.sort(c(a), axis=axis), np.sort(a, axis=axis))

    def test_sort_nan_goes_last(self):
        a = np.array([2.0, np.nan, 1.0])
        both(at.sort(c(a)), np.sort(a))

    @pytest.mark.parametrize("dtype", ["bool", "uint16", "int8", "float16",
                                       "float64"])
    def test_argmax_argmin_dtype_and_ties(self, dtype):
        a = (np.array([False, True, True]) if dtype == "bool"
             else np.array([1, 3, 3, 0, 3]).astype(dtype))
        both(tm.argmax(c(a)), np.asarray(np.argmax(a)))
        both(tm.argmin(c(a)), np.asarray(np.argmin(a)))

    @pytest.mark.parametrize("keepdims", [False, True])
    def test_argmax_axis_keepdims(self, keepdims):
        a = rng.normal(size=(3, 4))
        out = tm.argmax(c(a), axis=1, keepdims=keepdims)
        expect = np.argmax(a, axis=1)
        if keepdims:
            expect = expect[:, None]
        both(out, expect)


# ---------------------------------------------------------------------------
# integer wraparound at iinfo bounds (numpy semantics, both backends)
# ---------------------------------------------------------------------------

class TestIntWraparound:
    @pytest.mark.parametrize("dtype", INTS + UINTS)
    def test_add_at_max_wraps(self, dtype):
        mx = np.iinfo(dtype).max
        a = np.array([mx], dtype)
        one = np.asarray(1).astype(dtype)
        with np.errstate(over="ignore"):
            expect = a + one
        both(c(a) + c(one), expect)

    @pytest.mark.parametrize("dtype", ["int8", "uint8", "int32"])
    def test_mul_overflow_wraps(self, dtype):
        a = np.array([100], dtype)
        b = np.asarray(100).astype(dtype)
        with np.errstate(over="ignore"):
            expect = a * b
        both(c(a) * c(b), expect)

    @pytest.mark.parametrize("dtype", INTS)
    def test_neg_at_min_wraps(self, dtype):
        mn = np.iinfo(dtype).min
        a = np.array([mn], dtype)
        with np.errstate(over="ignore"):
            expect = -a
        both(-c(a), expect)

    def test_abs_at_int_min_wraps(self):
        a = np.array([np.iinfo("int8").min], "int8")
        with np.errstate(over="ignore"):
            expect = np.abs(a)
        both(at.abs(c(a)), expect)


# ---------------------------------------------------------------------------
# power corners
# ---------------------------------------------------------------------------

class TestPowerCorners:
    def test_int_zero_pow_zero_is_one(self):
        both(c(np.array([0], "int32")) ** np.int32(0),
             np.array([1], "int32"))

    def test_int_negative_exponent_raises_at_runtime(self):
        out = c(np.array([2], "int32")) ** np.int32(-1)
        with pytest.raises(Exception):
            function([], out, mode=PY)()

    @pytest.mark.parametrize("dtype", FLOATS)
    def test_float_pow_grid(self, dtype):
        a = np.array([0.5, 2.0, 4.0]).astype(dtype)
        e = np.array([-1.0, 0.5, 2.0]).astype(dtype)
        tol = dict(rtol=2e-2) if dtype == "float16" else dict(rtol=1e-5)
        both(c(a) ** c(e), a ** e, exact=False, tol=tol)

    def test_zero_pow_negative_float_is_inf(self):
        a = np.array([0.0])
        with np.errstate(divide="ignore"):
            expect = a ** -1.0
        both(c(a) ** -1.0, expect)

    def test_complex_pow(self):
        a = np.array([1 + 1j], "complex128")
        both(c(a) ** 2.0, a ** 2.0, exact=False, tol=dict(rtol=1e-10))


# ---------------------------------------------------------------------------
# index-dtype grid
# ---------------------------------------------------------------------------

class TestIndexDtypeGrid:
    @pytest.mark.parametrize("idx_dtype", ["uint8", "int8", "int16",
                                           "uint32", "int64"])
    def test_gather_any_int_index_dtype(self, idx_dtype):
        x = np.arange(10.0)
        idx = np.array([0, 3, 9, 3]).astype(idx_dtype)
        both(c(x)[c(idx)], x[idx])

    def test_negative_index_signed_only(self):
        x = np.arange(5.0)
        idx = np.array([-1, -5], "int32")
        both(c(x)[c(idx)], x[idx])

    @pytest.mark.parametrize("idx_dtype", ["uint8", "int16"])
    def test_scatter_small_index_dtype(self, idx_dtype):
        x = np.zeros(6)
        idx = np.array([1, 4]).astype(idx_dtype)
        y = np.array([2.0, 3.0])
        out = at.inc_subtensor(c(x)[c(idx)], c(y))
        expect = x.copy()
        np.add.at(expect, idx.astype("int64"), y)
        both(out, expect)

    def test_bool_mask_py_oracle_only(self):
        # boolean ADVANCED indexing is data-dependent-shape: it builds
        # and runs on the py oracle (numpy semantics), but its result
        # extent is unknowable statically — XLA workloads should use
        # where/nonzero instead
        x = np.arange(5.0)
        m = np.array([True, False, True, False, True])
        out = c(x)[c(m)]
        r = np.asarray(function([], out, mode=PY)())
        np.testing.assert_array_equal(r, x[m])


# ---------------------------------------------------------------------------
# join / stack promotion
# ---------------------------------------------------------------------------

class TestJoinStackPromotion:
    @pytest.mark.parametrize("da,db,want", [
        ("int8", "int32", "int32"),
        ("uint8", "int8", "int16"),
        ("float32", "float64", "float64"),
        # int64+float16 keeps NUMPY promotion (float64): only bfloat16
        # follows the jax rule (scalar/ops.py::upcast)
        ("int64", "float16", "float64"),
        ("bool", "int8", "int8"),
    ])
    def test_join_promotes(self, da, db, want):
        a = np.array([1, 2]).astype(da)
        b = np.array([3]).astype(db)
        out = at.join(0, c(a), c(b))
        expect = np.concatenate(
            [a.astype(want), b.astype(want)])
        both(out, expect)

    def test_stack_scalars_promotes(self):
        out = at.stack([c(np.float32(1.0)), c(np.float64(2.0))])
        both(out, np.array([1.0, 2.0], "float64"))

    def test_stack_new_axis_positions(self):
        a, b = rng.normal(size=(2, 3)), rng.normal(size=(2, 3))
        for axis in (0, 1, 2, -1):
            both(at.stack([c(a), c(b)], axis=axis),
                 np.stack([a, b], axis=axis))


# ---------------------------------------------------------------------------
# rounding family
# ---------------------------------------------------------------------------

class TestRoundingGrid:
    @pytest.mark.parametrize("dtype", FLOATS)
    def test_round_half_to_even(self, dtype):
        a = np.array([0.5, 1.5, 2.5, -0.5, -1.5]).astype(dtype)
        both(tm.round(c(a)), np.round(a))

    @pytest.mark.parametrize("dtype", FLOATS[1:])
    @pytest.mark.parametrize("opname", ["floor", "ceil", "trunc"])
    def test_floor_ceil_trunc(self, dtype, opname):
        a = np.array([-1.7, -0.2, 0.0, 0.2, 1.7]).astype(dtype)
        both(getattr(tm, opname)(c(a)), getattr(np, opname)(a))

    def test_round_int_passthrough_value(self):
        a = np.array([1, -2, 3], "int32")
        r = np.asarray(function([], tm.round(c(a)), mode=PY)())
        np.testing.assert_array_equal(r, np.round(a))
