"""Rule-density wave 3 (VERDICT r4 item 4): ~10 operand patterns per
rule for the round-5 relational pack (``tensor/rewriting/math.py``
clause relations) and the BLAS recognition grid (``tensor/blas.py``),
each case asserting post-rewrite topology AND value through the py
oracle — the reference suites' density
(``/root/reference/tests/tensor/rewriting/test_math.py``) applied to
the rules this round added or migrated.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from tests.rewrite_corpus import (
    count_label,
    op_labels,
    rewrite_and_check,
    rewrite_only,
)

rng = np.random.default_rng(50505)

CANON = ("canonicalize",)
STAB = ("canonicalize", "stabilize")
SPEC = ("canonicalize", "stabilize", "specialize")
BLAS = ("canonicalize", "stabilize", "specialize", "fast_run")


def v(*shape, positive=False, dtype="float64"):
    a = rng.uniform(0.4, 2.0, size=shape) if positive else rng.uniform(
        -2.0, 2.0, size=shape)
    return a.astype(dtype)


# ---------------------------------------------------------------------------
# local_reciprocal_reciprocal (migrated to the relational pack)
# ---------------------------------------------------------------------------

class TestReciprocalReciprocal:
    @pytest.mark.parametrize("ndim", [0, 1, 2, 3])
    def test_ranks(self, ndim):
        shape = (3, 4, 2)[:ndim]
        x = at.TensorType("float64", (None,) * ndim)("x")
        out = tm.reciprocal(tm.reciprocal(x))
        r = rewrite_and_check([x], out, [v(*shape) + 3.0], include=CANON,
                              absent=("Reciprocal",))

    def test_triple_collapses_to_single(self):
        x = at.vector("x", dtype="float64")
        out = tm.reciprocal(tm.reciprocal(tm.reciprocal(x)))
        r = rewrite_only(out, include=CANON)
        assert count_label(r, "Reciprocal") <= 1

    def test_quadruple_collapses_fully(self):
        x = at.vector("x", dtype="float64")
        out = tm.reciprocal(tm.reciprocal(tm.reciprocal(tm.reciprocal(x))))
        rewrite_and_check([x], out, [v(6) + 3.0], include=CANON,
                          absent=("Reciprocal",))

    def test_inner_multi_client_still_fires(self):
        x = at.vector("x", dtype="float64")
        inner = tm.reciprocal(x)
        out = tm.reciprocal(inner) + inner
        # the pair collapses even when the inner has another client
        rewrite_and_check([x], out, [v(6) + 3.0], include=CANON)

    def test_mixed_with_div_canonical_form(self):
        x = at.vector("x", dtype="float64")
        out = 1.0 / (1.0 / x)
        r = rewrite_and_check([x], out, [v(6) + 3.0], include=SPEC)
        assert count_label(r, "Reciprocal") + count_label(r, "TrueDiv") <= 1

    def test_no_fire_on_single(self):
        x = at.vector("x", dtype="float64")
        r = rewrite_only(tm.reciprocal(x), include=CANON)
        assert count_label(r, "Reciprocal") == 1

    def test_no_fire_across_other_op(self):
        x = at.vector("x", dtype="float64")
        out = tm.reciprocal(tm.exp(tm.reciprocal(x)))
        rewrite_and_check([x], out, [v(6) + 3.0], include=CANON,
                          present=("Reciprocal",))

    @pytest.mark.parametrize("dtype", ["float32", "float64"])
    def test_dtype_preserved(self, dtype):
        x = at.vector("x", dtype=dtype)
        out = tm.reciprocal(tm.reciprocal(x))
        rewrite_and_check([x], out, [v(5, dtype=dtype) + 3.0],
                          include=CANON)

    def test_int_input_promotion_unchanged(self):
        x = at.lvector("x")
        out = tm.reciprocal(tm.reciprocal(x))
        # reciprocal(int) promotes to float; the collapse must keep the
        # promoted dtype (x alone would be int64): _keep_type inserts a
        # cast or refuses
        r = rewrite_and_check([x], out, [np.array([1, 2, 4])],
                              include=CANON)

    def test_value_on_negatives(self):
        x = at.vector("x", dtype="float64")
        out = tm.reciprocal(tm.reciprocal(x))
        rewrite_and_check([x], out, [np.array([-2.0, -0.5, 3.0])],
                          include=CANON)


# ---------------------------------------------------------------------------
# local_log_sqrt (migrated): log(sqrt(x)) → 0.5·log(x)
# ---------------------------------------------------------------------------

class TestLogSqrtDensity:
    @pytest.mark.parametrize("ndim", [0, 1, 2])
    def test_ranks(self, ndim):
        shape = (3, 4)[:ndim]
        x = at.TensorType("float64", (None,) * ndim)("x")
        out = tm.log(tm.sqrt(x))
        rewrite_and_check([x], out, [v(*shape, positive=True)],
                          include=STAB, absent=("Sqrt",))

    def test_log2_not_matched(self):
        x = at.vector("x", dtype="float64")
        out = tm.log2(tm.sqrt(x))
        rewrite_and_check([x], out, [v(5, positive=True)], include=STAB,
                          present=("Sqrt",))

    def test_sqrt_multi_client_keeps_value(self):
        x = at.vector("x", dtype="float64")
        s = tm.sqrt(x)
        out = tm.log(s) + s
        rewrite_and_check([x], out, [v(5, positive=True)], include=STAB)

    def test_chained_log_sqrt_sqrt(self):
        x = at.vector("x", dtype="float64")
        out = tm.log(tm.sqrt(tm.sqrt(x)))
        r = rewrite_and_check([x], out, [v(5, positive=True)],
                              include=STAB, absent=("Sqrt",))

    def test_value_tiny_inputs_stability(self):
        # the stabilization's reason to exist: log(sqrt(eps)) underflows
        # later than sqrt(eps) itself
        x = at.vector("x", dtype="float64")
        out = tm.log(tm.sqrt(x))
        rewrite_and_check([x], out, [np.array([1e-300, 1e-10, 1.0])],
                          include=STAB, rtol=1e-12)

    @pytest.mark.parametrize("dtype", ["float32", "float64"])
    def test_dtypes(self, dtype):
        x = at.vector("x", dtype=dtype)
        out = tm.log(tm.sqrt(x))
        rewrite_and_check([x], out, [v(5, positive=True, dtype=dtype)],
                          include=STAB, rtol=1e-5)

    def test_no_fire_on_exp_sqrt(self):
        x = at.vector("x", dtype="float64")
        out = tm.exp(tm.sqrt(x))
        rewrite_and_check([x], out, [v(5, positive=True)], include=STAB,
                          present=("Sqrt",))

    def test_composes_with_log_products(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = tm.log(tm.sqrt(x)) + tm.log(tm.sqrt(y))
        rewrite_and_check([x, y], out,
                          [v(5, positive=True), v(5, positive=True)],
                          include=STAB, absent=("Sqrt",))


# ---------------------------------------------------------------------------
# local_log1p_expm1 / local_conj_conj / round idempotents (new relations)
# ---------------------------------------------------------------------------

class TestNewInversePairs:
    @pytest.mark.parametrize("ndim", [0, 1, 2])
    def test_log1p_expm1_ranks(self, ndim):
        shape = (3, 4)[:ndim]
        x = at.TensorType("float64", (None,) * ndim)("x")
        out = tm.log1p(tm.expm1(x))
        rewrite_and_check([x], out, [v(*shape)], include=CANON,
                          absent=("Expm1", "Log1p"))

    def test_expm1_log1p_NOT_collapsed(self):
        # expm1(log1p(x)) is only exact for x > -1: not a clause
        x = at.vector("x", dtype="float64")
        out = tm.expm1(tm.log1p(x))
        rewrite_and_check([x], out, [v(5, positive=True)], include=CANON,
                          present=("Expm1",))

    def test_conj_conj_complex(self):
        x = at.cvector("x")
        out = tm.conj(tm.conj(x))
        xv = (rng.normal(size=4) + 1j * rng.normal(size=4)).astype(
            "complex64")
        rewrite_and_check([x], out, [xv], include=CANON, absent=("Conj",))

    def test_conj_single_stays(self):
        x = at.cvector("x")
        r = rewrite_only(tm.conj(x), include=CANON)
        assert count_label(r, "Conj") == 1

    @pytest.mark.parametrize(
        "outer,inner,keep",
        [(tm.floor, tm.floor, "Floor"), (tm.ceil, tm.ceil, "Ceil"),
         (tm.floor, tm.ceil, "Ceil"), (tm.ceil, tm.floor, "Floor"),
         (tm.sgn, tm.sgn, "Sgn")],
    )
    def test_round_idempotent_grid(self, outer, inner, keep):
        x = at.vector("x", dtype="float64")
        out = outer(inner(x))
        r = rewrite_and_check([x], out, [v(7) * 3], include=CANON,
                              present=(keep,))
        assert count_label(r, "Floor") + count_label(r, "Ceil") \
            + count_label(r, "Sgn") == 1

    def test_floor_of_sgn_not_touched_wrongly(self):
        # floor(sgn(x)) == sgn(x) would ALSO be sound but is not a
        # registered clause: value must still be right either way
        x = at.vector("x", dtype="float64")
        out = tm.floor(tm.sgn(x))
        rewrite_and_check([x], out, [v(7)], include=CANON)

    def test_idempotent_triple_chain(self):
        x = at.vector("x", dtype="float64")
        out = tm.floor(tm.floor(tm.floor(x)))
        r = rewrite_only(out, include=CANON)
        assert count_label(r, "Floor") == 1

    def test_int_dtype_floor_useless(self):
        # integer input: floor is an identity; the useless-rounding rule
        # (if any) or the idempotent pair must never change values
        x = at.lvector("x")
        out = tm.floor(tm.floor(x))
        rewrite_and_check([x], out, [np.array([-3, 0, 7])], include=CANON)


# ---------------------------------------------------------------------------
# BLAS recognition density: gemm/gemv/ger forms (tensor/blas.py)
# ---------------------------------------------------------------------------

class TestBlasRecognitionGrid:
    def _mats(self):
        return [v(4, 5), v(5, 6), v(4, 6)]

    @pytest.mark.parametrize("alpha,beta", [(1.0, 1.0), (2.5, 1.0),
                                            (1.0, 0.5), (-1.0, 2.0)])
    def test_gemm_scalar_grid(self, alpha, beta):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        c = at.matrix("c", dtype="float64")
        out = beta * c + alpha * tm.dot(a, b)
        r = rewrite_and_check([a, b, c], out,
                              [v(4, 5), v(5, 6), v(4, 6)], include=BLAS)
        labels = op_labels(r)
        assert any("Gemm" in l for l in labels) or "Dot22Scalar" in labels \
            or "Dot22" in labels

    def test_gemm_sub_form(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        c = at.matrix("c", dtype="float64")
        out = c - tm.dot(a, b)
        rewrite_and_check([a, b, c], out, self._mats(), include=BLAS)

    def test_gemv_forms(self):
        m = at.matrix("m", dtype="float64")
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = y + 2.0 * tm.dot(m, x)
        r = rewrite_and_check([m, x, y], out, [v(4, 5), v(5), v(4)],
                              include=BLAS)
        labels = op_labels(r)
        assert any("Gemv" in l or "Dot" in l for l in labels)

    def test_ger_outer_form(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        a = at.matrix("a", dtype="float64")
        out = a + 3.0 * tm.outer(x, y)
        rewrite_and_check([x, y, a], out, [v(4), v(6), v(4, 6)],
                          include=BLAS)

    def test_dot22_plain(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = tm.dot(a, b)
        rewrite_and_check([a, b], out, [v(4, 5), v(5, 6)], include=BLAS)

    def test_transposed_operands(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        c = at.matrix("c", dtype="float64")
        out = c + tm.dot(a.T, b)
        rewrite_and_check([a, b, c], out, [v(5, 4), v(5, 6), v(4, 6)],
                          include=BLAS)

    def test_double_gemm_chain(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        c = at.matrix("c", dtype="float64")
        out = c + tm.dot(a, b) + 2.0 * tm.dot(a, b)
        rewrite_and_check([a, b, c], out, self._mats(), include=BLAS)

    @pytest.mark.parametrize("dtype", ["float32", "float64"])
    def test_gemm_dtypes(self, dtype):
        a = at.matrix("a", dtype=dtype)
        b = at.matrix("b", dtype=dtype)
        c = at.matrix("c", dtype=dtype)
        out = c + tm.dot(a, b)
        rewrite_and_check(
            [a, b, c], out,
            [v(4, 5, dtype=dtype), v(5, 6, dtype=dtype),
             v(4, 6, dtype=dtype)],
            include=BLAS, rtol=1e-4)

    def test_int_dot_not_blasified_wrongly(self):
        a = at.lmatrix("a")
        b = at.lmatrix("b")
        out = tm.dot(a, b)
        rewrite_and_check(
            [a, b], out,
            [np.arange(6).reshape(2, 3), np.arange(12).reshape(3, 4)],
            include=BLAS)

    def test_gemm_inside_elemwise_context(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        c = at.matrix("c", dtype="float64")
        out = tm.tanh(c + tm.dot(a, b))
        rewrite_and_check([a, b, c], out, self._mats(), include=BLAS)


# ---------------------------------------------------------------------------
# AlgebraicCanonizer density: mul/div nesting grids
# ---------------------------------------------------------------------------

class TestCanonizerNestingGrid:
    @pytest.mark.parametrize(
        "expr_i", range(10),
    )
    def test_mul_div_nests(self, expr_i):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        z = at.vector("z", dtype="float64")
        exprs = [
            lambda: (x * y) / (y * z),
            lambda: (x / y) / (x / z),
            lambda: (x * 2.0) / (y * 2.0),
            lambda: x / (y / z),
            lambda: (x / y) * (y / z),
            lambda: (2.0 * x * y) / (4.0 * y),
            lambda: (-x) / (-y),
            lambda: (x * y * z) / (z * y),
            lambda: 1.0 / (x / y),
            lambda: (x / (2.0 * y)) * (y / x),
        ]
        out = exprs[expr_i]()
        rewrite_and_check(
            [x, y, z], out,
            [v(5) + 2.0, v(5) + 2.0, v(5) + 2.0],
            include=SPEC, rtol=1e-10)
