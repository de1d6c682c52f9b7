"""compute_test_value depth wave (VERDICT r4 item 4): the eager
test-value machinery (``graph/op.py:205-271``; reference
``tests/graph/test_compute_test_value.py``) — propagation through op
families, the off/ignore/warn/raise policy grid, error localization at
graph-BUILD time, and interaction with grad/scan/function compilation.
"""

import warnings

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.config import config
from aesara_tpu.gradient import grad
from aesara_tpu.graph.op import get_test_value
from aesara_tpu.utils import TestValueError

rng = np.random.default_rng(11223)


def tv(var, value):
    var.tag.test_value = value
    return var


class TestPropagation:
    def test_elemwise_chain(self):
        with config.change_flags(compute_test_value="raise"):
            x = tv(at.vector("x", dtype="float64"), np.array([1.0, 2.0]))
            out = tm.tanh(x * 2.0) + 1.0
            np.testing.assert_allclose(get_test_value(out),
                                       np.tanh([2.0, 4.0]) + 1.0)

    def test_dot_shapes(self):
        with config.change_flags(compute_test_value="raise"):
            a = tv(at.matrix("a", dtype="float64"), rng.normal(size=(3, 4)))
            b = tv(at.matrix("b", dtype="float64"), rng.normal(size=(4, 5)))
            out = tm.dot(a, b)
            assert get_test_value(out).shape == (3, 5)

    def test_subtensor_and_incsubtensor(self):
        with config.change_flags(compute_test_value="raise"):
            x = tv(at.matrix("x", dtype="float64"), np.ones((3, 4)))
            s = x[1:, :2]
            assert get_test_value(s).shape == (2, 2)
            w = at.set_subtensor(x[0], np.float64(5.0))
            np.testing.assert_allclose(get_test_value(w)[0], 5.0)

    def test_constants_need_no_tag(self):
        with config.change_flags(compute_test_value="raise"):
            x = tv(at.scalar("x", dtype="float64"), np.float64(2.0))
            out = x + at.constant(np.float64(40.0))
            assert float(get_test_value(out)) == 42.0

    def test_shared_variables_provide_their_value(self):
        with config.change_flags(compute_test_value="raise"):
            s = atp.shared(np.array([1.0, 2.0]), name="s")
            out = s * 3.0
            np.testing.assert_allclose(get_test_value(out), [3.0, 6.0])

    def test_grad_graph_carries_test_values(self):
        with config.change_flags(compute_test_value="raise"):
            x = tv(at.vector("x", dtype="float64"), np.array([1.0, 3.0]))
            cost = tm.sum(tm.sqr(x))
            g = grad(cost, x)
            np.testing.assert_allclose(get_test_value(g), [2.0, 6.0])

    def test_bad_runtime_error_surfaces_at_build(self):
        """A shape error is raised at APPLY time, not at compile time —
        the whole point of test values."""
        with config.change_flags(compute_test_value="raise"):
            a = tv(at.matrix("a", dtype="float64"), rng.normal(size=(3, 4)))
            b = tv(at.matrix("b", dtype="float64"), rng.normal(size=(3, 4)))
            with pytest.raises(Exception):
                tm.dot(a, b)  # inner dims mismatch caught eagerly


class TestPolicyGrid:
    def test_raise_on_missing(self):
        with config.change_flags(compute_test_value="raise"):
            x = at.vector("x", dtype="float64")  # no test value
            with pytest.raises(TestValueError):
                _ = x * 2.0

    def test_warn_on_missing(self):
        with config.change_flags(compute_test_value="warn"):
            x = at.vector("x", dtype="float64")
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                out = x * 2.0
            assert any("test value" in str(x.message) for x in w)
            assert not hasattr(out.tag, "test_value")

    def test_ignore_on_missing(self):
        with config.change_flags(compute_test_value="ignore"):
            x = at.vector("x", dtype="float64")
            out = x * 2.0  # no error, no warning
            assert not hasattr(out.tag, "test_value")

    def test_off_does_not_evaluate(self):
        with config.change_flags(compute_test_value="off"):
            x = tv(at.vector("x", dtype="float64"), np.array([1.0]))
            out = x * 2.0
            assert not hasattr(out.tag, "test_value")

    def test_partial_inputs_tagged(self):
        """One tagged, one missing: policy applies, tagged value kept."""
        with config.change_flags(compute_test_value="ignore"):
            x = tv(at.vector("x", dtype="float64"), np.array([1.0]))
            y = at.vector("y", dtype="float64")
            out = x + y
            assert not hasattr(out.tag, "test_value")


class TestInteractions:
    def test_function_compiles_with_test_values_on(self):
        with config.change_flags(compute_test_value="raise"):
            x = tv(at.vector("x", dtype="float64"), np.array([1.0, 2.0]))
            f = function([x], tm.sum(x * 2.0), mode="FAST_RUN")
        assert float(np.asarray(f(np.array([3.0, 4.0])))) == 14.0

    def test_scan_with_test_values(self):
        from aesara_tpu.scan.basic import scan

        with config.change_flags(compute_test_value="raise"):
            v = tv(at.vector("v", dtype="float64"), np.array([1.0, 2.0]))
            outs, _ = scan(lambda x_t, acc: acc + x_t, sequences=[v],
                           outputs_info=[at.constant(np.float64(0.0))])
            f = function([v], outs[-1], mode="FAST_RUN")
        assert float(np.asarray(f(np.array([1.0, 5.0])))) == 6.0

    def test_wrong_dtype_test_value_caught_by_filter(self):
        """Test values run through the op's perform, so an impossible
        value (wrong ndim here) is caught when the op executes."""
        with config.change_flags(compute_test_value="raise"):
            x = at.matrix("x", dtype="float64")
            x.tag.test_value = np.zeros(3)  # wrong ndim for a matrix
            with pytest.raises(Exception):
                _ = tm.dot(x, x)

    def test_rewrites_do_not_require_test_values(self):
        """FAST_RUN rewriting happens under compute_test_value handling
        that must not demand tags on rewrite-created intermediates."""
        with config.change_flags(compute_test_value="raise"):
            x = tv(at.vector("x", dtype="float64"), np.array([1.0, 2.0]))
            out = tm.log(tm.exp(x)) + 0.0
            f = function([x], out, mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(np.array([1.5, -0.5]))),
                                   [1.5, -0.5])

    def test_eval_convenience_uses_test_value_free_path(self):
        x = at.vector("x", dtype="float64")
        assert np.allclose(
            (x * 3.0).eval({x: np.array([1.0, 2.0])}), [3.0, 6.0])
