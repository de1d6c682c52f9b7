"""In/Out argument-spec semantics (reference ``aesara/compile/io.py:108,227``
+ ``function_module`` tests): defaults, named args, stateful
``In(update=...)`` inputs, borrow outputs, output_subset."""

import pickle

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.compile.io import In, Out

rng = np.random.default_rng(88)


class TestInDefaults:
    def test_value_default_and_override(self):
        x, y = at.scalar("x", dtype="float64"), at.scalar("y", dtype="float64")
        f = function([x, In(y, value=2.0)], x + y)
        assert float(np.asarray(f(1.0))) == 3.0
        assert float(np.asarray(f(1.0, 10.0))) == 11.0

    def test_named_kwargs(self):
        x = at.scalar("x", dtype="float64")
        y = at.scalar("y", dtype="float64")
        f = function([In(x, name="a", value=1.0), In(y, name="b", value=2.0)],
                     x - y)
        assert float(np.asarray(f(b=5.0, a=7.0))) == 2.0
        assert float(np.asarray(f())) == -1.0

    def test_duplicate_arg_raises(self):
        x = at.scalar("x", dtype="float64")
        f = function([In(x, name="a", value=0.0)], x + 1)
        with pytest.raises(TypeError, match="twice"):
            f(1.0, a=2.0)

    def test_unknown_kwarg_raises(self):
        x = at.scalar("x", dtype="float64")
        f = function([In(x, name="a", value=0.0)], x + 1)
        with pytest.raises(TypeError, match="unknown"):
            f(zz=1.0)

    def test_missing_required_raises(self):
        x, y = at.scalar("x", dtype="float64"), at.scalar("y", dtype="float64")
        f = function([x, y], x + y)
        with pytest.raises(TypeError, match="missing"):
            f(1.0)


class TestInUpdate:
    def test_stateful_input_accumulates(self):
        """In(x, value=v0, update=expr): the input carries state across
        calls (reference io.py In.update)."""
        x = at.scalar("x", dtype="float64")
        step = at.scalar("step", dtype="float64")
        f = function([step, In(x, value=0.0, update=x + step)], x)
        assert float(np.asarray(f(1.0))) == 0.0
        assert float(np.asarray(f(1.0))) == 1.0
        assert float(np.asarray(f(10.0))) == 2.0
        assert float(np.asarray(f(1.0))) == 12.0

    def test_explicit_arg_resets_state(self):
        x = at.scalar("x", dtype="float64")
        f = function([In(x, value=5.0, update=x * 2.0)], x)
        assert float(np.asarray(f())) == 5.0
        assert float(np.asarray(f())) == 10.0
        assert float(np.asarray(f(100.0))) == 100.0  # explicit arg wins
        assert float(np.asarray(f())) == 200.0

    def test_update_with_vector_state(self):
        v = at.vector("v", dtype="float64")
        g = at.vector("g", dtype="float64")
        f = function([g, In(v, value=np.zeros(3), update=v - 0.5 * g)],
                     (v ** 2).sum())
        gv = np.ones(3)
        f(gv)
        f(gv)
        # after two updates the state is -1.0 each
        assert float(np.asarray(f(np.zeros(3)))) == pytest.approx(3.0)

    def test_conflicting_updates_raise(self):
        s = atp.shared(np.float64(0.0))
        x = at.scalar("x", dtype="float64")
        with pytest.raises((TypeError, ValueError)):
            function([In(x, value=0.0, update=x + 1)], x,
                     updates={x: x + 2.0})

    def test_update_on_non_input_raises(self):
        x = at.scalar("x", dtype="float64")
        z = at.scalar("z", dtype="float64")
        with pytest.raises(TypeError, match="not a SharedVariable"):
            function([x], x + 1, updates={z: z + 1.0})

    def test_update_survives_pickle_roundtrip(self):
        x = at.scalar("x", dtype="float64")
        f = function([In(x, value=1.0, update=x * 3.0)], x)
        f()
        g = pickle.loads(pickle.dumps(f))
        # fresh copy restarts from the In value (state is per-Function)
        assert float(np.asarray(g())) == 1.0
        assert float(np.asarray(g())) == 3.0


class TestOut:
    def test_borrow_output_skips_host_copy(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], Out(at.exp(x), borrow=True))
        res = f(rng.normal(size=(2, 2)))
        assert np.all(np.isfinite(np.asarray(res)))

    def test_multiple_outputs_mixed_specs(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], [Out(x * 2, borrow=True), x + 1])
        a, b = f(np.ones((2, 2)))
        np.testing.assert_allclose(np.asarray(a), 2 * np.ones((2, 2)))
        np.testing.assert_allclose(np.asarray(b), 2 * np.ones((2, 2)) - 1 + 1)


class TestOutputSubset:
    def test_subset_returns_requested_only(self):
        x = at.scalar("x", dtype="float64")
        f = function([x], [x + 1, x * 2, x ** 2])
        res = f(3.0, output_subset=[0, 2])
        assert len(res) == 2
        assert float(np.asarray(res[0])) == 4.0
        assert float(np.asarray(res[1])) == 9.0

    def test_subset_still_applies_updates(self):
        s = atp.shared(np.float64(0.0), name="s")
        x = at.scalar("x", dtype="float64")
        f = function([x], [x + 1, x * 2], updates={s: s + x})
        f(2.0, output_subset=[0])
        assert float(s.get_value()) == 2.0

    def test_subset_order_follows_request(self):
        x = at.scalar("x", dtype="float64")
        f = function([x], [x + 1, x * 2, x ** 2])
        res = f(3.0, output_subset=[2, 0])
        assert float(np.asarray(res[0])) == 9.0
        assert float(np.asarray(res[1])) == 4.0
