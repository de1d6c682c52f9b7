"""Function-pipeline depth wave (VERDICT r4 item 4): behaviors the
reference pins in ``tests/compile/function/test_pfunc.py`` /
``test_types.py`` that the earlier function matrices did not cover —
default-update graphs (expressions, chains, multiple), update
validation errors, In(strict/mutable) semantics, aliasing rules between
inputs/outputs/shared state, givens-on-shared, and update_same/equiv
corner cases.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.compile.io import In

rng = np.random.default_rng(911)


def f64(*shape):
    return rng.normal(size=shape)


# ---------------------------------------------------------------------------
# default updates (reference test_default_updates{,_expressions,_multiple,
# _chained})
# ---------------------------------------------------------------------------

class TestDefaultUpdates:
    def test_expression_default_update(self):
        s = atp.shared(np.float64(1.0), name="s")
        s.default_update = s * 2.0 + 1.0
        f = function([], s, mode="FAST_RUN")
        assert float(np.asarray(f())) == 1.0
        assert float(s.get_value()) == 3.0
        f()
        assert float(s.get_value()) == 7.0

    def test_multiple_shareds_each_default_update(self):
        a = atp.shared(np.float64(0.0), name="a")
        b = atp.shared(np.float64(10.0), name="b")
        a.default_update = a + 1.0
        b.default_update = b - 1.0
        f = function([], a + b, mode="FAST_RUN")
        assert float(np.asarray(f())) == 10.0
        assert float(a.get_value()) == 1.0
        assert float(b.get_value()) == 9.0

    def test_chained_default_updates(self):
        """b's default update reads a; a's reads itself.  Both updates
        see the PRE-call values (simultaneous semantics)."""
        a = atp.shared(np.float64(2.0), name="a")
        b = atp.shared(np.float64(100.0), name="b")
        a.default_update = a * 2.0
        b.default_update = b + a  # pre-update a
        f = function([], b, mode="FAST_RUN")
        f()
        assert float(a.get_value()) == 4.0
        assert float(b.get_value()) == 102.0
        f()
        assert float(a.get_value()) == 8.0
        assert float(b.get_value()) == 106.0

    def test_explicit_update_overrides_default(self):
        s = atp.shared(np.float64(1.0), name="s")
        s.default_update = s + 100.0
        f = function([], [], updates={s: s + 1.0}, mode="FAST_RUN")
        f()
        assert float(s.get_value()) == 2.0

    def test_no_default_updates_true_freezes_all(self):
        s = atp.shared(np.float64(1.0), name="s")
        s.default_update = s + 1.0
        f = function([], s, no_default_updates=True, mode="FAST_RUN")
        f()
        assert float(s.get_value()) == 1.0

    def test_no_default_updates_list_selective(self):
        a = atp.shared(np.float64(0.0), name="a")
        b = atp.shared(np.float64(0.0), name="b")
        a.default_update = a + 1.0
        b.default_update = b + 1.0
        f = function([], a + b, no_default_updates=[a], mode="FAST_RUN")
        f()
        assert float(a.get_value()) == 0.0
        assert float(b.get_value()) == 1.0

    def test_default_update_not_applied_when_var_unused(self):
        """A shared variable that does not appear in the graph gets no
        default update applied (reference test_default_updates_partial_graph)."""
        s = atp.shared(np.float64(5.0), name="s")
        s.default_update = s + 1.0
        x = at.scalar("x", dtype="float64")
        f = function([x], x * 2.0, mode="FAST_RUN")
        f(1.0)
        assert float(s.get_value()) == 5.0


# ---------------------------------------------------------------------------
# update validation (reference test_update_err_broadcast,
# test_duplicate_updates, test_update_same, test_update_equiv)
# ---------------------------------------------------------------------------

class TestUpdateValidation:
    def test_update_wrong_ndim_rejected(self):
        s = atp.shared(np.zeros(3), name="s")
        with pytest.raises((TypeError, ValueError)):
            function([], [], updates={s: at.zeros((2, 2))}, mode="FAST_RUN")

    def test_update_wrong_dtype_rejected(self):
        s = atp.shared(np.zeros(3, dtype="float64"), name="s")
        bad = at.constant(np.zeros(3, dtype="complex128"))
        with pytest.raises((TypeError, ValueError)):
            function([], [], updates={s: bad}, mode="FAST_RUN")

    def test_update_int_narrowing_rejected(self):
        s = atp.shared(np.zeros(3, dtype="int32"), name="s")
        bad = at.constant(np.zeros(3, dtype="int64"))
        with pytest.raises((TypeError, ValueError)):
            function([], [], updates={s: bad}, mode="FAST_RUN")

    def test_duplicate_updates_rejected(self):
        s = atp.shared(np.float64(0.0), name="s")
        with pytest.raises((TypeError, ValueError)):
            function([], [], updates=[(s, s + 1.0), (s, s + 2.0)],
                     mode="FAST_RUN")

    def test_update_on_expression_rejected(self):
        """Update targets must be shared variables (or explicit inputs,
        the In(update=...) shortcut) — an intermediate expression is
        rejected."""
        x = at.scalar("x", dtype="float64")
        with pytest.raises((TypeError, ValueError)):
            function([x], [], updates={x * 2.0: x + 1.0}, mode="FAST_RUN")

    def test_update_same_identity(self):
        """s <- s is valid and a no-op (reference test_update_same)."""
        s = atp.shared(np.array([1.0, 2.0]), name="s")
        f = function([], [], updates={s: s}, mode="FAST_RUN")
        f()
        np.testing.assert_allclose(s.get_value(), [1.0, 2.0])

    def test_update_swap_pair(self):
        """Simultaneous semantics: a<->b swap works without a temp."""
        a = atp.shared(np.float64(1.0), name="a")
        b = atp.shared(np.float64(2.0), name="b")
        f = function([], [], updates=[(a, b), (b, a)], mode="FAST_RUN")
        f()
        assert float(a.get_value()) == 2.0
        assert float(b.get_value()) == 1.0

    def test_update_equiv_through_identity_graph(self):
        """An update expression structurally equal to the variable plus
        zero still compiles and behaves as identity after rewriting."""
        s = atp.shared(np.array([3.0, 4.0]), name="s")
        f = function([], [], updates={s: s + 0.0}, mode="FAST_RUN")
        f()
        np.testing.assert_allclose(s.get_value(), [3.0, 4.0])


# ---------------------------------------------------------------------------
# In(strict=..., mutable=...) semantics (reference test_param_strict,
# test_param_mutable)
# ---------------------------------------------------------------------------

class TestInStrictMutable:
    def test_strict_rejects_convertible_dtype(self):
        x = at.vector("x", dtype="float64")
        f = function([In(x, strict=True)], x * 2.0, mode="FAST_RUN")
        f(np.zeros(3, dtype="float64"))
        with pytest.raises((TypeError, ValueError)):
            f(np.zeros(3, dtype="float32"))
        with pytest.raises((TypeError, ValueError)):
            f([0.0, 1.0, 2.0])  # a list requires conversion

    def test_nonstrict_converts(self):
        x = at.vector("x", dtype="float64")
        f = function([In(x, strict=False)], x * 2.0, mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f([1.0, 2.0])), [2.0, 4.0])

    def test_mutable_false_never_destroys_input(self):
        x = at.vector("x", dtype="float64")
        # an update-shaped graph that a destructive impl could do in place
        out = at.set_subtensor(x[0], np.float64(99.0))
        f = function([In(x, mutable=False)], out, mode="FAST_RUN")
        arg = np.array([1.0, 2.0, 3.0])
        res = np.asarray(f(arg))
        assert res[0] == 99.0
        np.testing.assert_allclose(arg, [1.0, 2.0, 3.0])

    def test_allow_downcast_per_input(self):
        x = at.vector("x", dtype="float32")
        y = at.vector("y", dtype="float32")
        f = function([In(x, allow_downcast=True), In(y, allow_downcast=False)],
                     x + y, mode="FAST_RUN")
        ok64 = np.zeros(2, dtype="float64")
        ok32 = np.zeros(2, dtype="float32")
        f(ok64, ok32)
        with pytest.raises((TypeError, ValueError)):
            f(ok32, ok64)


# ---------------------------------------------------------------------------
# aliasing rules (reference TestAliasingRules)
# ---------------------------------------------------------------------------

class TestAliasingRules:
    def test_shared_constructor_copies(self):
        a = np.array([1.0, 2.0])
        s = atp.shared(a, name="s")
        a[0] = 99.0
        assert float(s.get_value()[0]) == 1.0

    def test_get_value_returns_copy_by_default(self):
        s = atp.shared(np.array([1.0, 2.0]), name="s")
        v = s.get_value()
        v[0] = 99.0
        assert float(s.get_value()[0]) == 1.0

    def test_outputs_of_two_calls_do_not_alias(self):
        x = at.vector("x", dtype="float64")
        f = function([x], x * 2.0, mode="FAST_RUN")
        r1 = np.asarray(f(np.ones(2)))
        r2 = np.asarray(f(np.full(2, 3.0)))
        np.testing.assert_allclose(r1, [2.0, 2.0])
        np.testing.assert_allclose(r2, [6.0, 6.0])

    def test_same_array_passed_twice_is_safe(self):
        """Reference test_input_aliasing_affecting_inplace_operations:
        feeding ONE buffer to two inputs must not let an in-place
        rewrite corrupt the other operand."""
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = at.inc_subtensor(x[0], np.float64(10.0)) + y
        f = function([x, y], out, mode="FAST_RUN")
        buf = np.array([1.0, 2.0])
        res = np.asarray(f(buf, buf))
        np.testing.assert_allclose(res, [12.0, 4.0])
        np.testing.assert_allclose(buf, [1.0, 2.0])

    def test_overlapping_views_passed_as_two_inputs(self):
        """Partial aliasing (two overlapping views of one base array)."""
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        out = at.inc_subtensor(x[0:2], np.float64(1.0)) * y
        f = function([x, y], out, mode="FAST_RUN")
        base = np.arange(4, dtype="float64")
        expect = base[:3].copy(); expect[0:2] += 1.0
        res = np.asarray(f(base[:3], base[1:]))
        np.testing.assert_allclose(res, expect * base[1:])
        np.testing.assert_allclose(base, np.arange(4))

    def test_update_output_does_not_alias_returned_value(self):
        """Returning the same expression that updates a shared: mutating
        the returned array must not corrupt the state."""
        s = atp.shared(np.array([1.0, 2.0]), name="s")
        new = s + 1.0
        f = function([], new, updates={s: new}, mode="FAST_RUN")
        out = np.asarray(f())
        try:
            out[0] = 999.0
        except ValueError:
            return  # immutable output is an equally valid containment
        assert float(s.get_value()[0]) == 2.0

    def test_set_value_borrow_false_copies(self):
        s = atp.shared(np.zeros(2), name="s")
        src = np.array([5.0, 6.0])
        s.set_value(src, borrow=False)
        src[0] = -1.0
        assert float(s.get_value()[0]) == 5.0


# ---------------------------------------------------------------------------
# givens depth (reference test_givens_replaces_shared_variable{,2})
# ---------------------------------------------------------------------------

class TestGivensOnShared:
    def test_replace_shared_with_input(self):
        s = atp.shared(np.float64(3.0), name="s")
        x = at.scalar("x", dtype="float64")
        out = s * 2.0
        f = function([x], out, givens={s: x}, mode="FAST_RUN")
        assert float(np.asarray(f(5.0))) == 10.0
        assert float(s.get_value()) == 3.0

    def test_replace_shared_with_other_shared(self):
        s1 = atp.shared(np.float64(3.0), name="s1")
        s2 = atp.shared(np.float64(7.0), name="s2")
        out = s1 * 2.0
        f = function([], out, givens={s1: s2}, mode="FAST_RUN")
        assert float(np.asarray(f())) == 14.0

    def test_replace_shared_with_expression_of_it(self):
        """givens={s: s+1}: the replacement may reference the replaced
        variable itself (reference test_givens_replaces_shared_variable2)."""
        s = atp.shared(np.float64(3.0), name="s")
        out = s * 2.0
        f = function([], out, givens={s: s + 1.0}, mode="FAST_RUN")
        assert float(np.asarray(f())) == 8.0

    def test_givens_on_explicit_input_substitutes_once(self):
        """givens={x: x+1} with x an explicit input: one-shot
        substitution (the replacement's inner x stays the raw input) —
        f(v) computes (v+1)*2."""
        x = at.scalar("x", dtype="float64")
        f = function([x], x * 2.0, givens={x: x + 1.0}, mode="FAST_RUN")
        assert float(np.asarray(f(5.0))) == 12.0

    def test_givens_chain_applied_once_not_fixedpoint(self):
        """A givens substitution must not re-trigger on its own result."""
        s = atp.shared(np.float64(1.0), name="s")
        f = function([], s * 1.0, givens={s: s * 2.0}, mode="FAST_RUN")
        assert float(np.asarray(f())) == 2.0  # not 4, not inf loop


# ---------------------------------------------------------------------------
# shared-variable constructor breadth (reference test_shared.py)
# ---------------------------------------------------------------------------

class TestSharedBreadth:
    def test_scalar_int_shared_keeps_int_dtype(self):
        s = atp.shared(7)
        assert "int" in s.type.dtype
        f = function([], s + 1, mode="FAST_RUN")
        assert int(np.asarray(f())) == 8

    def test_bool_array_shared(self):
        s = atp.shared(np.array([True, False]))
        assert s.type.dtype == "bool"
        f = function([], tm.sum(s.astype("int64")), mode="FAST_RUN")
        assert int(np.asarray(f())) == 1

    def test_name_and_repr(self):
        s = atp.shared(np.float64(0.0), name="momentum")
        assert "momentum" in repr(s) or s.name == "momentum"

    def test_static_shape_default_and_resizable_optout(self):
        """TPU-first divergence from the reference: shared() pins the
        value's STATIC shape by default (XLA compiles per shape), so
        set_value enforces it; shape=(None, None) opts into the
        reference's resizable behavior."""
        s = atp.shared(np.zeros((2, 3)), name="s")
        with pytest.raises((TypeError, ValueError)):
            s.set_value(np.ones((4, 5)))
        r = atp.shared(np.zeros((2, 3)), name="r", shape=(None, None))
        r.set_value(np.ones((4, 5)))
        assert r.get_value().shape == (4, 5)

    def test_strict_set_value_dtype(self):
        s = atp.shared(np.zeros(2, dtype="float32"), name="s")
        with pytest.raises((TypeError, ValueError)):
            s.set_value(np.zeros(2, dtype="float64"))

    def test_complex_shared_roundtrip(self):
        v = np.array([1 + 2j, 3 - 1j])
        s = atp.shared(v)
        f = function([], tm.real(s) + tm.imag(s), mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f()), [3.0, 2.0])
