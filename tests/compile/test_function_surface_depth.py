"""Function-call surface depth (reference
``tests/compile/function/test_types.py`` 1,323 LoC +
``test_pfunc.py`` 1,098): keyword dispatch, In(value) defaults,
In(update) carried state, output_subset demand evaluation, copy()
share/swap/delete-updates semantics, strictness, trust_input, and
call-counter bookkeeping."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.compile.io import In, Out

MODES = ["PY", "FAST_RUN"]


def fvec(name):
    return at.vector(name, dtype="float64")


class TestKeywordDispatch:
    def _f(self, mode="PY"):
        a, b = fvec("a"), fvec("b")
        return function([a, b], a - b, mode=mode)

    @pytest.mark.parametrize("mode", MODES)
    def test_by_name(self, mode):
        f = self._f(mode)
        got = f(b=np.ones(2), a=np.full(2, 3.0))
        np.testing.assert_allclose(np.asarray(got), [2.0, 2.0])

    def test_mixed_positional_kw(self):
        f = self._f()
        got = f(np.full(2, 3.0), b=np.ones(2))
        np.testing.assert_allclose(np.asarray(got), [2.0, 2.0])

    def test_duplicate_raises(self):
        f = self._f()
        with pytest.raises(TypeError, match="twice"):
            f(np.ones(2), a=np.ones(2))

    def test_unknown_name_raises(self):
        f = self._f()
        with pytest.raises(TypeError, match="unknown input"):
            f(np.ones(2), np.ones(2), c=np.ones(2))

    def test_missing_raises(self):
        f = self._f()
        with pytest.raises(TypeError, match="missing input"):
            f(np.ones(2))

    def test_too_many_positional_raises(self):
        f = self._f()
        with pytest.raises(TypeError, match="positional"):
            f(np.ones(2), np.ones(2), np.ones(2))


class TestInValueDefaults:
    def test_default_used_and_overridable(self):
        x = fvec("x")
        d = fvec("d")
        f = function([x, In(d, value=np.full(2, 10.0))], x + d, mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.ones(2))), [11.0, 11.0])
        np.testing.assert_allclose(
            np.asarray(f(np.ones(2), np.zeros(2))), [1.0, 1.0])

    def test_default_scalar_python_value(self):
        x = at.scalar("x", dtype="float64")
        s = at.scalar("s", dtype="float64")
        f = function([x, In(s, value=2.5)], x * s, mode="PY")
        assert float(np.asarray(f(2.0))) == 5.0
        assert float(np.asarray(f(2.0, 4.0))) == 8.0


class TestInUpdateState:
    def test_state_carries_across_calls(self):
        x = at.scalar("x", dtype="float64")
        s = at.scalar("s", dtype="float64")
        f = function([x, In(s, value=0.0, update=s + x)], s, mode="PY")
        assert float(np.asarray(f(1.0))) == 0.0    # returns PRE-update s
        assert float(np.asarray(f(1.0))) == 1.0
        assert float(np.asarray(f(10.0))) == 2.0
        assert float(np.asarray(f(0.0))) == 12.0

    def test_explicit_value_resets_state(self):
        x = at.scalar("x", dtype="float64")
        s = at.scalar("s", dtype="float64")
        f = function([x, In(s, value=0.0, update=s + x)], s, mode="PY")
        f(5.0)
        f(5.0)
        # passing s explicitly overrides the carried state this call
        assert float(np.asarray(f(1.0, 100.0))) == 100.0


class TestOutputSubset:
    def _f(self, mode="PY"):
        x = fvec("x")
        s = atp.shared(np.float64(0.0), name="s")
        outs = [x + 1.0, x * 2.0, x ** 2]
        f = function([x], outs, updates={s: s + 1.0}, mode=mode)
        return f, s

    @pytest.mark.parametrize("mode", MODES)
    def test_subset_returns_requested_only(self, mode):
        f, s = self._f(mode)
        xv = np.array([2.0, 3.0])
        got = f(xv, output_subset=[2, 0])
        assert len(got) == 2
        np.testing.assert_allclose(np.asarray(got[0]), xv ** 2)
        np.testing.assert_allclose(np.asarray(got[1]), xv + 1.0)

    def test_updates_still_run(self):
        f, s = self._f()
        f(np.ones(2), output_subset=[0])
        f(np.ones(2), output_subset=[1])
        assert float(s.get_value()) == 2.0

    def test_full_call_unaffected_after_subset(self):
        f, s = self._f()
        f(np.ones(2), output_subset=[0])
        got = f(np.ones(2))
        assert len(got) == 3


class TestFunctionCopy:
    def _train_fn(self):
        x = fvec("x")
        w = atp.shared(np.zeros(2), name="w")
        loss = ((x - w) ** 2).sum()
        f = function([x], loss, updates={w: w + x}, mode="PY")
        return f, w, x

    def test_copy_isolates_state(self):
        f, w, _ = self._train_fn()
        g = f.copy()
        f(np.ones(2))
        np.testing.assert_allclose(w.get_value(), [1.0, 1.0])
        # the copy's state is untouched, and stepping it leaves the
        # original's alone
        g(np.full(2, 5.0))
        np.testing.assert_allclose(w.get_value(), [1.0, 1.0])

    def test_copy_share_memory(self):
        f, w, _ = self._train_fn()
        g = f.copy(share_memory=True)
        f(np.ones(2))
        g(np.ones(2))
        np.testing.assert_allclose(w.get_value(), [2.0, 2.0])

    def test_copy_swap(self):
        f, w, _ = self._train_fn()
        w2 = atp.shared(np.full(2, 7.0), name="w2")
        g = f.copy(swap={w: w2})
        g(np.ones(2))
        np.testing.assert_allclose(w2.get_value(), [8.0, 8.0])
        np.testing.assert_allclose(w.get_value(), [0.0, 0.0])

    def test_copy_delete_updates(self):
        f, w, _ = self._train_fn()
        g = f.copy(delete_updates=True, share_memory=True)
        g(np.ones(2))
        np.testing.assert_allclose(w.get_value(), [0.0, 0.0])

    def test_copy_value_parity(self):
        f, w, x = self._train_fn()
        g = f.copy()
        xv = np.array([0.5, -0.5])
        np.testing.assert_allclose(float(np.asarray(f(xv))),
                                   float(np.asarray(g(xv))))


class TestStrictAndTrust:
    def test_strict_rejects_convertible(self):
        x = fvec("x")
        f = function([In(x, strict=True)], x + 1.0, mode="PY")
        with pytest.raises(TypeError):
            f([1.0, 2.0])          # list needs conversion: strict says no
        np.testing.assert_allclose(
            np.asarray(f(np.array([1.0, 2.0]))), [2.0, 3.0])

    def test_downcast_control(self):
        x = at.vector("x", dtype="float32")
        f_no = function([In(x, allow_downcast=False)], x * 2, mode="PY")
        with pytest.raises(TypeError):
            f_no(np.array([1.0], dtype="float64") + 1e-10)
        f_yes = function([In(x, allow_downcast=True)], x * 2, mode="PY")
        np.testing.assert_allclose(
            np.asarray(f_yes(np.array([1.5], dtype="float64"))), [3.0])

    def test_trust_input_skips_filter(self):
        x = fvec("x")
        f = function([x], x + 1.0, mode="PY")
        f.trust_input = True
        # exact-dtype array passes straight through
        np.testing.assert_allclose(np.asarray(f(np.ones(2))), [2.0, 2.0])


class TestCallBookkeeping:
    def test_n_calls_and_single_output_shapes(self):
        x = fvec("x")
        f = function([x], x + 0.0, mode="PY")
        assert f.n_calls == 0
        f(np.ones(2))
        f(np.ones(2))
        assert f.n_calls == 2

    def test_zero_outputs_returns_empty(self):
        s = atp.shared(np.float64(0.0))
        f = function([], [], updates={s: s + 1.0}, mode="PY")
        assert f() == []
        assert float(s.get_value()) == 1.0

    def test_no_inputs_function(self):
        f = function([], at.constant(np.arange(3.0)) * 2, mode="PY")
        np.testing.assert_allclose(np.asarray(f()), [0.0, 2.0, 4.0])

    def test_list_vs_single_output_contract(self):
        x = fvec("x")
        single = function([x], x + 1.0, mode="PY")
        listed = function([x], [x + 1.0], mode="PY")
        a = single(np.ones(2))
        b = listed(np.ones(2))
        assert not isinstance(a, list)
        assert isinstance(b, list) and len(b) == 1
