"""type_other + raise_op + updates-dict depth wave (VERDICT r4 item 4;
reference ``tests/tensor/test_type_other.py`` + ``tests/test_raise_op.py``
186 LoC + ``tests/test_updates.py`` 70 LoC): symbolic slices,
NoneType sentinels, Assert op semantics across backends, and the
OrderedUpdates-style dict algebra the reference pins.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.raise_op import Assert, assert_op
from aesara_tpu.tensor.type_other import (
    MakeSlice,
    NoneTypeT,
    SliceConstant,
    SliceType,
    as_symbolic_slice,
    make_slice,
    none_type_t,
    slicetype,
)

rng = np.random.default_rng(121212)


class TestSliceType:
    def test_make_slice_runtime(self):
        a = at.lscalar("a")
        b = at.lscalar("b")
        s = make_slice(a, b, None)
        assert isinstance(s.type, SliceType)
        x = at.vector("x", dtype="float64")
        out = x[s]
        f = function([x, a, b], out, mode="PY")
        xv = rng.normal(size=8)
        np.testing.assert_allclose(np.asarray(f(xv, 2, 6)), xv[2:6])

    def test_slice_constant(self):
        sc = SliceConstant(slicetype, slice(1, 5, 2))
        assert sc.data == slice(1, 5, 2)
        assert isinstance(sc.type, SliceType)

    def test_as_symbolic_slice_roundtrip(self):
        s = as_symbolic_slice(slice(None, 3, None))
        assert isinstance(s.type, SliceType)

    def test_slice_type_filter_rejects_non_slice(self):
        with pytest.raises((TypeError, ValueError)):
            slicetype.filter(42)

    def test_slice_values_eq(self):
        assert slicetype.values_eq(slice(1, 2), slice(1, 2))
        assert not slicetype.values_eq(slice(1, 2), slice(1, 3))

    def test_none_type_sentinel(self):
        n = none_type_t()
        assert isinstance(n.type, NoneTypeT)
        assert none_type_t.filter(None) is None
        with pytest.raises((TypeError, ValueError)):
            none_type_t.filter(0)

    def test_symbolic_step_slice(self):
        st = at.lscalar("st")
        x = at.vector("x", dtype="float64")
        out = x[make_slice(None, None, st)]
        f = function([x, st], out, mode="PY")
        xv = rng.normal(size=9)
        np.testing.assert_allclose(np.asarray(f(xv, 3)), xv[::3])


class TestAssertOp:
    def test_passes_value_through(self):
        x = at.vector("x", dtype="float64")
        out = assert_op(x * 2.0, tm.all(x > 0.0))
        for mode in ("PY", "FAST_RUN"):
            f = function([x], out, mode=mode)
            xv = np.abs(rng.normal(size=4)) + 0.1
            np.testing.assert_allclose(np.asarray(f(xv)), xv * 2.0)

    def test_raises_with_message_py(self):
        x = at.vector("x", dtype="float64")
        out = Assert("x must be positive")(x, tm.all(x > 0.0))
        f = function([x], out, mode="PY")
        with pytest.raises(Exception, match="positive"):
            f(np.array([-1.0, 2.0]))

    def test_jit_path_pass_through_divergence_pinned(self):
        """PINNED divergence (tests/test_error_matrices.py): XLA cannot
        raise data-dependent host exceptions, so Assert passes values
        through on the jit path; the PY path raises."""
        x = at.vector("x", dtype="float64")
        out = Assert("jit guard")(x, tm.all(x > 0.0))
        f = function([x], out, mode="JAX")
        np.testing.assert_allclose(np.asarray(f(np.array([-1.0, 2.0]))),
                                   [-1.0, 2.0])

    def test_multiple_conditions(self):
        x = at.vector("x", dtype="float64")
        out = assert_op(x, tm.all(x > 0.0), tm.all(x < 10.0))
        f = function([x], out, mode="PY")
        f(np.array([1.0, 2.0]))
        with pytest.raises(Exception):
            f(np.array([1.0, 20.0]))

    def test_grad_passes_through(self):
        from aesara_tpu.gradient import grad

        x = at.vector("x", dtype="float64")
        cost = tm.sum(tm.sqr(assert_op(x, tm.all(x > -100.0))))
        g = grad(cost, x)
        f = function([x], g, mode="FAST_RUN")
        xv = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(xv)), 2 * xv)

    def test_constant_true_condition_elided(self):
        """assert(x, True) is removed by the pipeline (reference
        local_remove_useless_assert)."""
        from tests.rewrite_corpus import op_labels, rewrite_only

        x = at.vector("x", dtype="float64")
        out = assert_op(x, at.constant(np.bool_(True)))
        res = rewrite_only(out, include=("canonicalize",))
        assert "Assert" not in op_labels(res) or res is x

    def test_shape_preserved(self):
        x = at.matrix("x", dtype="float64")
        out = assert_op(x, tm.all(x < 100.0))
        assert out.type.ndim == 2
        f = function([x], out.shape, mode="FAST_RUN")
        assert tuple(np.asarray(f(np.zeros((3, 4))))) == (3, 4)


class TestUpdatesAlgebra:
    """Reference ``tests/test_updates.py``: update dicts merge like
    dicts but reject conflicting targets."""

    def test_two_functions_updating_same_shared_sequentially(self):
        s = atp.shared(np.float64(0.0), name="s")
        f1 = function([], [], updates={s: s + 1.0}, mode="FAST_RUN")
        f2 = function([], [], updates={s: s * 2.0}, mode="FAST_RUN")
        f1(); f2(); f1()
        assert float(s.get_value()) == 3.0
        s.set_value(np.float64(0.0))

    def test_update_expression_uses_multiple_shareds(self):
        a = atp.shared(np.float64(2.0), name="a")
        b = atp.shared(np.float64(3.0), name="b")
        f = function([], [], updates={a: a * b, b: a + b}, mode="FAST_RUN")
        f()  # simultaneous: both read pre-update values
        assert float(a.get_value()) == 6.0
        assert float(b.get_value()) == 5.0

    def test_update_with_input_dependency(self):
        s = atp.shared(np.zeros(3), name="s")
        x = at.vector("x", dtype="float64")
        f = function([x], [], updates={s: s + x}, mode="FAST_RUN")
        f(np.ones(3)); f(np.full(3, 2.0))
        np.testing.assert_allclose(s.get_value(), 3.0)
        s.set_value(np.zeros(3))

    def test_update_returning_new_dtype_rejected(self):
        s = atp.shared(np.zeros(3, dtype="float32"), name="s")
        bad = at.constant(np.zeros(3, dtype="float64"))
        with pytest.raises((TypeError, ValueError)):
            function([], [], updates={s: bad}, mode="FAST_RUN")

    def test_momentum_two_state_pattern(self):
        """The classic two-coupled-updates training pattern end to end."""
        w = atp.shared(np.float64(1.0), name="w")
        m = atp.shared(np.float64(0.0), name="m")
        g = w * 2.0  # grad of w^2
        new_m = 0.9 * m + 0.1 * g
        f = function([], [], updates={m: new_m, w: w - new_m},
                     mode="FAST_RUN")
        f()
        assert np.isclose(float(m.get_value()), 0.2)
        assert np.isclose(float(w.get_value()), 0.8)
