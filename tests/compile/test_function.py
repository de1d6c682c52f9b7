"""function/shared/updates/givens semantics tests
(mirrors ``tests/compile/function`` strategy in the reference)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import UnusedInputError, function
from aesara_tpu.compile.io import In
from aesara_tpu.compile.sharedvalue import SharedVariable, shared

rng = np.random.default_rng(5)


def test_simple_function():
    x = at.scalar("x", dtype="float64")
    y = at.scalar("y", dtype="float64")
    f = function([x, y], x + y)
    assert np.isclose(f(2.0, 3.0), 5.0)


def test_multiple_outputs():
    x = at.vector("x", dtype="float64")
    f = function([x], [x.sum(), x.max()])
    res = f(np.array([1.0, 2.0, 3.0], dtype="float32"))
    assert isinstance(res, list) and len(res) == 2
    assert np.isclose(res[0], 6.0) and np.isclose(res[1], 3.0)


def test_named_inputs():
    x = at.scalar("x", dtype="float64")
    y = at.scalar("y", dtype="float64")
    f = function([x, y], x - y)
    assert np.isclose(f(y=1.0, x=4.0), 3.0)


def test_shared_and_updates():
    state = shared(np.float64(0.0), name="state")
    inc = at.scalar("inc", dtype="float64")
    f = function([inc], state, updates={state: state + inc})
    assert np.isclose(f(1.0), 0.0)  # returns pre-update value
    assert np.isclose(f(2.0), 1.0)
    assert np.isclose(state.get_value(), 3.0)


def test_shared_set_get_value():
    v = shared(np.zeros(3, dtype="float32"), name="v")
    v.set_value(np.ones(3, dtype="float32"))
    np.testing.assert_allclose(v.get_value(), 1.0)


def test_two_functions_share_state():
    state = shared(np.float64(0.0))
    f1 = function([], state, updates={state: state + 1.0})
    f2 = function([], state * 10.0)
    f1()
    f1()
    assert np.isclose(f2(), 20.0)


def test_givens():
    x = at.scalar("x", dtype="float64")
    y = at.scalar("y", dtype="float64")
    z = x * 2.0 + y
    f = function([y], z, givens={x: np.float32(5.0)})
    assert np.isclose(f(1.0), 11.0)


def test_unused_input_policy():
    x = at.scalar("x", dtype="float64")
    y = at.scalar("y", dtype="float64")
    with pytest.raises(UnusedInputError):
        function([x, y], x + 1.0)
    f = function([x, y], x + 1.0, on_unused_input="ignore")
    assert np.isclose(f(1.0, 99.0), 2.0)


def test_input_validation():
    x = at.matrix("x", dtype="float64")
    f = function([x], x.sum())
    with pytest.raises(TypeError):
        f(np.zeros(3, dtype="float32"))  # wrong ndim


def test_in_default_value():
    x = at.scalar("x", dtype="float64")
    y = at.scalar("y", dtype="float64")
    f = function([x, In(y, value=2.0)], x + y)
    assert np.isclose(f(1.0), 3.0)
    assert np.isclose(f(1.0, 10.0), 11.0)


def test_shared_in_inputs_rejected():
    s = shared(1.0)
    x = at.scalar("x", dtype="float64")
    with pytest.raises(TypeError):
        function([x, s], x * s)


def test_default_update():
    s = shared(np.float64(1.0))
    s.default_update = s * 2.0
    f = function([], s)
    f()
    f()
    assert np.isclose(s.get_value(), 4.0)


def test_no_default_updates():
    s = shared(np.float64(1.0))
    s.default_update = s * 2.0
    f = function([], s, no_default_updates=True)
    f()
    assert np.isclose(s.get_value(), 1.0)


def test_output_not_aliased_to_shared():
    s = shared(np.ones(3))
    f = function([], s, mode="PY")
    out = f()
    out[0] = 99.0
    assert s.get_value()[0] == 1.0  # deepcopy protected


def test_py_and_jax_agree_on_updates():
    for mode in ("PY", "JAX"):
        s = shared(np.arange(4, dtype="float64"), name="s")
        x = at.vector("x", dtype="float64")
        f = function([x], (s * x).sum(), updates={s: s + x}, mode=mode)
        r1 = f(np.ones(4))
        r2 = f(np.ones(4))
        assert np.isclose(r1, 6.0)
        assert np.isclose(r2, 10.0)


def test_write_only_update_target():
    """updates={z: expr} must work when z is never read by the graph
    (reference pfunc semantics: targets are function state regardless)."""
    import numpy as np
    import aesara_tpu as atp
    import aesara_tpu.tensor as at

    x = atp.shared(np.ones(3, "float32"), name="x")
    z = atp.shared(np.zeros(3, "float32"), name="z")
    for mode in ("PY", "JAX"):
        z.set_value(np.zeros(3, "float32"))
        f = atp.function([], [], updates={z: at.exp(x)}, mode=mode)
        f()
        np.testing.assert_allclose(z.get_value(), np.exp(np.ones(3)),
                                   rtol=1e-6)
