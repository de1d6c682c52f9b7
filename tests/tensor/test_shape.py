"""The shape-op family (reference ``aesara/tensor/shape.py``;
tests/tensor/test_shape.py): Shape/Shape_i/SpecifyShape/Reshape/
Unbroadcast behavior, static inference, error paths, gradients."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad, verify_grad
from aesara_tpu.tensor.shape import (
    Reshape,
    Shape,
    Shape_i,
    SpecifyShape,
    reshape,
    shape,
    shape_padaxis,
    shape_padleft,
    shape_padright,
    specify_broadcastable,
    specify_shape,
    unbroadcast,
)

rng = np.random.default_rng(555)
M = rng.normal(size=(3, 4))


class TestShape:
    def test_shape_value(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], shape(x), mode="PY")
        np.testing.assert_array_equal(np.asarray(f(M)), (3, 4))

    def test_shape_i(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], [x.shape[0], x.shape[1]], mode="PY")
        a, b = f(M)
        assert int(a) == 3 and int(b) == 4

    def test_static_shape_constant_folds(self):
        """shape of a fully-static tensor folds to a constant: no Shape
        op survives FAST_RUN."""
        x = at.tensor("x", dtype="float64", shape=(3, 4))
        f = function([x], x.shape[0] + x.shape[1], mode="FAST_RUN")
        assert not any(
            isinstance(n.op, (Shape, Shape_i)) for n in f.fgraph.apply_nodes
        )
        assert int(np.asarray(f(M))) == 7

    def test_shape_grad_disconnected(self):
        x = at.matrix("x", dtype="float64")
        # grad through shape must be zero/disconnected, not an error
        g = grad(shape(x).sum(), x, disconnected_inputs="ignore")
        f = function([x], g, mode="PY")
        np.testing.assert_array_equal(np.asarray(f(M)), np.zeros_like(M))


class TestSpecifyShape:
    def test_valid_passthrough(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], specify_shape(x, (3, 4)), mode="PY")
        np.testing.assert_array_equal(np.asarray(f(M)), M)

    def test_runtime_mismatch_raises(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], specify_shape(x, (3, 5)), mode="PY")
        with pytest.raises((AssertionError, ValueError, TypeError)):
            f(M)

    def test_sharpens_static_type(self):
        x = at.matrix("x", dtype="float64")
        y = specify_shape(x, (3, 4))
        assert y.type.shape == (3, 4)

    def test_build_time_conflict_raises(self):
        x = at.tensor("x", dtype="float64", shape=(3, 4))
        with pytest.raises((AssertionError, TypeError, ValueError)):
            specify_shape(x, (5, 4))

    def test_grad_passes_through(self):
        verify_grad(lambda v: specify_shape(v, (3, 4)).sum(), [M], rng=rng)

    def test_specify_broadcastable(self):
        x = at.matrix("x", dtype="float64")
        y = specify_broadcastable(x, 0)
        assert y.type.shape[0] == 1


class TestReshape:
    @pytest.mark.parametrize("new", [(4, 3), (12,), (2, 6), (1, 12),
                                     (2, 3, 2)])
    def test_values(self, new):
        x = at.matrix("x", dtype="float64")
        f = function([x], reshape(x, new, ndim=len(new)), mode="PY")
        np.testing.assert_array_equal(np.asarray(f(M)), M.reshape(new))

    def test_minus_one_inference(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], reshape(x, (2, -1)), mode="FAST_RUN")
        np.testing.assert_array_equal(np.asarray(f(M)), M.reshape(2, -1))

    def test_symbolic_target(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], reshape(x, (x.shape[1], x.shape[0])), mode="PY")
        np.testing.assert_array_equal(np.asarray(f(M)), M.reshape(4, 3))

    def test_wrong_size_raises_at_runtime(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], reshape(x, (5, 5), ndim=2), mode="PY")
        with pytest.raises((ValueError, TypeError)):
            f(M)

    def test_grad(self):
        verify_grad(lambda v: reshape(v, (4, 3)).sum(axis=0).prod(), [M],
                    rng=rng)

    def test_useless_reshape_removed(self):
        x = at.tensor("x", dtype="float64", shape=(3, 4))
        f = function([x], reshape(x, (3, 4)), mode="FAST_RUN")
        assert not any(isinstance(n.op, Reshape)
                       for n in f.fgraph.apply_nodes)


class TestPadding:
    def test_padleft_padright_padaxis(self):
        x = at.matrix("x", dtype="float64")
        assert shape_padleft(x).type.ndim == 3
        assert shape_padright(x, 2).type.ndim == 4
        f = function([x], [shape_padleft(x), shape_padright(x),
                           shape_padaxis(x, 1)], mode="PY")
        a, b, c = f(M)
        assert np.asarray(a).shape == (1, 3, 4)
        assert np.asarray(b).shape == (3, 4, 1)
        assert np.asarray(c).shape == (3, 1, 4)


class TestUnbroadcast:
    def test_removes_static_one(self):
        x = at.tensor("x", dtype="float64", shape=(1, 4))
        y = unbroadcast(x, 0)
        assert y.type.shape[0] is None

    def test_value_passthrough(self):
        x = at.tensor("x", dtype="float64", shape=(1, 4))
        f = function([x], unbroadcast(x, 0) * 2, mode="PY")
        v = rng.normal(size=(1, 4))
        np.testing.assert_allclose(np.asarray(f(v)), v * 2)


class TestStaticInference:
    """Static shapes propagate through ops at graph-build time (the
    XLA-first design requirement)."""

    def test_elemwise_broadcast_shapes(self):
        a = at.tensor("a", dtype="float64", shape=(3, 1))
        b = at.tensor("b", dtype="float64", shape=(1, 4))
        assert (a + b).type.shape == (3, 4)

    def test_dot_shape(self):
        a = at.tensor("a", dtype="float64", shape=(3, 5))
        b = at.tensor("b", dtype="float64", shape=(5, 7))
        assert at.dot(a, b).type.shape == (3, 7)

    def test_sum_axis_shape(self):
        a = at.tensor("a", dtype="float64", shape=(3, 5, 7))
        assert a.sum(axis=1).type.shape == (3, 7)
        assert a.sum(axis=(0, 2), keepdims=True).type.shape == (1, 5, 1)

    def test_concatenate_shape(self):
        a = at.tensor("a", dtype="float64", shape=(3, 4))
        b = at.tensor("b", dtype="float64", shape=(2, 4))
        assert at.concatenate([a, b], axis=0).type.shape == (5, 4)

    def test_incompatible_dot_raises(self):
        a = at.tensor("a", dtype="float64", shape=(3, 5))
        b = at.tensor("b", dtype="float64", shape=(4, 7))
        with pytest.raises(TypeError):
            at.dot(a, b)
