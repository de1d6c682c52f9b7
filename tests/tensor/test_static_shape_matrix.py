"""Static-shape inference matrix: every op family's `.type.shape`
propagation with fully- and partially-known inputs.  TPU-design
property under test (SURVEY §2.11): static shapes are what let XLA tile
onto the MXU — the graph must PRESERVE every statically-known extent
and never invent one (no static-1 narrowing, `_keep_type` contract).
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.tensor.type import TensorType

rng = np.random.default_rng(17)


def T(*shape, dtype="float64", name="x"):
    return TensorType(dtype, shape)(name)


class TestElemwiseShapes:
    def test_full_static_broadcast(self):
        a = T(3, 4)
        b = T(1, 4)
        assert (a + b).type.shape == (3, 4)
        assert (b + b).type.shape == (1, 4)

    def test_partial_static(self):
        a = T(None, 4)
        b = T(3, None)
        assert (a * b).type.shape == (3, 4)

    def test_static_one_meets_none(self):
        """A static-1 dim broadcast against None resolves to None (the
        runtime extent of the other side) — never stays 1."""
        a = T(1, 4)
        b = T(None, 4)
        assert (a + b).type.shape == (None, 4)

    def test_scalar_operand_keeps_tensor_shape(self):
        a = T(2, 5)
        s = at.scalar("s", dtype="float64")
        assert (a + s).type.shape == (2, 5)

    def test_comparison_shapes(self):
        a = T(3, 1)
        b = T(1, 7)
        assert tm.lt(a, b).type.shape == (3, 7)


class TestDotShapes:
    def test_dot_static(self):
        assert at.dot(T(3, 4), T(4, 5)).type.shape == (3, 5)
        assert at.dot(T(3, 4), T(4)).type.shape == (3,)
        assert at.dot(T(4), T(4, 5)).type.shape == (5,)
        assert at.dot(T(4), T(4)).type.shape == ()

    def test_dot_partial(self):
        assert at.dot(T(None, 4), T(4, 5)).type.shape == (None, 5)
        assert at.dot(T(3, None), T(None, 5)).type.shape == (3, 5)

    def test_batched_dot(self):
        assert at.batched_dot(T(7, 3, 4), T(7, 4, 2)).type.shape == (7, 3, 2)
        assert at.batched_dot(T(None, 3, 4), T(None, 4, 2)).type.shape[1:] \
            == (3, 2)

    def test_tensordot(self):
        out = at.tensordot(T(2, 3, 4), T(3, 4, 5), axes=2)
        assert out.type.shape == (2, 5)

    def test_outer(self):
        assert at.outer(T(3), T(5)).type.shape == (3, 5)


class TestReduceShapes:
    def test_axis_grid(self):
        x = T(2, 3, 4)
        assert at.sum(x).type.shape == ()
        assert at.sum(x, axis=0).type.shape == (3, 4)
        assert at.sum(x, axis=(0, 2)).type.shape == (3,)
        assert at.sum(x, axis=1, keepdims=True).type.shape == (2, 1, 4)

    def test_argmax_shape(self):
        assert at.argmax(T(2, 5), axis=1).type.shape == (2,)

    def test_partial_none_kept(self):
        x = T(None, 3)
        assert at.max(x, axis=1).type.shape == (None,)


class TestSubtensorShapes:
    def test_literal_slices(self):
        x = T(10, 8)
        assert x[2:7].type.shape == (5, 8)
        assert x[::2].type.shape == (5, 8)
        assert x[::-1].type.shape == (10, 8)
        assert x[1:9:3, 2:3].type.shape == (3, 1)
        assert x[-3:].type.shape == (3, 8)

    def test_int_index_drops_dim(self):
        x = T(10, 8)
        assert x[0].type.shape == (8,)
        assert x[:, -1].type.shape == (10,)

    def test_newaxis(self):
        x = T(4, 5)
        assert x[None].type.shape == (1, 4, 5)
        assert x[:, None, :].type.shape == (4, 1, 5)

    def test_slices_on_none_dim(self):
        x = T(None, 8)
        assert x[2:7].type.shape[1] == 8
        assert x[0].type.shape == (8,)

    def test_advanced_vec_index(self):
        x = T(10, 8)
        idx = at.as_tensor_variable(np.array([1, 2, 3]))
        assert x[idx].type.shape == (3, 8)

    def test_set_subtensor_keeps_shape(self):
        x = T(6, 4)
        out = at.set_subtensor(x[:2], 0.0)
        assert out.type.shape == (6, 4)


class TestStructuralShapes:
    def test_join_adds_extents(self):
        assert at.join(0, T(2, 5), T(3, 5)).type.shape == (5, 5)
        assert at.join(1, T(2, 5), T(2, 1)).type.shape == (2, 6)

    def test_join_none_poisons_axis_only(self):
        out = at.join(0, T(None, 5), T(3, 5))
        assert out.type.shape == (None, 5)

    def test_stack(self):
        assert at.stack([T(3, 4), T(3, 4)], axis=0).type.shape == (2, 3, 4)
        assert at.stack([T(3, 4), T(3, 4)], axis=2).type.shape == (3, 4, 2)

    def test_split_static_sizes(self):
        a, b = at.split(T(7, 2), [3, 4], 2, axis=0)
        assert a.type.shape == (3, 2) and b.type.shape == (4, 2)

    def test_reshape_constant_target(self):
        assert at.reshape(T(3, 4), (2, 6)).type.shape == (2, 6)
        assert at.reshape(T(3, 4), (12,)).type.shape == (12,)

    def test_reshape_minus_one_resolved(self):
        assert at.reshape(T(3, 4), (2, -1)).type.shape == (2, 6)
        assert at.reshape(T(None, 4), (-1,)).type.shape == (None,)

    def test_dimshuffle(self):
        x = T(2, 3, 4)
        assert x.dimshuffle(2, 0, 1).type.shape == (4, 2, 3)
        assert x.dimshuffle("x", 0, 1, 2).type.shape == (1, 2, 3, 4)

    def test_flatten(self):
        assert at.flatten(T(3, 4)).type.shape == (12,)
        assert at.flatten(T(None, 4)).type.shape == (None,)
        assert at.flatten(T(2, 3, 4), ndim=2).type.shape == (2, 12)

    def test_tile_repeat(self):
        assert at.tile(T(2, 3), (2, 2)).type.shape == (4, 6)
        assert at.repeat(T(2, 3), 3, axis=1).type.shape == (2, 9)

    def test_transpose(self):
        assert T(3, 5).T.type.shape == (5, 3)


class TestConstructorShapes:
    def test_eye_alloc_arange(self):
        assert at.eye(4).type.shape == (4, 4)
        assert at.eye(3, 5).type.shape == (3, 5)
        assert at.alloc(0.0, 3, 7).type.shape == (3, 7)
        assert at.arange(10).type.shape == (10,)
        assert at.arange(2, 11, 3).type.shape == (3,)

    def test_zeros_ones_like(self):
        x = T(4, None)
        assert at.zeros_like(x).type.shape == (4, None)
        assert at.ones_like(x).type.shape == (4, None)

    def test_broadcast_to(self):
        out = at.extra_ops.broadcast_to(T(1, 4), (6, 4))
        assert out.type.shape == (6, 4)


class TestLinalgShapes:
    def test_matrix_ops(self):
        import aesara_tpu.tensor.nlinalg as nl
        import aesara_tpu.tensor.slinalg as sl

        A = T(4, 4)
        assert nl.det(A).type.shape == ()
        assert nl.matrix_inverse(A).type.shape == (4, 4)
        assert sl.cholesky(A).type.shape == (4, 4)
        assert sl.solve(A, T(4, 2)).type.shape == (4, 2)
        assert sl.kron(T(2, 3), T(4, 5)).type.shape == (8, 15)

    def test_nnet_conv_static(self):
        from aesara_tpu.tensor.nnet import conv2d

        x = T(2, 3, 10, 10)
        k = T(5, 3, 3, 3)
        out = conv2d(x, k, border_mode="valid")
        assert out.type.shape == (2, 5, 8, 8)
        out_full = conv2d(x, k, border_mode="full")
        assert out_full.type.shape == (2, 5, 12, 12)


class TestNoNarrowingContract:
    """_keep_type: rewrites must never replace a (None, …) runtime
    extent with a static 1 — these build+rewrite checks pin the public
    symptom (types stay compatible after FAST_RUN compilation)."""

    @pytest.mark.parametrize("expr_of,np_of", [
        (lambda a, b: (a * b) / a, lambda a, b: (a * b) / a),
        (lambda a, b: a + b - a, lambda a, b: a + b - a),
        (lambda a, b: (a * b) * tm.reciprocal(a),
         lambda a, b: (a * b) * (1.0 / a)),
    ], ids=["mul_div", "add_sub", "mul_recip"])
    def test_cancellation_keeps_runtime_shape(self, expr_of, np_of):
        from aesara_tpu.compile.function import function

        a = at.matrix("a", dtype="float64")
        b = at.row("b", dtype="float64")     # static (1, None): cancellation bait
        out = expr_of(a, b)
        f = function([a, b], out, mode="FAST_RUN")
        av = rng.normal(size=(3, 4)) + 3.0
        bv = rng.normal(size=(1, 4)) + 3.0
        r = np.asarray(f(av, bv))
        assert r.shape == (3, 4)
        np.testing.assert_allclose(r, np_of(av, bv), rtol=1e-5)
