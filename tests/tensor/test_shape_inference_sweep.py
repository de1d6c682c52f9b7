"""Shape-inference sweep (VERDICT r4 item 4 test-depth): for a zoo of
op-family expressions, three shape sources must agree —

1. the static type shape inferred at build (where known),
2. the symbolic ``.shape`` graph (ShapeFeature / infer_shape),
3. the runtime result's actual shape.

This is the behavior the reference pins per-op via
``tests.unittest_tools``' ``infer_shape`` checks; here it runs as one
sweep so every family keeps the contract under the full FAST_RUN
pipeline (a wrong ``infer_shape`` poisons rewrites silently — exactly
the class of bug a differential value check cannot see when the value
path never consults shapes).
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
import aesara_tpu.tensor.nlinalg as nl
import aesara_tpu.tensor.slinalg as sl
from aesara_tpu.compile.function import function

rng = np.random.default_rng(61)


def _check(inputs, out, values):
    """Run in FAST_RUN; assert static type shape (where declared),
    symbolic shape output, and runtime shape all agree."""
    f = function(inputs, [out, out.shape], mode="FAST_RUN",
                 on_unused_input="ignore")
    res, shp = f(*values)
    res = np.asarray(res)
    np.testing.assert_array_equal(np.asarray(shp), res.shape)
    static = out.type.shape
    assert len(static) == res.ndim
    for st, rt in zip(static, res.shape):
        if st is not None:
            assert st == rt, (static, res.shape)
    return res


M = at.TensorType("float64", (None, None))
V = at.TensorType("float64", (None,))


def mk(shape, name):
    # static-1 dims declared (only statically-1 dims broadcast/drop)
    return at.TensorType(
        "float64", tuple(1 if s == 1 else None for s in shape))(name)


CASES = {
    # --- elemwise / broadcasting
    "add_bcast_row": (lambda x, y: x + y, [(3, 4), (1, 4)]),
    "mul_bcast_col": (lambda x, y: x * y, [(3, 4), (3, 1)]),
    "outer_via_dimshuffle": (
        lambda x, y: x.dimshuffle(0, "x") * y.dimshuffle("x", 0),
        [(3,), (5,)]),
    # --- reductions
    "sum_axis0": (lambda x: x.sum(axis=0), [(3, 4)]),
    "sum_keepdims": (lambda x: x.sum(axis=1, keepdims=True), [(3, 4)]),
    "max_all": (lambda x: x.max(), [(3, 4)]),
    "argmax_axis": (lambda x: tm.argmax(x, axis=1), [(3, 4)]),
    "prod_neg_axis": (lambda x: x.prod(axis=-1), [(2, 3, 4)]),
    # --- shape ops
    "reshape_m1": (lambda x: x.reshape((6, -1)), [(3, 4)]),
    "flatten": (lambda x: x.flatten(), [(3, 4)]),
    "transpose": (lambda x: x.T, [(3, 4)]),
    "dimshuffle_drop": (lambda x: x.dimshuffle(1), [(1, 4)]),
    # --- joins / splits
    "concat0": (lambda x, y: at.concatenate([x, y], axis=0),
                [(2, 4), (3, 4)]),
    "concat1": (lambda x, y: at.concatenate([x, y], axis=1),
                [(3, 2), (3, 5)]),
    "stack_new_axis": (lambda x, y: at.stack([x, y]), [(3, 4), (3, 4)]),
    "repeat_axis": (lambda x: at.extra_ops.repeat(x, 3, axis=0), [(2, 4)]),
    "tile": (lambda x: at.tile(x, (2, 3)), [(2, 4)]),
    # --- subtensor
    "slice_step": (lambda x: x[::2], [(7, 4)]),
    "slice_neg": (lambda x: x[1:-1, 2:], [(6, 5)]),
    "int_index": (lambda x: x[2], [(6, 5)]),
    "adv_vec_index": (lambda x: x[at.as_tensor_variable(
        np.array([0, 2, 1]))], [(6, 5)]),
    "set_subtensor": (lambda x: at.set_subtensor(x[0], 1.0), [(6, 5)]),
    # --- linalg
    "dot_mm": (lambda x, y: tm.dot(x, y), [(3, 4), (4, 5)]),
    "dot_mv": (lambda x, y: tm.dot(x, y), [(3, 4), (4,)]),
    "batched_dot": (lambda x, y: tm.batched_dot(x, y),
                    [(2, 3, 4), (2, 4, 5)]),
    "matrix_inverse": (lambda x: nl.matrix_inverse(x + 4 * at.eye(4)),
                       [(4, 4)]),
    "cholesky": (lambda x: sl.cholesky(
        tm.dot(x, x.T) + 4 * at.eye(4)), [(4, 4)]),
    "qr_q": (lambda x: nl.qr(x, mode="reduced")[0], [(5, 3)]),
    "svd_s": (lambda x: nl.svd(x, compute_uv=False), [(5, 3)]),
    # --- extra ops
    "cumsum0": (lambda x: at.extra_ops.cumsum(x, axis=0), [(3, 4)]),
    "diff": (lambda x: at.extra_ops.diff(x, axis=0), [(5, 4)]),
    # --- special / nnet-ish
    "softmax_rows": (lambda x: at.special.softmax(x, axis=-1), [(3, 7)]),
    "sort_axis": (lambda x: at.sort(x, axis=1), [(3, 7)]),
    "topk_values": (lambda x: at.sort(x, axis=-1)[:, -3:], [(3, 7)]),
    # --- allocation
    "alloc": (lambda x: at.alloc(x[0, 0], 4, 5), [(2, 2)]),
    "zeros_like": (lambda x: at.zeros_like(x), [(3, 4)]),
    "eye_dynamic": (lambda x: at.eye(x.shape[0]), [(3, 4)]),
    "arange_len": (lambda x: at.arange(x.shape[1]), [(3, 4)]),
}


def test_data_dependent_shapes_py_mode():
    """bincount/unique produce data-DEPENDENT shapes: they cannot lower
    to XLA (static-shape compilation) and run through the py oracle;
    symbolic .shape still agrees with runtime there."""
    x = at.vector("x", dtype="int64")
    for build in (lambda v: at.extra_ops.bincount(v),
                  lambda v: at.extra_ops.unique(v)):
        out = build(x)
        out = out[0] if isinstance(out, (list, tuple)) else out
        f = function([x], [out, out.shape], mode="PY")
        res, shp = f(np.array([0, 1, 1, 3]))
        np.testing.assert_array_equal(np.asarray(shp),
                                      np.asarray(res).shape)


@pytest.mark.parametrize("name", sorted(CASES))
def test_shape_inference(name):
    build, shapes = CASES[name]
    xs = [mk(s, f"x{i}") for i, s in enumerate(shapes)]
    vals = [rng.normal(size=s) for s in shapes]
    out = build(*xs)
    _check(xs, out, vals)


class TestStaticShapePropagation:
    """Static dims declared on inputs must propagate through the
    pipeline into output types (not just be consistent)."""

    def test_static_through_elemwise(self):
        x = at.TensorType("float64", (3, None))("x")
        y = at.TensorType("float64", (None, 4))("y")
        out = tm.tanh(x + y)
        assert out.type.shape == (3, 4)

    def test_static_through_dot(self):
        x = at.TensorType("float64", (3, 5))("x")
        y = at.TensorType("float64", (5, None))("y")
        assert tm.dot(x, y).type.shape == (3, None)

    def test_static_through_reduce(self):
        x = at.TensorType("float64", (3, 5))("x")
        assert x.sum(axis=1).type.shape == (3,)
        assert x.sum(axis=0, keepdims=True).type.shape == (1, 5)

    def test_static_through_concat(self):
        x = at.TensorType("float64", (3, 5))("x")
        y = at.TensorType("float64", (2, 5))("y")
        assert at.concatenate([x, y], axis=0).type.shape == (5, 5)

    def test_static_through_subtensor(self):
        x = at.TensorType("float64", (10, 5))("x")
        assert x[2:7].type.shape == (5, 5)
        assert x[::2].type.shape == (5, 5)
        assert x[3].type.shape == (5,)

    def test_static_through_blockwise_linalg(self):
        x = at.TensorType("float64", (4, 4))("x")
        assert nl.matrix_inverse(x).type.shape == (4, 4)

    def test_specify_shape_narrows(self):
        x = at.matrix("x", dtype="float64")
        y = at.specify_shape(x, (3, 4))
        assert y.type.shape == (3, 4)

    def test_runtime_agrees_with_narrowed(self):
        x = at.matrix("x", dtype="float64")
        y = at.specify_shape(x, (3, 4)) * 2.0
        f = function([x], y, mode="FAST_RUN")
        assert f(np.ones((3, 4))).shape == (3, 4)
        with pytest.raises(Exception):
            f(np.ones((2, 4)))
