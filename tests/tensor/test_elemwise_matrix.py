"""Elemwise / DimShuffle / CAReduce case matrices (VERDICT r3 #5):
DimShuffle over the full pattern grid (permutations × 'x'-insertions ×
broadcastable-dim drops), the static-1-only broadcasting contract on
both backends, CAReduce accumulator behavior, and Elemwise output-dtype
resolution for mixed arities.

Reference model: ``/root/reference/tests/tensor/test_elemwise.py``
(DimShuffle/CAReduce/Broadcast matrices).
"""

import itertools

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker
from aesara_tpu.tensor.type import TensorType

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)
MODES = [(PY, "py"), (JAX, "jax")]

rng = np.random.default_rng(5555)


# ---------------------------------------------------------------------------
# DimShuffle pattern grid
# ---------------------------------------------------------------------------

PERMS_3D = list(itertools.permutations(range(3)))


@pytest.mark.parametrize("perm", PERMS_3D, ids=[str(p) for p in PERMS_3D])
def test_dimshuffle_all_3d_permutations(perm):
    v = rng.normal(size=(2, 3, 4))
    x = at.as_tensor_variable(v)
    out = x.dimshuffle(*perm)
    for mode, label in MODES:
        r = np.asarray(function([], out, mode=mode)())
        np.testing.assert_array_equal(r, np.transpose(v, perm),
                                      err_msg=f"{perm} {label}")


X_PATTERNS = [
    (("x", 0, 1), (2, 3), (1, 2, 3)),
    ((0, "x", 1), (2, 3), (2, 1, 3)),
    ((0, 1, "x"), (2, 3), (2, 3, 1)),
    (("x", "x", 0), (4,), (1, 1, 4)),
    ((1, "x", 0), (2, 3), (3, 1, 2)),
    (("x", 1, "x", 0, "x"), (2, 3), (1, 3, 1, 2, 1)),
]


@pytest.mark.parametrize("pattern,in_shape,out_shape", X_PATTERNS,
                         ids=[str(p[0]) for p in X_PATTERNS])
def test_dimshuffle_x_insertions(pattern, in_shape, out_shape):
    v = rng.normal(size=in_shape)
    x = at.as_tensor_variable(v)
    out = x.dimshuffle(*pattern)
    for mode, label in MODES:
        r = np.asarray(function([], out, mode=mode)())
        assert r.shape == out_shape, f"{pattern} {label}: {r.shape}"


def test_dimshuffle_drop_broadcastable():
    """Dims statically known 1 may be dropped; dims not statically 1
    may NOT (reference DimShuffle contract)."""
    x = TensorType("float64", (3, 1, 4))("x")
    out = x.dimshuffle(0, 2)  # drops the static-1 middle dim
    v = rng.normal(size=(3, 1, 4))
    for mode, label in MODES:
        r = np.asarray(function([x], out, mode=mode)(v))
        np.testing.assert_array_equal(r, v[:, 0, :], err_msg=label)
    y = at.tensor3("y", dtype="float64")  # all dims unknown: dropping must be rejected
    with pytest.raises(Exception):
        y.dimshuffle(0, 2)


def test_dimshuffle_scalar_to_tensor():
    x = at.scalar("x", dtype="float64")
    out = x.dimshuffle("x", "x")
    for mode, label in MODES:
        r = np.asarray(function([x], out, mode=mode)(np.float64(3.5)))
        assert r.shape == (1, 1) and float(r) == 3.5, label


def test_dimshuffle_grad_roundtrips():
    from tests.unittest_tools import verify_grad

    verify_grad(lambda x: x.dimshuffle(2, 0, 1).sum(),
                [rng.normal(size=(2, 3, 2))])
    verify_grad(lambda x: x.dimshuffle("x", 1, 0).sum(),
                [rng.normal(size=(2, 3))])


# ---------------------------------------------------------------------------
# the static-1-only broadcasting contract (CLAUDE.md / SURVEY: ONLY
# statically-1 dims broadcast — a RUNTIME 1 on a None dim must error)
# ---------------------------------------------------------------------------

class TestStaticOnlyBroadcast:
    def test_static_row_broadcasts(self):
        r = at.row("r", dtype="float64")  # static shape (1, None)
        x = at.matrix("x", dtype="float64")
        out = x + r
        vv = rng.normal(size=(3, 4))
        rv = rng.normal(size=(1, 4))
        for mode, label in MODES:
            res = np.asarray(function([x, r], out, mode=mode)(vv, rv))
            np.testing.assert_allclose(res, vv + rv, err_msg=label)

    def test_runtime_one_rejected_py(self):
        x = at.matrix("x", dtype="float64")  # (None, None)
        y = at.matrix("y", dtype="float64")
        out = x + y
        f = function([x, y], out, mode=PY)
        with pytest.raises(Exception):
            f(rng.normal(size=(3, 4)), rng.normal(size=(1, 4)))

    def test_runtime_one_rejected_jax(self):
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        out = x + y
        f = function([x, y], out, mode=JAX)
        with pytest.raises(Exception):
            f(rng.normal(size=(3, 4)), rng.normal(size=(1, 4)))

    def test_matching_shapes_fine_on_none_dims(self):
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        f = function([x, y], x * y, mode=PY)
        a, b = rng.normal(size=(2, 5)), rng.normal(size=(2, 5))
        np.testing.assert_allclose(np.asarray(f(a, b)), a * b)

    @pytest.mark.parametrize("make,shape", [
        (at.row, (1, 6)), (at.col, (6, 1)),
    ], ids=["row", "col"])
    def test_row_col_constructors_carry_static_ones(self, make, shape):
        r = make("r", dtype="float64")
        assert r.type.shape[0 if make is at.row else 1] == 1
        x = at.matrix("x", dtype="float64")
        out = x + r
        vv = rng.normal(size=(6, 6))
        rv = rng.normal(size=shape)
        res = np.asarray(function([x, r], out, mode=PY)(vv, rv))
        np.testing.assert_allclose(res, vv + rv)


# ---------------------------------------------------------------------------
# CAReduce accumulator semantics
# ---------------------------------------------------------------------------

class TestCAReduceAcc:
    def test_int8_sum_no_overflow(self):
        """int8 inputs accumulate in int64 — 100 × 100 does not wrap."""
        v = np.full(100, 100, dtype="int8")
        out = at.sum(at.as_tensor_variable(v))
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            assert int(r) == 10000, label

    def test_bool_sum_counts(self):
        v = np.array([True, True, False, True])
        out = at.sum(at.as_tensor_variable(v))
        for mode, label in MODES:
            assert int(np.asarray(function([], out, mode=mode)())) == 3, label

    def test_float32_acc_dtype_float64_override(self):
        """acc_dtype='float64' reduces rounding error on f32 sums."""
        v = (np.ones(10000) * 0.1).astype("float32")
        x = at.as_tensor_variable(v)
        out64 = at.sum(x, acc_dtype="float64")
        r = float(np.asarray(function([], out64, mode=PY)()))
        assert abs(r - 1000.0) < 0.05

    def test_prod_int_widening(self):
        v = np.array([3, 5, 7, 11], dtype="int16")
        out = at.prod(at.as_tensor_variable(v))
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            assert r.dtype == np.int64 and int(r) == 1155, label

    def test_max_keeps_dtype_and_value(self):
        v = np.array([-5, 3, 127, -128], dtype="int8")
        out = at.max(at.as_tensor_variable(v))
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            assert r.dtype == np.int8 and int(r) == 127, label


# ---------------------------------------------------------------------------
# mixed-arity Elemwise output dtype resolution
# ---------------------------------------------------------------------------

class TestMixedArity:
    def test_three_way_add_promotes_across_all(self):
        a = at.vector(dtype="int8")
        b = at.vector(dtype="uint16")
        c = at.vector(dtype="float16")
        out = at.add(a, b, c)
        assert out.type.dtype == np.promote_types(
            np.promote_types("int8", "uint16"), "float16").name

    def test_switch_output_promotes_branches(self):
        cnd = at.vector(dtype="bool")
        a = at.vector(dtype="int32")
        b = at.vector(dtype="float32")
        assert at.switch(cnd, a, b).type.dtype == "float64" or \
            at.switch(cnd, a, b).type.dtype == "float32"
        # value correctness either way
        f = function([cnd, a, b], at.switch(cnd, a, b), mode=PY)
        r = np.asarray(f(np.array([True, False]),
                         np.array([1, 2], "int32"),
                         np.array([0.5, 0.25], "float32")))
        np.testing.assert_allclose(r.astype("float64"), [1.0, 0.25])

    def test_clip_promotes_with_bounds(self):
        x = at.vector(dtype="int16")
        out = at.clip(x, np.float32(-1.0), np.float32(1.0))
        f = function([x], out, mode=PY)
        r = np.asarray(f(np.array([-5, 0, 5], "int16")))
        np.testing.assert_allclose(r.astype("float64"), [-1.0, 0.0, 1.0])

    def test_composite_chain_keeps_declared_dtype(self):
        """A fused chain's output dtype equals the unfused chain's."""
        x = at.vector(dtype="float32")
        out = at.tanh(at.exp(x * 2.0) + 1.0)
        assert out.type.dtype == "float32"
        f = function([x], out, mode="FAST_RUN")
        r = np.asarray(f(np.array([0.1, -0.2], "float32")))
        assert r.dtype == np.float32


# ---------------------------------------------------------------------------
# multi-output elemwise behavior via composite building blocks
# ---------------------------------------------------------------------------

def test_elemwise_many_inputs():
    """A 12-operand add: arity is not artificially capped."""
    vs = [rng.normal(size=3) for _ in range(12)]
    out = at.add(*[at.as_tensor_variable(v) for v in vs])
    for mode, label in MODES:
        r = np.asarray(function([], out, mode=mode)())
        np.testing.assert_allclose(r, np.sum(vs, axis=0), err_msg=label)


def test_elemwise_zero_size_all_shapes():
    for shape in [(0,), (0, 5), (5, 0), (0, 0)]:
        v = np.zeros(shape)
        out = at.exp(at.as_tensor_variable(v)) * 2.0
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            assert r.shape == shape, f"{shape} {label}"
