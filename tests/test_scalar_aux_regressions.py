"""Regression tests for the scalar/ifelse/typed_list/printing/config
review findings."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function


class TestCondMergeNoCycle:
    def test_dependent_ifelse_not_merged(self):
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.ifelse import CondMerge, ifelse

        c = at.scalar("c", dtype="float64")
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        a = ifelse(c > 0, x, y)
        b = ifelse(c > 0, a * 2.0, y)
        fg = FunctionGraph([c, x, y], [a, b], clone=True)
        from aesara_tpu.graph.features import ReplaceValidate

        fg.attach_feature(ReplaceValidate())
        CondMerge().rewrite(fg)
        fg.check_integrity()
        f = function([c, x, y], [a, b], mode="PY")
        ra, rb = f(1.0, np.ones(2), np.zeros(2))
        np.testing.assert_array_equal(np.asarray(ra), [1.0, 1.0])
        np.testing.assert_array_equal(np.asarray(rb), [2.0, 2.0])

    def test_independent_ifelse_still_merges(self):
        from aesara_tpu.graph.features import ReplaceValidate
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.ifelse import CondMerge, IfElse, ifelse

        c = at.scalar("c", dtype="float64")
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        cond = c > 0  # ONE shared condition node
        a = ifelse(cond, x, y)
        b = ifelse(cond, x * 2.0, y)
        fg = FunctionGraph([c, x, y], [a, b], clone=True)
        fg.attach_feature(ReplaceValidate())
        CondMerge().rewrite(fg)
        fg.check_integrity()
        n_ifelse = sum(
            1 for n in fg.apply_nodes if isinstance(n.op, IfElse)
        )
        assert n_ifelse == 1


class TestConfigRegressions:
    def test_rc_file_preserves_case(self, tmp_path, monkeypatch):
        rc = tmp_path / "rc"
        rc.write_text("[global]\nfloatX = float64\nmode = PY\n")
        import importlib

        cfgmod = importlib.import_module("aesara_tpu.config")

        monkeypatch.setenv("AESARA_TPU_RC", str(rc))
        monkeypatch.setattr(
            "os.path.expanduser", lambda p: str(tmp_path / "nope")
        )
        old_floatX = cfgmod.config.floatX
        old_mode = cfgmod.config.mode
        try:
            cfgmod._load_rc_files()
            assert cfgmod.config.floatX == "float64"
            assert cfgmod.config.mode == "PY"
        finally:
            cfgmod.config._set_unchecked("floatX", old_floatX)
            cfgmod.config._set_unchecked("mode", old_mode)

    def test_change_flags_unknown_raises_attribute_error(self):
        with pytest.raises(AttributeError, match="unknown config flag"):
            with atp.config.change_flags(not_a_flag=1):
                pass


class TestTypedListRegressions:
    def test_getitem_slice(self):
        from aesara_tpu.tensor.type import TensorType
        from aesara_tpu.typed_list.basic import getitem
        from aesara_tpu.typed_list.type import TypedListType

        lst = TypedListType(TensorType("float64", (None,)))("lst")
        out = getitem(lst, slice(1, 3))
        f = function([lst], out, mode="PY")
        data = [np.array([float(i)]) for i in range(4)]
        res = f(data)
        assert len(res) == 2
        np.testing.assert_array_equal(res[0], [1.0])
        np.testing.assert_array_equal(res[1], [2.0])

    def test_index_accepts_raw_values(self):
        from aesara_tpu.tensor.type import TensorType
        from aesara_tpu.typed_list.basic import index_
        from aesara_tpu.typed_list.type import TypedListType

        lst = TypedListType(TensorType("float64", (None,)))("lst")
        out = index_(lst, np.arange(3.0))
        f = function([lst], out, mode="PY")
        data = [np.zeros(3), np.arange(3.0)]
        assert int(f(data)) == 1

    def test_single_variable_class(self):
        import aesara_tpu.typed_list.basic as tlb
        import aesara_tpu.typed_list.type as tlt

        assert tlb.TypedListVariable is tlt.TypedListVariable
        assert tlt.TypedListType.variable_type is tlt.TypedListVariable


class TestPrintingRegressions:
    def test_char_from_number_reference_order(self):
        from aesara_tpu.printing import char_from_number

        assert char_from_number(0) == "A"
        assert char_from_number(25) == "Z"
        assert char_from_number(26) == "AB"

    def test_get_node_by_id_matches_render_order(self):
        import re

        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.printing import debugprint, get_node_by_id

        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        z = (x + y) * at.exp(x)
        fg = FunctionGraph([x, y], [z], clone=False)
        out = debugprint(fg.outputs, file="str")
        m = re.search(r"Elemwise\{add\}\s*\[id (\w+)\]", out)
        assert m, out
        node = get_node_by_id(fg, m.group(1))
        assert type(node.op.scalar_op).__name__ == "Add"


class TestCompositef32Narrows:
    def test_inner_math_is_float32(self):
        from aesara_tpu.scalar.composite import Composite, Compositef32
        from aesara_tpu.scalar.ops import ScalarType

        x = ScalarType("float64")()
        y = ScalarType("float64")()
        comp = Composite([x, y], [(x + y).exp() if hasattr(x, "exp")
                                  else __import__("aesara_tpu.scalar.ops",
                                                  fromlist=["exp"]).exp(x + y)])
        f32 = Compositef32.from_composite(comp)
        dtypes = {v.type.dtype for v in f32.fgraph.variables}
        assert "float64" not in dtypes, dtypes
        # values still correct (in f32 precision)
        res = f32.impl(np.float32(0.5), np.float32(0.25))
        np.testing.assert_allclose(float(res), np.exp(0.75), rtol=1e-6)


class TestAssertArrayCondition:
    def test_vector_condition_reduces_with_all(self):
        from aesara_tpu.raise_op import assert_op

        x = at.vector("x", dtype="float64")
        out = assert_op(x, x > 0)
        f = function([x], out, mode="PY")
        np.testing.assert_array_equal(np.asarray(f(np.ones(3))), np.ones(3))
        with pytest.raises(AssertionError):
            f(np.array([1.0, -1.0, 2.0]))
