"""The Feature plugin system (reference ``aesara/graph/features.py``;
tests/graph/test_features.py): History checkpoints/revert, Validator
vetoes, NodeFinder, and feature lifecycle."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.features import (
    Feature,
    History,
    NodeFinder,
    ReplaceValidate,
    Validator,
)
from aesara_tpu.graph.fg import FunctionGraph


def _simple_fg():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    out = at.exp(x) + y
    fg = FunctionGraph([x, y], [out])
    # FunctionGraph clones: replacements must be built over ITS inputs
    return fg, fg.inputs[0], fg.inputs[1]


class TestHistory:
    def test_checkpoint_and_revert(self):
        fg, x, y = _simple_fg()
        hist = History()
        fg.attach_feature(hist)
        cp = fg.checkpoint()
        before = set(map(id, fg.apply_nodes))

        # mutate: replace exp(x) with tanh(x)
        exp_node = [n for n in fg.apply_nodes
                    if n.op.__class__.__name__ == "Elemwise"
                    and type(n.op.scalar_op).__name__ == "Exp"][0]
        fg.replace(exp_node.outputs[0], at.tanh(x), reason="test")
        after = set(map(id, fg.apply_nodes))
        assert before != after

        fg.revert(cp)
        ops = {type(n.op.scalar_op).__name__
               for n in fg.apply_nodes if hasattr(n.op, "scalar_op")}
        assert "Exp" in ops and "Tanh" not in ops

    def test_nested_checkpoints(self):
        fg, x, y = _simple_fg()
        hist = History()
        fg.attach_feature(hist)
        cp0 = fg.checkpoint()
        exp_out = [n for n in fg.apply_nodes
                   if type(getattr(n.op, "scalar_op", None)).__name__ == "Exp"
                   ][0].outputs[0]
        fg.replace(exp_out, at.tanh(x), reason="first")
        cp1 = fg.checkpoint()
        tanh_out = [n for n in fg.apply_nodes
                    if type(getattr(n.op, "scalar_op", None)).__name__ ==
                    "Tanh"][0].outputs[0]
        fg.replace(tanh_out, at.math.sigmoid(x), reason="second")
        fg.revert(cp1)
        ops = {type(getattr(n.op, "scalar_op", None)).__name__
               for n in fg.apply_nodes}
        assert "Tanh" in ops and "Sigmoid" not in ops
        fg.revert(cp0)
        ops = {type(getattr(n.op, "scalar_op", None)).__name__
               for n in fg.apply_nodes}
        assert "Exp" in ops


class TestReplaceValidate:
    def test_validator_veto_rolls_back(self):
        fg, x, y = _simple_fg()
        fg.attach_feature(ReplaceValidate())

        class Veto(Feature):
            def validate(self, fgraph):
                raise ValueError("vetoed")

        fg.attach_feature(Veto())
        exp_out = [n for n in fg.apply_nodes
                   if type(getattr(n.op, "scalar_op", None)).__name__ == "Exp"
                   ][0].outputs[0]
        with pytest.raises(ValueError, match="vetoed"):
            fg.replace_all_validate([(exp_out, at.tanh(x))], reason="t")
        # graph must be unchanged after the veto
        ops = {type(getattr(n.op, "scalar_op", None)).__name__
               for n in fg.apply_nodes}
        assert "Exp" in ops and "Tanh" not in ops

    def test_replace_validate_success(self):
        fg, x, y = _simple_fg()
        fg.attach_feature(ReplaceValidate())
        exp_out = [n for n in fg.apply_nodes
                   if type(getattr(n.op, "scalar_op", None)).__name__ == "Exp"
                   ][0].outputs[0]
        fg.replace_all_validate([(exp_out, at.tanh(x))], reason="t")
        ops = {type(getattr(n.op, "scalar_op", None)).__name__
               for n in fg.apply_nodes}
        assert "Tanh" in ops and "Exp" not in ops


class TestNodeFinder:
    def test_find_by_op(self):
        fg, x, y = _simple_fg()
        finder = NodeFinder()
        fg.attach_feature(finder)
        from aesara_tpu.scalar.ops import exp as s_exp
        from aesara_tpu.tensor.elemwise import Elemwise

        hits = list(fg.get_nodes(Elemwise(s_exp)))
        assert len(hits) == 1

    def test_tracks_imports_and_prunes(self):
        fg, x, y = _simple_fg()
        finder = NodeFinder()
        fg.attach_feature(finder)
        from aesara_tpu.scalar.ops import exp as s_exp, tanh as s_tanh
        from aesara_tpu.tensor.elemwise import Elemwise

        exp_out = [n for n in fg.apply_nodes
                   if type(getattr(n.op, "scalar_op", None)).__name__ == "Exp"
                   ][0].outputs[0]
        fg.replace(exp_out, at.tanh(x), reason="t")
        assert len(list(fg.get_nodes(Elemwise(s_tanh)))) == 1
        assert len(list(fg.get_nodes(Elemwise(s_exp)))) == 0


class TestLifecycle:
    def test_double_attach_is_noop_or_raises(self):
        fg, _, _ = _simple_fg()
        h = History()
        fg.attach_feature(h)
        n_before = len(fg._features) if hasattr(fg, "_features") else None
        from aesara_tpu.graph.features import AlreadyThere

        try:
            fg.attach_feature(h)
        except AlreadyThere:
            pass

    def test_remove_feature(self):
        fg, x, _ = _simple_fg()
        h = History()
        fg.attach_feature(h)
        fg.remove_feature(h)
        # after detach, replacements are no longer recorded
        exp_out = [n for n in fg.apply_nodes
                   if type(getattr(n.op, "scalar_op", None)).__name__ == "Exp"
                   ][0].outputs[0]
        fg.replace(exp_out, at.tanh(x), reason="t")
        assert h.history.get(fg) in (None, [])
