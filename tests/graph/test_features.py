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


class TestReviewRegressions:
    def test_walking_out_to_in_visits_consumers_first(self):
        import aesara_tpu.tensor as at
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.graph.rewriting.basic import (
            WalkingGraphRewriter,
            node_rewriter,
        )

        seen = []

        @node_rewriter(None)
        def recorder(fgraph, node):
            seen.append(node)
            return False

        x = at.vector("x", dtype="float64")
        out = at.exp(at.tanh(x))  # tanh feeds exp
        fg = FunctionGraph([x], [out], clone=True)
        WalkingGraphRewriter(recorder, order="out_to_in").apply(fg)
        names = [type(n.op.scalar_op).__name__ for n in seen]
        assert names.index("Exp") < names.index("Tanh"), names

    def test_equilibrium_registers_global_rewriter_changes(self):
        import aesara_tpu.tensor as at
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.graph.rewriting.basic import (
            EquilibriumGraphRewriter,
            GraphRewriter,
        )

        class OneShotSimplifier(GraphRewriter):
            """Replaces exp(x) output by x once — a pure global rewriter."""

            def __init__(self):
                self.fired = 0

            def add_requirements(self, fgraph):
                from aesara_tpu.graph.features import ReplaceValidate

                if not hasattr(fgraph, "replace_all_validate"):
                    fgraph.attach_feature(ReplaceValidate())

            def apply(self, fgraph):
                if self.fired:
                    return 0
                for node in list(fgraph.apply_nodes):
                    if type(getattr(node.op, "scalar_op", None)).__name__ == "Exp":
                        fgraph.replace_all_validate(
                            [(node.outputs[0], node.inputs[0])], reason="t"
                        )
                        self.fired += 1
                        return 1
                return 0

        from aesara_tpu.graph.features import ReplaceValidate

        x = at.vector("x", dtype="float64")
        fg = FunctionGraph([x], [at.exp(x)], clone=True)
        fg.attach_feature(ReplaceValidate())
        rw = OneShotSimplifier()
        eq = EquilibriumGraphRewriter([rw], max_use_ratio=10)
        eq.apply(fg)
        assert rw.fired == 1
        assert fg.outputs[0].owner is None  # simplified to the input

    def test_check_stack_trace_accepts_instances(self):
        import aesara_tpu.tensor as at
        from aesara_tpu.compile.function import function
        from aesara_tpu.graph.rewriting.basic import check_stack_trace
        from aesara_tpu.tensor.math import Dot

        x = at.matrix("x", dtype="float64")
        f = function([x], at.dot(x, x.T), mode="PY")
        # both an Op CLASS and an Op INSTANCE must work
        check_stack_trace(f.fgraph, ops_to_check=[Dot])
        check_stack_trace(f.fgraph, ops_to_check=[Dot()])

    def test_check_integrity_detects_missing_with_stale_present(self):
        import aesara_tpu.tensor as at
        from aesara_tpu.graph.fg import FunctionGraph

        x = at.vector("x", dtype="float64")
        out = at.exp(x)
        fg = FunctionGraph([x], [out], clone=False)
        stale = at.vector("stale", dtype="float64")
        fg.variables.add(stale)       # stale extra entry
        fg.variables.discard(out)     # required var missing
        import pytest as _pytest

        with _pytest.raises(Exception, match="missing"):
            fg.check_integrity()

    def test_exception_classes_are_shared(self):
        from aesara_tpu.graph.utils import (
            InconsistencyError,
            MethodNotDefined,
        )
        from aesara_tpu.graph.destroyhandler import (
            InconsistencyError as DhInconsistency,
        )
        from aesara_tpu.utils import MethodNotDefined as UtilsMethodNotDefined

        assert MethodNotDefined is UtilsMethodNotDefined
        assert InconsistencyError is DhInconsistency
