"""Clause-head-derived gates and tracked ops (VERDICT r4 item 7).

``clause_relation_sub`` derives the structural node_filter AND the
rewrite-db tracked-op list from the clause heads themselves — the
declarative surface the reference positions
(``/root/reference/aesara/graph/rewriting/kanren.py:13``) without the
hand-written per-rule gates round 4 still carried.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.graph.rewriting.kanren import (
    clause_relation_sub,
    var,
)
from aesara_tpu.tensor import math as tm

rng = np.random.default_rng(17)


def _E(f):
    return f.elemwise_op


class TestDerivedGate:
    def test_gate_matches_only_head_shape(self):
        x = var("x")
        rule = clause_relation_sub(
            "r", [((_E(tm.log), (_E(tm.exp), x)), x)])
        v = at.vector("v", dtype="float64")
        log_exp = tm.log(tm.exp(v))
        log_tanh = tm.log(tm.tanh(v))
        exp_only = tm.exp(v)
        assert rule.node_filter(log_exp.owner)
        assert not rule.node_filter(log_tanh.owner)
        assert not rule.node_filter(exp_only.owner)

    def test_gate_handles_leaf_inputs(self):
        x = var("x")
        rule = clause_relation_sub(
            "r", [((_E(tm.neg), (_E(tm.neg), x)), x)])
        v = at.vector("v", dtype="float64")
        assert not rule.node_filter(tm.neg(v).owner)  # inner is a leaf
        assert rule.node_filter(tm.neg(tm.neg(v)).owner)

    def test_tracked_ops_derived(self):
        x = var("x")
        rule = clause_relation_sub(
            "r",
            [((_E(tm.log), (_E(tm.sqrt), x)), x),
             ((_E(tm.sqr), (_E(tm.sqrt), x)), x)],
        )
        tracked = rule.tracks()
        assert tracked is not None and len(tracked) == 2
        assert _E(tm.log) in tracked and _E(tm.sqr) in tracked

    def test_tracker_dispatches_by_instance(self):
        from aesara_tpu.graph.rewriting.basic import OpToRewriterTracker

        x = var("x")
        rule = clause_relation_sub(
            "r", [((_E(tm.log), (_E(tm.exp), x)), x)])
        tracker = OpToRewriterTracker()
        tracker.add_tracker(rule)
        v = at.vector("v", dtype="float64")
        assert rule in tracker.get_trackers(tm.log(v).owner.op)
        assert rule not in tracker.get_trackers(tm.exp(v).owner.op)

    def test_transform_respects_derived_gate(self):
        from aesara_tpu.graph.fg import FunctionGraph

        x = var("x")
        rule = clause_relation_sub(
            "r", [((_E(tm.log), (_E(tm.exp), x)), x)])
        v = at.vector("v", dtype="float64")
        out = tm.log(tm.exp(v))
        fg = FunctionGraph(outputs=[out], clone=False)
        res = rule.transform(fg, out.owner)
        assert res and res[0] is v


def _count_ops(f, scalar_op_cls):
    from aesara_tpu.tensor.elemwise import Elemwise

    return sum(
        1
        for n in f.fgraph.apply_nodes
        if isinstance(n.op, Elemwise)
        and isinstance(n.op.scalar_op, scalar_op_cls)
    )


class TestWave3Relations:
    """Each relation: topology (op gone) + value differential vs numpy."""

    def test_reciprocal_reciprocal(self):
        import aesara_tpu.scalar as aes

        v = at.vector("v", dtype="float64")
        f = function([v], tm.reciprocal(tm.reciprocal(v)), mode="FAST_RUN")
        assert _count_ops(f, aes.ops.Reciprocal) == 0
        xv = rng.normal(size=8) + 2.0
        np.testing.assert_allclose(f(xv), xv)

    def test_log_sqrt(self):
        import aesara_tpu.scalar as aes

        v = at.vector("v", dtype="float64")
        f = function([v], tm.log(tm.sqrt(v)), mode="FAST_RUN")
        assert _count_ops(f, aes.ops.Sqrt) == 0
        xv = np.abs(rng.normal(size=8)) + 0.5
        np.testing.assert_allclose(f(xv), 0.5 * np.log(xv), rtol=1e-6)

    def test_log1p_expm1(self):
        import aesara_tpu.scalar as aes

        v = at.vector("v", dtype="float64")
        f = function([v], tm.log1p(tm.expm1(v)), mode="FAST_RUN")
        assert _count_ops(f, aes.ops.Expm1) == 0
        xv = rng.normal(size=8)
        np.testing.assert_allclose(f(xv), xv, rtol=1e-7)

    def test_conj_conj(self):
        import aesara_tpu.scalar as aes

        v = at.cvector("v")
        f = function([v], tm.conj(tm.conj(v)), mode="FAST_RUN")
        assert _count_ops(f, aes.ops.Conj) == 0
        xv = (rng.normal(size=4) + 1j * rng.normal(size=4)).astype(
            "complex64")
        np.testing.assert_allclose(f(xv), xv)

    @pytest.mark.parametrize(
        "outer,inner,ref",
        [
            (tm.floor, tm.floor, np.floor),
            (tm.ceil, tm.ceil, np.ceil),
            (tm.floor, tm.ceil, np.ceil),
            (tm.ceil, tm.floor, np.floor),
            (tm.sgn, tm.sgn, np.sign),
        ],
    )
    def test_round_idempotent(self, outer, inner, ref):
        v = at.vector("v", dtype="float64")
        f = function([v], outer(inner(v)), mode="FAST_RUN")
        # exactly one rounding op survives
        from aesara_tpu.tensor.elemwise import Elemwise

        n_elemwise = sum(
            1 for n in f.fgraph.apply_nodes if isinstance(n.op, Elemwise)
        )
        assert n_elemwise == 1
        xv = rng.normal(size=16) * 3.0
        np.testing.assert_allclose(f(xv), ref(xv))

    def test_no_firing_on_lookalikes(self):
        # log(exp-like but not exp) stays untouched
        import aesara_tpu.scalar as aes

        v = at.vector("v", dtype="float64")
        f = function([v], tm.log1p(tm.exp(v)), mode="FAST_RUN")
        xv = rng.normal(size=8)
        # value correct regardless of which stabilization fired
        np.testing.assert_allclose(f(xv), np.log1p(np.exp(xv)), rtol=1e-6)

    def test_keep_type_veto_respected(self):
        # broadcast-shape widening through the inverse pair must not
        # narrow the runtime shape (the _keep_type contract)
        v = at.matrix("v", dtype="float64")
        out = tm.neg(tm.neg(v)) + at.zeros((3, 4), dtype="float64")
        f = function([v], out, mode="FAST_RUN")
        xv = rng.normal(size=(3, 4))
        np.testing.assert_allclose(f(xv), xv)
