"""DestroyHandler / sched / unify / io / breakpoint parity tests."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.graph.fg import FunctionGraph


class TestDestroyHandler:
    def test_detects_double_destroy(self):
        from aesara_tpu.graph.destroyhandler import DestroyHandler, InconsistencyError
        from aesara_tpu.tensor.subtensor import IncSubtensor
        from aesara_tpu.tensor.subtensor import encode_indices

        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        idx_list, _ = encode_indices((slice(0, 2),))
        inc = IncSubtensor(idx_list, inplace=True)
        a = inc(x, y[0:2])
        b = inc(x, y[0:2] * 2)
        fg = FunctionGraph(outputs=[a + b], clone=False)
        dh = DestroyHandler()
        fg.attach_feature(dh)
        with pytest.raises(InconsistencyError):
            dh.validate(fg)

    def test_orderings_readers_before_destroyer(self):
        from aesara_tpu.graph.destroyhandler import DestroyHandler
        from aesara_tpu.tensor.subtensor import IncSubtensor, encode_indices

        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        reader = at.exp(x)
        idx_list, _ = encode_indices((slice(0, 2),))
        destroyer = IncSubtensor(idx_list, inplace=True)(x, y[0:2])
        fg = FunctionGraph(outputs=[reader.sum() + destroyer.sum()], clone=False)
        dh = DestroyHandler()
        fg.attach_feature(dh)
        order = dh.orderings(fg)
        # the destroyer node must be ordered after the exp reader
        (dnode,) = [n for n in fg.apply_nodes if n.op.destroy_map]
        assert dnode in order
        # and a full toposort honoring orderings succeeds
        nodes = fg.toposort()
        assert nodes.index(order[dnode][0]) < nodes.index(dnode)


class TestSched:
    def test_posort_with_priority(self):
        from aesara_tpu.graph.sched import key_to_cmp, posort

        items = [3, 1, 2]
        res = posort(items, key_to_cmp(lambda x: x))
        assert res == [1, 2, 3]

    def test_sort_schedule_fn(self):
        from aesara_tpu.graph.sched import key_to_cmp, sort_schedule_fn

        x = at.vector("x", dtype="float64")
        a = at.exp(x)
        b = at.log(at.abs(x) + 1.0)
        out = a.sum() + b.sum()
        fg = FunctionGraph(outputs=[out], clone=False)
        # prioritize 'log' nodes among independent ones
        prio = key_to_cmp(lambda n: 0 if "log" in str(n.op) else 1)
        sched = sort_schedule_fn(prio)(fg)
        assert len(sched) == len(fg.toposort())


class TestUnify:
    def test_unify_and_relation_rewrite(self):
        from aesara_tpu.graph.rewriting.basic import WalkingGraphRewriter
        from aesara_tpu.graph.rewriting.kanren import UnifyRelationSub
        from aesara_tpu.graph.unify import unify, var
        from aesara_tpu.graph.ir import equal_computations
        from aesara_tpu.tensor.math import exp as texp, log as tlog

        x = at.vector("x", dtype="float64")
        lv = var("q")
        s = unify((texp.elemwise_op, lv), (texp.elemwise_op, x), {})
        assert s is not None and s[lv] is x

        # relation: log(exp(q)) -> q
        rel = UnifyRelationSub(
            [((tlog.elemwise_op, (texp.elemwise_op, lv)), lv)]
        )
        z = tlog(texp(x)) + 0.0
        fg = FunctionGraph(outputs=[z], clone=False)
        WalkingGraphRewriter(rel).rewrite(fg)
        assert equal_computations(fg.outputs, [x + 0.0], fg.inputs, [x])

    def test_constrained_var(self):
        from aesara_tpu.graph.unify import ConstrainedVar, unify

        cv = ConstrainedVar(lambda v: getattr(v.type, "ndim", -1) == 1)
        x = at.vector("x", dtype="float64")
        m = at.matrix("m", dtype="float64")
        assert unify(cv, x, {}) is not None
        assert unify(cv, m, {}) is None


def test_load_from_disk(tmp_path):
    from aesara_tpu.compile.function import function
    from aesara_tpu.tensor.io import Generic, load
    from tests.utils import py_mode

    arr = np.arange(6.0).reshape(2, 3)
    p = tmp_path / "x.npy"
    np.save(p, arr)
    path_var = Generic()("path")
    x = load(path_var, "float64", (None, None))
    f = function([path_var], x.sum(), mode=py_mode)
    assert np.isclose(f(str(p)), arr.sum())


def test_breakpoint_no_trigger():
    from aesara_tpu.breakpoint import PdbBreakpoint
    from aesara_tpu.compile.function import function
    from tests.utils import py_mode

    x = at.vector("x", dtype="float64")
    mon = PdbBreakpoint("test")(at.constant(False), x * 2)
    f = function([x], mon, mode=py_mode)
    np.testing.assert_allclose(f(np.ones(3)), 2.0)
