"""Merge (CSE) + storage/GC depth wave (VERDICT r4 item 4; reference
``tests/tensor/test_merge.py`` + ``test_gc.py``, no prior analog):
duplicate-subgraph merging through the compile pipeline, constant
merging, the merge/client interaction with in-place rewrites, and
intermediate-storage lifetime behaviors at the function level.
"""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.graph.ir import ancestors

rng = np.random.default_rng(7878)


def n_ops(outputs, name):
    return sum(1 for v_ in ancestors(outputs)
               if v_.owner is not None
               and type(v_.owner.op).__name__ == name)


def compiled_graph(f):
    return f.maker.fgraph.outputs


class TestMergeCSE:
    def test_identical_subexpressions_merged(self):
        x = at.vector("x", dtype="float64")
        a = tm.exp(x) + 1.0
        b = tm.exp(x) + 1.0  # structurally identical, distinct objects
        f = function([x], a * b, mode="FAST_RUN")
        assert n_ops(compiled_graph(f), "Elemwise") <= 3
        xv = rng.normal(size=4)
        np.testing.assert_allclose(np.asarray(f(xv)),
                                   (np.exp(xv) + 1.0) ** 2, rtol=1e-12)

    def test_identical_constants_merged(self):
        x = at.vector("x", dtype="float64")
        c1 = at.constant(np.arange(4, dtype="float64"))
        c2 = at.constant(np.arange(4, dtype="float64"))
        f = function([x], x + c1 + c2, mode="FAST_RUN")
        consts = [v_ for v_ in ancestors(compiled_graph(f))
                  if v_.owner is None and hasattr(v_, "data")
                  and getattr(v_.data, "shape", None) == (4,)]
        assert len(set(map(id, consts))) <= 1
        np.testing.assert_allclose(np.asarray(f(np.zeros(4))),
                                   2.0 * np.arange(4))

    def test_merge_respects_different_constants(self):
        x = at.vector("x", dtype="float64")
        f = function([x], x * 2.0 + x * 3.0, mode="FAST_RUN")
        xv = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(xv)), 5.0 * xv)

    def test_duplicate_dots_merged(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        out = tm.dot(a, b).sum() + tm.dot(a, b).max()
        f = function([a, b], out, mode="FAST_RUN")
        dot_like = sum(
            n_ops(compiled_graph(f), nm)
            for nm in ("Dot", "Dot22", "Gemm", "MatMul"))
        assert dot_like <= 1, "identical dots must CSE to one"

    def test_merge_across_output_list(self):
        x = at.vector("x", dtype="float64")
        e = tm.tanh(x * 2.0)
        f = function([x], [e.sum(), e.max(), tm.tanh(x * 2.0).min()],
                     mode="FAST_RUN")
        xv = rng.normal(size=5)
        s, mx, mn = f(xv)
        t = np.tanh(xv * 2.0)
        assert np.isclose(float(np.asarray(s)), t.sum())
        assert np.isclose(float(np.asarray(mx)), t.max())
        assert np.isclose(float(np.asarray(mn)), t.min())

    def test_scan_bodies_merge_when_identical(self):
        from aesara_tpu.scan.basic import scan
        from aesara_tpu.scan.op import Scan

        x = at.vector("x", dtype="float64")
        o1, _ = scan(lambda t: tm.sqr(t), sequences=[x])
        o2, _ = scan(lambda t: tm.sqr(t), sequences=[x])
        f = function([x], o1.sum() + o2.sum(), mode="FAST_RUN")
        n_scans = sum(
            1 for v_ in ancestors(compiled_graph(f))
            if v_.owner is not None and isinstance(v_.owner.op, Scan))
        assert n_scans <= 1

    def test_merged_value_correct_with_updates(self):
        s = atp.shared(np.float64(1.0), name="s")
        e = s * 3.0
        f = function([], [e, e + 0.0], updates={s: e},
                     mode="FAST_RUN")
        r1, r2 = f()
        assert float(np.asarray(r1)) == 3.0
        assert float(np.asarray(r2)) == 3.0
        assert float(s.get_value()) == 3.0
        s.set_value(np.float64(1.0))


class TestStorageLifetimes:
    def test_outputs_survive_subsequent_calls(self):
        """Each call's returned arrays are independent of later calls
        (no buffer recycling leaks across the API boundary)."""
        x = at.vector("x", dtype="float64")
        f = function([x], tm.exp(x), mode="FAST_RUN")
        r1 = np.asarray(f(np.zeros(3)))
        r1_copy = r1.copy()
        _ = f(np.ones(3) * 5.0)
        np.testing.assert_allclose(r1, r1_copy)

    def test_intermediate_not_retained_py(self):
        """PY-linker storage for intermediates is reset between calls —
        pinned via a perform that records its input buffer identity."""
        from aesara_tpu.graph.ir import Apply
        from aesara_tpu.graph.op import Op

        seen = []

        class Probe(Op):
            def make_node(self, xx):
                xx = at.as_tensor_variable(xx)
                return Apply(self, [xx], [xx.type()])

            def perform(self, node, inputs, outputs):
                seen.append(id(inputs[0]))
                outputs[0][0] = inputs[0].copy()

            def infer_shape(self, fgraph, node, shapes):
                return shapes

        x = at.vector("x", dtype="float64")
        f = function([x], Probe()(tm.exp(x)), mode="PY")
        f(np.zeros(3)); f(np.zeros(3))
        assert len(seen) == 2

    def test_shared_buffer_not_aliased_by_output(self):
        s = atp.shared(np.array([1.0, 2.0]), name="s")
        f = function([], s * 1.0, mode="FAST_RUN")
        out = np.asarray(f())
        try:
            out[0] = 99.0
        except ValueError:
            return
        assert float(s.get_value()[0]) == 1.0

    def test_large_intermediate_graph_runs_repeatedly(self):
        """Smoke for storage reuse: a deep chain executed many times
        returns stable values (catches stale-storage bugs)."""
        x = at.vector("x", dtype="float64")
        h = x
        for _ in range(30):
            h = tm.tanh(h) + 0.01
        f = function([x], h.sum(), mode="FAST_RUN")
        xv = rng.normal(size=8)
        vals = {float(np.asarray(f(xv))) for _ in range(5)}
        assert len(vals) == 1
