"""``function(..., steps_per_call=k)`` — automatic k-step dispatch
(VERDICT r4 item 2).

One call compiles and runs the k-step update loop as ONE program:
bit-equal to k sequential calls (including RNG state threading), with
per-step outputs stacked on a leading (k,) axis.  This wins the
micro-dispatch regime through the PUBLIC API — the hand-written scan
loop it replaces is the reference's hot-loop contract
(``/root/reference/aesara/compile/function/types.py:791``).
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import In, Out, function
from aesara_tpu.scan.op import Scan

rng = np.random.default_rng(23)


def _fresh_w(val=None, shape=3):
    v = np.zeros(shape, dtype="float64") if val is None else val
    return atp.shared(np.array(v, dtype="float64"), name="w")


class TestKStepSemantics:
    def test_equals_k_sequential_calls(self):
        w = _fresh_w()
        x = at.vector("x", dtype="float64")
        loss = ((w - x) ** 2).sum()
        upd = {w: w - 0.1 * atp.grad(loss, w)}
        f1 = function([x], loss, updates=upd)
        xv = np.ones(3)
        seq = [float(f1(xv)) for _ in range(6)]
        w_seq = w.get_value().copy()

        w.set_value(np.zeros(3))
        fk = function([x], loss, updates=upd, steps_per_call=3)
        a, b = fk(xv), fk(xv)
        assert np.shape(a) == (3,)
        np.testing.assert_allclose(np.concatenate([a, b]), seq)
        np.testing.assert_allclose(w.get_value(), w_seq)

    def test_rng_threading_matches_sequential(self):
        from aesara_tpu.tensor.random.utils import RandomStream

        srng = RandomStream(seed=7)
        d = srng.normal(size=(2,))
        f1 = function([], d)
        seq = [np.asarray(f1()) for _ in range(4)]

        srng2 = RandomStream(seed=7)
        d2 = srng2.normal(size=(2,))
        fk = function([], d2, steps_per_call=4)
        got = np.asarray(fk())
        assert got.shape == (4, 2)
        np.testing.assert_allclose(got, np.stack(seq))
        # the stream CONTINUES across k-step calls
        seq_more = [np.asarray(f1()) for _ in range(4)]
        np.testing.assert_allclose(np.asarray(fk()), np.stack(seq_more))

    def test_updates_only_function(self):
        c = atp.shared(np.int64(0), name="c")
        fk = function([], updates={c: c + 2}, steps_per_call=8)
        fk()
        fk()
        assert int(c.get_value()) == 32

    def test_multiple_coupled_updates(self):
        # simultaneous-update semantics: both targets read PRE-step state
        a = atp.shared(np.float64(1.0), name="a")
        b = atp.shared(np.float64(2.0), name="b")
        upd = {a: a + b, b: b * a}
        f1 = function([], [], updates=upd)
        for _ in range(5):
            f1()
        ref = (float(a.get_value()), float(b.get_value()))
        a.set_value(np.float64(1.0))
        b.set_value(np.float64(2.0))
        fk = function([], [], updates=upd, steps_per_call=5)
        fk()
        assert np.isclose(float(a.get_value()), ref[0])
        assert np.isclose(float(b.get_value()), ref[1])

    def test_inputs_loop_invariant(self):
        w = _fresh_w(shape=1)
        x = at.scalar("x", dtype="float64")
        fk = function([x], w + x, updates={w: w + x}, steps_per_call=4)
        out = np.asarray(fk(1.5))
        # step t output reads the PRE-update state of step t
        np.testing.assert_allclose(out.ravel(), [1.5, 3.0, 4.5, 6.0])

    def test_single_output_stacks(self):
        w = _fresh_w(shape=2)
        fk = function([], at.sum(w), updates={w: w + 1.0},
                      steps_per_call=3)
        out = np.asarray(fk())
        np.testing.assert_allclose(out, [0.0, 2.0, 4.0])

    def test_out_borrow_spec_preserved(self):
        w = _fresh_w(shape=2)
        loss = at.sum(w ** 2)
        fk = function([], Out(loss, borrow=True), updates={w: w - 0.1},
                      steps_per_call=2)
        res = fk()
        assert np.shape(np.asarray(res)) == (2,)

    def test_givens_applied(self):
        w = _fresh_w(shape=2)
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        fk = function([y], at.sum(w + x), updates={w: w + x},
                      givens={x: y * 2.0}, steps_per_call=2)
        out = np.asarray(fk(np.ones(2)))
        np.testing.assert_allclose(out, [4.0, 8.0])


class TestKStepStructure:
    def test_compiles_one_scan(self):
        w = _fresh_w()
        fk = function([], at.sum(w), updates={w: w * 2.0},
                      steps_per_call=10)
        scans = [n for n in fk.fgraph.apply_nodes if isinstance(n.op, Scan)]
        assert len(scans) == 1
        assert fk.steps_per_call == 10
        # the carried state is final-only: no (k, ...) state stack
        info = scans[0].op.info
        assert info.final_only and any(info.final_only)

    def test_k1_is_plain_function(self):
        w = _fresh_w()
        f = function([], at.sum(w), updates={w: w * 2.0}, steps_per_call=1)
        assert not any(isinstance(n.op, Scan) for n in f.fgraph.apply_nodes)

    def test_bad_k_raises(self):
        with pytest.raises(ValueError):
            function([], at.constant(1.0), steps_per_call=0)

    def test_in_update_unsupported(self):
        x = at.scalar("x", dtype="float64")
        with pytest.raises(NotImplementedError):
            function([In(x, value=0.0, update=x + 1)], x,
                     steps_per_call=2)

    def test_no_outputs_no_updates_raises(self):
        with pytest.raises(ValueError):
            function([], None, steps_per_call=3)


class TestKStepBackends:
    @pytest.mark.parametrize("mode", ["FAST_RUN", "PY"])
    def test_mode_differential(self, mode):
        w = _fresh_w(shape=4)
        x = at.vector("x", dtype="float64")
        loss = at.sum(at.tanh(w * x))
        upd = {w: w - 0.05 * atp.grad(loss, w)}
        w.set_value(np.linspace(0, 1, 4))
        fk = function([x], loss, updates=upd, steps_per_call=4, mode=mode)
        out = np.asarray(fk(np.ones(4)))

        w2 = np.linspace(0, 1, 4)

        def step(wv, xv):
            l = np.sum(np.tanh(wv * xv))
            gr = (1 - np.tanh(wv * xv) ** 2) * xv
            return l, wv - 0.05 * gr

        ref = []
        for _ in range(4):
            l, w2 = step(w2, np.ones(4))
            ref.append(l)
        np.testing.assert_allclose(out, ref, rtol=1e-6)
        np.testing.assert_allclose(w.get_value(), w2, rtol=1e-6)
