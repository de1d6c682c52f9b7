"""Regression tests for the round-2 scan/parallel review findings —
each reproduces a confirmed silent-wrong-result or crash."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.scan.basic import scan, until

rng = np.random.default_rng(99)


class TestSharedInNonSequences:
    def test_updated_shared_passed_via_non_sequences_carries(self):
        # the carry replacement must not be clobbered by the non-seq
        # placeholder: body must read the PER-STEP value of s
        s = atp.shared(np.float32(0.0), name="s")
        x = at.vector("x", dtype="float32")
        W = atp.shared(np.float32(2.0), name="W")

        def body(x_t, W, s):
            return x_t * s, {s: s + 1.0}

        ys, updates = scan(body, sequences=[x], non_sequences=[W, s])
        f = function([x], ys, updates=updates, mode="PY")
        out = np.asarray(f(np.ones(3, dtype="float32")))
        # s is 0,1,2 at the three steps
        np.testing.assert_allclose(out, [0.0, 1.0, 2.0])
        assert float(s.get_value()) == 3.0

    def test_same_on_xla_path(self):
        s = atp.shared(np.float32(0.0), name="s")
        x = at.vector("x", dtype="float32")

        def body(x_t, s):
            return x_t * s, {s: s + 1.0}

        ys, updates = scan(body, sequences=[x], non_sequences=[s])
        f = function([x], ys, updates=updates, mode="JAX")
        out = np.asarray(f(np.ones(3, dtype="float32")))
        np.testing.assert_allclose(out, [0.0, 1.0, 2.0])


class TestSequenceLongerThanNSteps:
    def test_forward_truncates(self):
        x = at.tensor("x", dtype="float64", shape=(10,))
        h, _ = scan(lambda xt, a: a + xt, sequences=[x],
                    outputs_info=[at.constant(np.float64(0.0))], n_steps=5)
        f = function([x], h[-1], mode="PY")
        xv = np.arange(10, dtype="float64")
        assert float(f(xv)) == xv[:5].sum()

    def test_gradient_alignment(self):
        # reversed sequence must come from x[:5], not the tail of x
        x = at.tensor("x", dtype="float64", shape=(10,))
        h, _ = scan(lambda xt, a: a * xt, sequences=[x],
                    outputs_info=[at.constant(np.float64(1.0))], n_steps=5)
        cost = h[-1]
        g = atp.grad(cost, x)
        f = function([x], g, mode="PY")
        xv = (np.arange(10, dtype="float64") + 1.0)
        got = np.asarray(f(xv))
        # analytic: d prod(x[:5]) / dx_i = prod/x_i for i<5, 0 beyond
        prod = np.prod(xv[:5])
        want = np.zeros(10)
        want[:5] = prod / xv[:5]
        np.testing.assert_allclose(got, want)
        assert got.shape == (10,)


class TestDynamicMinLength:
    def test_runtime_shorter_dynamic_sequence_wins(self):
        a = at.tensor("a", dtype="float64", shape=(10,))
        b = at.vector("b", dtype="float64")  # unknown length
        ys, _ = scan(lambda at_, bt: at_ + bt, sequences=[a, b])
        f = function([a, b], ys, mode="PY")
        av = np.arange(10, dtype="float64")
        bv = np.arange(5, dtype="float64")
        out = np.asarray(f(av, bv))
        assert out.shape == (5,)
        np.testing.assert_allclose(out, av[:5] + bv)


class TestGetUpdatesAndOutputs3Tuple:
    def test_full_form(self):
        from aesara_tpu.scan.utils import get_updates_and_outputs

        s = atp.shared(np.float64(0.0), name="s")
        y = at.scalar("y", dtype="float64")
        c = at.scalar("c", dtype="float64")
        outs, updates, cond = get_updates_and_outputs(
            (y, {s: s + 1.0}, until(c > 0))
        )
        assert outs == [y]
        assert list(updates) == [s]
        assert cond is not None

    def test_scan_accepts_full_form_via_helper(self):
        s = atp.shared(np.float64(0.0), name="s2")
        x = at.vector("x", dtype="float64")

        def body(x_t, s):
            return x_t * 2.0, {s: s + x_t}, until(at.math.ge(s, 1e9))

        ys, updates = scan(body, sequences=[x], non_sequences=[s])
        f = function([x], ys, updates=updates, mode="PY")
        out = np.asarray(f(np.arange(4, dtype="float64")))
        np.testing.assert_allclose(out, [0, 2, 4, 6])
        assert float(s.get_value()) == 6.0


class TestCheckpointsRegressions:
    def test_non_multiple_length_not_polluted(self):
        from aesara_tpu.scan.checkpoints import scan_checkpoints

        x = at.matrix("x", dtype="float64")
        h, _ = scan_checkpoints(lambda xt, htm1: htm1 + 1.0, sequences=[x],
                                outputs_info=at.zeros((2,), dtype="float64"),
                                save_every_N=10)
        f = function([x], h[-1], mode="PY")
        res = np.asarray(f(np.ones((15, 2))))
        np.testing.assert_allclose(res, 15.0)

    def test_n_steps_only_path(self):
        from aesara_tpu.scan.checkpoints import scan_checkpoints

        h, _ = scan_checkpoints(lambda htm1: htm1 * 2.0,
                                outputs_info=at.ones((3,), dtype="float64"),
                                n_steps=7, save_every_N=3)
        f = function([], h[-1], mode="PY")
        np.testing.assert_allclose(np.asarray(f()), 2.0 ** 7)


class TestPushoutSumCarryAsOutput:
    def test_carry_also_returned_compiles(self):
        # the accumulated carry is ALSO a user-visible output: the
        # pushout must leave this scan alone rather than build a
        # dangling inner graph
        W = at.matrix("W", dtype="float64")
        xs = at.tensor3("xs", dtype="float64")

        def body(x_t, acc, W):
            new = acc + at.dot(x_t, W)
            return acc, new  # nit-sot view of the PREVIOUS carry + carry

        (prev_accs, accs), _ = scan(
            body, sequences=[xs],
            outputs_info=[None, at.zeros((2, 3), dtype="float64")],
            non_sequences=[W],
        )
        f = function([xs, W], [prev_accs, accs[-1]], mode="FAST_RUN")
        Xv = rng.normal(size=(4, 2, 3))
        Wv = rng.normal(size=(3, 3))
        prev, last = f(Xv, Wv)
        want = np.zeros((2, 3))
        outs = []
        for t in range(4):
            outs.append(want.copy())
            want = want + Xv[t] @ Wv
        np.testing.assert_allclose(np.asarray(last), want, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(prev), np.stack(outs), rtol=1e-10)


class TestParallelSendContract:
    def test_send_requires_explicit_src(self):
        from aesara_tpu import parallel

        x = at.vector("x", dtype="float32")
        with pytest.raises(ValueError, match="explicit src"):
            parallel.ops.send(x, dest=2)

    def test_send_with_src_builds_static_edge(self):
        from aesara_tpu import parallel

        x = at.vector("x", dtype="float32")
        y = parallel.ops.send(x, dest=2, src=1)
        assert y.owner.op.perm == ((1, 2),)
