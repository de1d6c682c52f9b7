"""Scan tests: sequences, taps, shared updates, BPTT gradients
(mirrors ``tests/scan/test_basic.py`` strategy)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad, verify_grad
from aesara_tpu.scan.basic import scan, until
from aesara_tpu.scan.views import foldl, foldr, map as scan_map, reduce as scan_reduce
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(3)


def c64(v):
    return at.constant(np.float64(v))


class TestForward:
    def test_cumsum_sit_sot(self):
        x = at.vector("x", dtype="float64")
        h, _ = scan(lambda xt, acc: acc + xt, sequences=[x], outputs_info=[c64(0.0)])
        v = rng.normal(size=6)
        res = compare_jax_and_py([x], h, [v])
        np.testing.assert_allclose(np.asarray(res[0]), np.cumsum(v))

    def test_map_nit_sot(self):
        x = at.vector("x", dtype="float64")
        m, _ = scan(lambda xt: at.exp(xt), sequences=[x])
        v = rng.normal(size=4)
        res = compare_jax_and_py([x], m, [v])
        np.testing.assert_allclose(np.asarray(res[0]), np.exp(v))

    def test_multiple_outputs(self):
        x = at.vector("x", dtype="float64")
        (a, b), _ = scan(
            lambda xt, acc: (acc + xt, xt * 2),
            sequences=[x],
            outputs_info=[c64(0.0), None],
        )
        v = rng.normal(size=5)
        compare_jax_and_py([x], [a, b], [v])

    def test_n_steps_no_seq(self):
        k, _ = scan(lambda p: p * 2.0, outputs_info=[c64(1.0)], n_steps=6)
        res = compare_jax_and_py([], k, [])
        np.testing.assert_allclose(np.asarray(res[0]), 2.0 ** np.arange(1, 7))

    def test_matrix_state(self):
        X = at.matrix("X", dtype="float64")
        h0 = at.vector("h0", dtype="float64")
        W = at.matrix("W", dtype="float64")
        h, _ = scan(
            lambda xt, htm1, W: at.tanh(at.dot(htm1, W) + xt),
            sequences=[X], outputs_info=[h0], non_sequences=[W],
        )
        T, D = 5, 3
        compare_jax_and_py(
            [X, h0, W], h,
            [rng.normal(size=(T, D)), rng.normal(size=D), rng.normal(size=(D, D)) * 0.4],
        )

    def test_mit_sot_fibonacci(self):
        f, _ = scan(
            lambda fm2, fm1: fm1 + fm2,
            outputs_info=[{"initial": at.constant(np.array([1.0, 1.0])), "taps": [-2, -1]}],
            n_steps=8,
        )
        res = compare_jax_and_py([], f, [])
        expected = [2, 3, 5, 8, 13, 21, 34, 55]
        np.testing.assert_allclose(np.asarray(res[0]), expected)

    def test_go_backwards(self):
        x = at.vector("x", dtype="float64")
        h, _ = scan(lambda xt, acc: acc + xt, sequences=[x],
                    outputs_info=[c64(0.0)], go_backwards=True)
        v = rng.normal(size=5)
        res = compare_jax_and_py([x], h, [v])
        np.testing.assert_allclose(np.asarray(res[0]), np.cumsum(v[::-1]))

    def test_shared_updates_in_body(self):
        s = atp.shared(np.float64(0.0), name="acc")
        x = at.vector("x", dtype="float64")
        _, upd = scan(lambda xt: {s: s + xt * xt}, sequences=[x])
        f = function([x], [], updates=upd, mode="JAX")
        v = rng.normal(size=4)
        f(v)
        assert np.isclose(s.get_value(), np.sum(v ** 2))

    def test_while_loop_py_mode(self):
        k, _ = scan(
            lambda p: (p * 2.0, until(p * 2.0 > 10)),
            outputs_info=[c64(1.0)],
            n_steps=100,
        )
        f = function([], k, mode="PY")
        res = f()
        np.testing.assert_allclose(np.asarray(res), [2.0, 4.0, 8.0, 16.0])


class TestViews:
    def test_map(self):
        x = at.vector("x", dtype="float64")
        m, _ = scan_map(lambda xt: xt + 1.0, [x])
        v = rng.normal(size=4)
        res = compare_jax_and_py([x], m, [v])
        np.testing.assert_allclose(np.asarray(res[0]), v + 1)

    def test_reduce(self):
        x = at.vector("x", dtype="float64")
        r, _ = scan_reduce(lambda xt, acc: acc * xt, [x], c64(1.0))
        v = rng.normal(size=4)
        res = compare_jax_and_py([x], r, [v])
        np.testing.assert_allclose(np.asarray(res[0]), np.prod(v))

    def test_foldr(self):
        x = at.vector("x", dtype="float64")
        r, _ = foldr(lambda xt, acc: acc - xt, [x], c64(0.0))
        v = np.array([1.0, 2.0, 3.0])
        res = compare_jax_and_py([x], r, [v])
        np.testing.assert_allclose(np.asarray(res[0]), -6.0)


class TestGrad:
    def test_bptt_rnn_scalar(self):
        def build(xv, wv):
            h, _ = scan(
                lambda xt, htm1, w: at.tanh(htm1 * w + xt),
                sequences=[xv], outputs_info=[c64(0.0)], non_sequences=[wv],
            )
            return h[-1]

        verify_grad(build, [rng.normal(size=5) * 0.5, np.float64(0.4)])

    def test_bptt_sum_of_states(self):
        def build(xv, wv):
            h, _ = scan(
                lambda xt, htm1, w: at.tanh(htm1 * w + xt),
                sequences=[xv], outputs_info=[c64(0.0)], non_sequences=[wv],
            )
            return h.sum()

        verify_grad(build, [rng.normal(size=4) * 0.5, np.float64(0.3)])

    def test_bptt_vector_rnn(self):
        def build(X, h0, W):
            h, _ = scan(
                lambda xt, htm1, W: at.tanh(at.dot(htm1, W) + xt),
                sequences=[X], outputs_info=[h0], non_sequences=[W],
            )
            return (h[-1] ** 2).sum()

        T, D = 4, 3
        verify_grad(
            build,
            [rng.normal(size=(T, D)) * 0.3, rng.normal(size=D) * 0.1,
             rng.normal(size=(D, D)) * 0.3],
        )

    def test_grad_nit_sot_only(self):
        def build(xv):
            m, _ = scan(lambda xt: at.sqr(xt), sequences=[xv])
            return m.sum()

        verify_grad(build, [rng.normal(size=5)])

    def test_grad_wrt_initial_state(self):
        def build(xv, h0):
            h, _ = scan(
                lambda xt, htm1: htm1 * 0.9 + xt,
                sequences=[xv], outputs_info=[h0],
            )
            return h[-1]

        verify_grad(build, [rng.normal(size=4), np.float64(0.7)])

    def test_jacobian_uses_scan(self):
        from aesara_tpu.gradient import jacobian

        x = at.vector("x", dtype="float64")
        J = jacobian(x ** 2, x)
        f = function([x], J, mode="JAX")
        v = rng.normal(size=4)
        np.testing.assert_allclose(np.asarray(f(v)), np.diag(2 * v), rtol=1e-6)


class TestCheckpoints:
    def test_scan_checkpoints_forward(self):
        from aesara_tpu.scan.checkpoints import scan_checkpoints

        x = at.vector("x", dtype="float64")
        h, _ = scan_checkpoints(
            lambda xt, acc: acc + xt, sequences=[x],
            outputs_info=c64(0.0), save_every_N=4,
        )
        f = function([x], h, mode="JAX")
        v = rng.normal(size=12)
        # outer scan returns one state per segment: cumsum at 4, 8, 12
        np.testing.assert_allclose(
            np.asarray(f(v)), np.cumsum(v)[[3, 7, 11]], rtol=1e-8
        )


class TestMitSotGrad:
    def test_fibonacci_like_grad(self):
        def build(init):
            f, _ = scan(
                lambda fm2, fm1: 0.5 * fm1 + 0.3 * fm2,
                outputs_info=[{"initial": init, "taps": [-2, -1]}],
                n_steps=6,
            )
            return f[-1]

        verify_grad(build, [rng.normal(size=2)])

    def test_mit_sot_nonlinear_grad(self):
        def build(init, w):
            f, _ = scan(
                lambda fm2, fm1, w: at.tanh(w * fm1 + fm2 * 0.1),
                outputs_info=[{"initial": init, "taps": [-2, -1]}],
                non_sequences=[w],
                n_steps=5,
            )
            return f.sum()

        verify_grad(build, [rng.normal(size=2) * 0.3, np.float64(0.4)])

    def test_mit_sot_with_sequence_grad(self):
        def build(x, init):
            f, _ = scan(
                lambda xt, fm3, fm1: 0.4 * fm1 + 0.2 * fm3 + xt,
                sequences=[x],
                outputs_info=[{"initial": init, "taps": [-3, -1]}],
            )
            return (f ** 2).sum()

        verify_grad(build, [rng.normal(size=6), rng.normal(size=3)])

    def test_mixed_mit_sit_grad(self):
        def build(x, init2, h0):
            (f, h), _ = scan(
                lambda xt, fm2, fm1, htm1: (
                    0.5 * fm1 + 0.25 * fm2 + xt, at.tanh(htm1 + xt)
                ),
                sequences=[x],
                outputs_info=[
                    {"initial": init2, "taps": [-2, -1]},
                    h0,
                ],
            )
            return f.sum() + (h[-1] ** 2)

        verify_grad(build, [rng.normal(size=5), rng.normal(size=2),
                            np.float64(0.1)])


class TestTruncateGradient:
    def test_truncated_matches_full_when_large(self):
        x = at.vector("x", dtype="float64")
        w = at.scalar("w", dtype="float64")

        def make(trunc):
            h, _ = scan(
                lambda xt, htm1, w: at.tanh(htm1 * w + xt),
                sequences=[x], outputs_info=[c64(0.0)], non_sequences=[w],
                truncate_gradient=trunc,
            )
            return grad(h[-1], [x, w])

        f_full = function([x, w], make(-1), mode="PY")
        f_big = function([x, w], make(100), mode="PY")
        xv = rng.normal(size=5)
        for a, b in zip(f_full(xv, 0.5), f_big(xv, 0.5)):
            np.testing.assert_allclose(a, b, rtol=1e-10)

    def test_truncated_zeroes_early_steps(self):
        x = at.vector("x", dtype="float64")
        h, _ = scan(
            lambda xt, htm1: htm1 * 0.9 + xt,
            sequences=[x], outputs_info=[c64(0.0)],
            truncate_gradient=2,
        )
        gx = grad(h[-1], x)
        f = function([x], gx, mode="PY")
        res = f(rng.normal(size=6))
        # only the last 2 steps contribute
        np.testing.assert_allclose(res[:4], 0.0)
        np.testing.assert_allclose(res[4:], [0.9, 1.0])


class TestSequenceTaps:
    def test_forward_window(self):
        x = at.vector("x", dtype="float64")
        y, _ = scan(lambda a, b, c: a + b + c,
                    sequences=[dict(input=x, taps=[0, 1, 2])])
        v = rng.normal(size=8)
        res = compare_jax_and_py([x], y, [v])
        np.testing.assert_allclose(np.asarray(res[0]), v[:-2] + v[1:-1] + v[2:])

    def test_negative_taps(self):
        x = at.vector("x", dtype="float64")
        y, _ = scan(lambda prev, cur: prev * cur,
                    sequences=[dict(input=x, taps=[-1, 0])])
        v = rng.normal(size=6)
        res = compare_jax_and_py([x], y, [v])
        np.testing.assert_allclose(np.asarray(res[0]), v[:-1] * v[1:])

    def test_seq_taps_grad(self):
        def build(xv):
            y, _ = scan(lambda a, b: at.tanh(a) * b,
                        sequences=[dict(input=xv, taps=[0, 1])])
            return y.sum()

        verify_grad(build, [rng.normal(size=7)])


class TestSaveMem:
    def test_final_only_rewrite_applies(self):
        from aesara_tpu.scan.op import Scan

        x = at.vector("x", dtype="float64")
        h, _ = scan(lambda xt, a: a * 0.9 + xt, sequences=[x],
                    outputs_info=[c64(0.0)])
        f = function([x], h[-1] * 2.0, mode="FAST_RUN")
        scans = [n for n in f.fgraph.toposort() if isinstance(n.op, Scan)]
        assert scans and scans[0].op.info.final_only == (True,)
        v = rng.normal(size=6)
        f_ref = function([x], h[-1] * 2.0, mode="PY")
        np.testing.assert_allclose(float(f(v)), float(f_ref(v)), rtol=1e-12)

    def test_not_applied_when_stack_needed(self):
        from aesara_tpu.scan.op import Scan

        x = at.vector("x", dtype="float64")
        h, _ = scan(lambda xt, a: a * 0.9 + xt, sequences=[x],
                    outputs_info=[c64(0.0)])
        f = function([x], h[-1] + h.sum(), mode="FAST_RUN")
        scans = [n for n in f.fgraph.toposort() if isinstance(n.op, Scan)]
        assert all(not any(s.op.info.final_only) for s in scans)


class TestPushout:
    def test_invariant_hoisted(self):
        from aesara_tpu.scan.op import Scan
        from aesara_tpu.tensor.elemwise import Elemwise

        x = at.vector("x", dtype="float64")
        w = at.matrix("w", dtype="float64")
        # at.tanh(w) and dot(tanh(w), tanh(w)) are loop-invariant
        h, _ = scan(
            lambda xt, acc, w: acc + xt * at.math.sum(at.dot(at.tanh(w), at.tanh(w))),
            sequences=[x], outputs_info=[c64(0.0)], non_sequences=[w],
        )
        f = function([x, w], h[-1], mode="FAST_RUN")
        scans = [n for n in f.fgraph.toposort() if isinstance(n.op, Scan)]
        assert scans
        inner_ops = [str(nn.op) for nn in scans[0].op.fgraph.toposort()]
        assert not any("dot" in s for s in inner_ops), inner_ops
        # numerics
        f_ref = function([x, w], h[-1], mode="PY")
        xv = rng.normal(size=5)
        wv = rng.normal(size=(3, 3))
        np.testing.assert_allclose(float(f(xv, wv)), float(f_ref(xv, wv)),
                                   rtol=1e-10)

    def test_rng_not_hoisted(self):
        from aesara_tpu.scan.op import Scan

        srng_shared = atp.shared(np.float64(1.0), name="state")
        x = at.vector("x", dtype="float64")
        # shared-carried computation must stay inside
        outs, upd = scan(lambda xt: {srng_shared: srng_shared * 2.0 + xt},
                         sequences=[x])
        f = function([x], [], updates=upd, mode="FAST_RUN")
        f(np.ones(3))
        assert np.isclose(srng_shared.get_value(), 1 * 8 + 4 + 2 + 1)
