"""Scan depth wave (VERDICT r4 item 4): behaviors the reference pins in
``tests/scan/test_basic.py`` that the earlier matrices did not cover —
second-order gradients, R_op, connection-pattern/disconnection
semantics, gradient-through-``until``, shared-variable interactions,
scan-of-scan chaining, merge/CSE of identical scans, pickling, shape
inference without execution, and build-time validation errors.

Every value check is py-vs-XLA differential (``compare_jax_and_py``) or
a ``verify_grad`` finite-difference check; topology checks count Scan
nodes after the FAST_RUN pipeline.
"""

import pickle

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import (
    DisconnectedInputError,
    Lop,
    Rop,
    grad,
    hessian,
    jacobian,
    verify_grad,
)
from aesara_tpu.graph.ir import ancestors
from aesara_tpu.scan.basic import scan, until
from aesara_tpu.scan.op import Scan
from tests.utils import compare_jax_and_py

rng = np.random.default_rng(777)


def n_scan_nodes(outputs):
    return sum(
        1 for v in ancestors(outputs)
        if v.owner is not None and isinstance(v.owner.op, Scan)
    )


# ---------------------------------------------------------------------------
# second-order gradients (reference test_grad_of_grad_of_state,
# test_grad_grad_mitsot_sitsot, hessian_bug_grad_grad_two_scans)
# ---------------------------------------------------------------------------

class TestSecondOrder:
    def test_grad_of_grad_of_state(self):
        """d²/dx² of a scan-accumulated polynomial state matches the
        closed form: s_{t+1} = s_t * x, s_0 = x → s_n = x^(n+1)."""
        x = at.scalar("x", dtype="float64")
        outs, _ = scan(lambda s, xx: s * xx, outputs_info=[x],
                       non_sequences=[x], n_steps=3)
        cost = outs[-1]  # x^4
        g1 = grad(cost, x)          # 4 x^3
        g2 = grad(g1, x)            # 12 x^2
        f = function([x], [cost, g1, g2], mode="FAST_RUN")
        c, a, b = (float(np.asarray(r)) for r in f(2.0))
        assert np.isclose(c, 16.0)
        assert np.isclose(a, 32.0)
        assert np.isclose(b, 48.0)

    def test_hessian_through_scan(self):
        """Hessian of sum(cumprod-like scan) wrt the vector input is
        checked against the py-oracle finite differences."""
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t, acc: acc * x_t,
                       sequences=[v], outputs_info=[at.constant(np.float64(1.0))])
        cost = outs[-1]
        H = hessian(cost, v)
        val = rng.uniform(0.5, 1.5, size=4)
        f = function([v], H, mode="FAST_RUN")
        got = np.asarray(f(val))
        # closed form: d²(prod v)/dv_i dv_j = prod/ (v_i v_j) for i≠j, 0 on diag
        p = np.prod(val)
        expect = p / np.outer(val, val) * (1 - np.eye(4))
        np.testing.assert_allclose(got, expect, rtol=1e-8)

    def test_grad_grad_two_scans(self):
        """Two independent scans feeding one cost: second-order grad
        builds and matches finite differences (reference
        test_hessian_bug_grad_grad_two_scans)."""
        x = at.scalar("x", dtype="float64")
        o1, _ = scan(lambda s: s * 1.5, outputs_info=[x], n_steps=2)
        o2, _ = scan(lambda s: s * s, outputs_info=[x], n_steps=2)
        cost = o1[-1] + o2[-1]
        g = grad(cost, x)
        g2 = grad(g, x)
        f = function([x], g2, mode="FAST_RUN")
        eps = 1e-5

        def g_num(xv):
            fx = function([x], g, mode="FAST_RUN")
            return (float(np.asarray(fx(xv + eps)))
                    - float(np.asarray(fx(xv - eps)))) / (2 * eps)

        assert np.isclose(float(np.asarray(f(1.3))), g_num(1.3), rtol=1e-4)


# ---------------------------------------------------------------------------
# R_op / Lop through scan (reference test_R_op, test_R_op_2)
# ---------------------------------------------------------------------------

class TestRopThroughScan:
    def test_rop_rnn_state_matches_jacobian_dot(self):
        W = at.matrix("W", dtype="float64")
        h0 = at.vector("h0", dtype="float64")
        outs, _ = scan(lambda h, WW: tm.tanh(tm.dot(WW, h)),
                       outputs_info=[h0], non_sequences=[W], n_steps=3)
        final = outs[-1]
        eval_pt = at.vector("p", dtype="float64")
        r = Rop(final, h0, eval_pt)
        J = jacobian(final, h0)
        jr = tm.dot(J, eval_pt)
        Wv = rng.normal(size=(3, 3)) * 0.4
        hv = rng.normal(size=3)
        pv = rng.normal(size=3)
        f = function([W, h0, eval_pt], [r, jr], mode="FAST_RUN")
        a, b = f(Wv, hv, pv)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7)

    def test_rop_wrt_nonseq_weight(self):
        W = at.matrix("W", dtype="float64")
        h0v = np.array([0.3, -0.2, 0.5])
        outs, _ = scan(lambda h, WW: tm.tanh(tm.dot(WW, h)),
                       outputs_info=[at.as_tensor_variable(h0v)],
                       non_sequences=[W], n_steps=2)
        final = outs[-1].sum()
        P = at.matrix("P", dtype="float64")
        r = Rop(final, W, P)
        Wv = rng.normal(size=(3, 3)) * 0.4
        Pv = rng.normal(size=(3, 3))
        # directional finite difference
        f0 = function([W], final, mode="FAST_RUN")
        eps = 1e-6
        fd = (float(np.asarray(f0(Wv + eps * Pv)))
              - float(np.asarray(f0(Wv - eps * Pv)))) / (2 * eps)
        fr = function([W, P], r, mode="FAST_RUN")
        assert np.isclose(float(np.asarray(fr(Wv, Pv))), fd, rtol=1e-4)

    def test_lop_equals_grad_weighting(self):
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t, acc: acc + x_t * x_t,
                       sequences=[v],
                       outputs_info=[at.constant(np.float64(0.0))])
        weights = at.vector("w", dtype="float64")
        lop = Lop(outs, v, weights)
        explicit = grad((outs * weights).sum(), v)
        vv = rng.normal(size=4)
        wv = rng.normal(size=4)
        f = function([v, weights], [lop, explicit], mode="FAST_RUN")
        a, b = f(vv, wv)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


# ---------------------------------------------------------------------------
# connection pattern / disconnected gradients (reference
# test_connection_pattern, test_disconnected_gradient{,2,3})
# ---------------------------------------------------------------------------

class TestDisconnection:
    def test_grad_wrt_unused_nonseq_raises(self):
        v = at.vector("v", dtype="float64")
        unused = at.scalar("u", dtype="float64")
        outs, _ = scan(lambda x_t, u: x_t * 2.0, sequences=[v],
                       non_sequences=[unused])
        with pytest.raises((DisconnectedInputError, ValueError)):
            grad(outs.sum(), unused)

    def test_grad_wrt_unused_nonseq_ignore_gives_zeros(self):
        v = at.vector("v", dtype="float64")
        unused = at.scalar("u", dtype="float64")
        outs, _ = scan(lambda x_t, u: x_t * 2.0, sequences=[v],
                       non_sequences=[unused])
        g = grad(outs.sum(), unused, disconnected_inputs="ignore")
        f = function([v, unused], g, mode="FAST_RUN",
                     on_unused_input="ignore")
        assert float(np.asarray(f(rng.normal(size=3), 1.0))) == 0.0

    def test_one_output_disconnected_from_one_input(self):
        """Two outputs, each depending on ONE input; grads route only
        through the connected one (reference connection-pattern)."""
        a = at.vector("a", dtype="float64")
        b = at.vector("b", dtype="float64")
        (o1, o2), _ = scan(lambda x_t, y_t: (x_t * 3.0, y_t * y_t),
                           sequences=[a, b])
        ga = grad(o1.sum(), a)
        # the scan-grad node structurally takes ALL outer operands, so b
        # stays a graph input even though no gradient flows through it
        f = function([a, b], ga, mode="FAST_RUN", on_unused_input="ignore")
        np.testing.assert_allclose(
            np.asarray(f(rng.normal(size=4), rng.normal(size=4))),
            np.full(4, 3.0))
        with pytest.raises((DisconnectedInputError, ValueError)):
            grad(o1.sum(), b)

    def test_disconnected_init_state(self):
        """An output whose value never reads its own previous state is
        still a valid sit-sot; grad wrt the init is disconnected."""
        v = at.vector("v", dtype="float64")
        init = at.scalar("i", dtype="float64")
        outs, _ = scan(lambda x_t, prev: x_t + 1.0, sequences=[v],
                       outputs_info=[init])
        g = grad(outs.sum(), init, disconnected_inputs="ignore")
        f = function([v, init], g, mode="FAST_RUN",
                     on_unused_input="ignore")
        assert float(np.asarray(f(rng.normal(size=3), 5.0))) == 0.0


# ---------------------------------------------------------------------------
# gradient through until (reference test_grad_until family)
# ---------------------------------------------------------------------------

class TestGradUntil:
    def _build(self, truncate=-1):
        v = at.vector("v", dtype="float64")
        outs, _ = scan(
            lambda x_t, acc: (acc + x_t * x_t, until(acc > 10.0)),
            sequences=[v],
            outputs_info=[at.constant(np.float64(0.0))],
            truncate_gradient=truncate,
        )
        return v, outs

    def test_grad_until_matches_effective_prefix(self):
        """Gradient flows only through the steps that actually ran.
        ``until(acc > 10)`` reads the PREVIOUS state, so with acc
        reaching 14 after step 3 the condition fires entering step 4:
        four steps execute, v[4] never participates."""
        v, outs = self._build()
        g = grad(outs[-1], v)
        vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        f = function([v], g, mode="PY")
        got = np.asarray(f(vals))
        expect = np.array([2.0, 4.0, 6.0, 8.0, 0.0])
        np.testing.assert_allclose(got, expect)

    def test_grad_until_and_truncate(self):
        v, outs = self._build(truncate=1)
        g = grad(outs[-1], v)
        vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        f = function([v], g, mode="PY")
        got = np.asarray(f(vals))
        # truncate_gradient=1: only the LAST executed step (step 4) gets grad
        np.testing.assert_allclose(got, [0.0, 0.0, 0.0, 8.0, 0.0])

    def test_grad_until_ndim_greater_one(self):
        m = at.matrix("m", dtype="float64")
        outs, _ = scan(
            lambda row, acc: (acc + row, until(acc.sum() > 100.0)),
            sequences=[m],
            outputs_info=[at.as_tensor_variable(np.zeros(3))],
        )
        g = grad(outs[-1].sum(), m)
        mv = rng.uniform(0.1, 1.0, size=(5, 3))
        f = function([m], g, mode="PY")
        got = np.asarray(f(mv))
        assert got.shape == (5, 3)
        np.testing.assert_allclose(got, np.ones((5, 3)))  # never stops


# ---------------------------------------------------------------------------
# shared-variable interactions (reference test_shared_arguments_with_updates,
# test_grad_wrt_shared, test_inner_grad_wrt_shared, test_grad_numeric_shared)
# ---------------------------------------------------------------------------

class TestSharedInteractions:
    def test_grad_wrt_shared(self):
        w = atp.shared(np.array([0.5, 1.5]), name="w")
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t, ww: (x_t * ww).sum(), sequences=[v],
                       non_sequences=[w])
        g = grad(outs.sum(), w)
        f = function([v], g, mode="FAST_RUN")
        vv = rng.normal(size=4)
        np.testing.assert_allclose(np.asarray(f(vv)),
                                   np.full(2, vv.sum()))

    def test_inner_grad_wrt_shared(self):
        """grad() used INSIDE the scan body wrt a shared variable."""
        w = atp.shared(np.float64(2.0), name="w")
        v = at.vector("v", dtype="float64")

        def body(x_t):
            inner_cost = x_t * w * w
            return grad(inner_cost, w)  # 2*w*x_t

        outs, _ = scan(body, sequences=[v])
        f = function([v], outs, mode="FAST_RUN")
        vv = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f(vv)), 4.0 * vv)

    def test_shared_update_and_output_interleave(self):
        """A body that both updates a shared counter and emits outputs:
        the final counter equals n_steps and outputs see the updated
        value sequence."""
        counter = atp.shared(np.float64(0.0), name="c")
        v = at.vector("v", dtype="float64")
        outs, updates = scan(
            lambda x_t: (x_t + counter, {counter: counter + 1.0}),
            sequences=[v])
        f = function([v], outs, updates=updates, mode="FAST_RUN")
        got = np.asarray(f(np.zeros(4)))
        # step t sees the PRE-update counter value t
        np.testing.assert_allclose(got, [0.0, 1.0, 2.0, 3.0])
        assert float(counter.get_value()) == 4.0
        counter.set_value(np.float64(0.0))

    def test_grad_with_int_shared_passthrough(self):
        """An integer shared riding the body must not break the grad
        (reference test_grad_numeric_shared)."""
        k = atp.shared(np.int64(3), name="k")
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t: x_t * tm.cast(k, "float64"),
                       sequences=[v])
        g = grad(outs.sum(), v)
        f = function([v], g, mode="FAST_RUN")
        np.testing.assert_allclose(np.asarray(f(rng.normal(size=3))),
                                   np.full(3, 3.0))


# ---------------------------------------------------------------------------
# scan chaining + merge (reference test_use_scan_direct_output, test_same,
# can_merge)
# ---------------------------------------------------------------------------

class TestChainingAndMerge:
    def test_scan_output_feeds_second_scan(self):
        v = at.vector("v", dtype="float64")
        o1, _ = scan(lambda x_t: x_t * 2.0, sequences=[v])
        o2, _ = scan(lambda y_t, acc: acc + y_t, sequences=[o1],
                     outputs_info=[at.constant(np.float64(0.0))])
        vv = rng.normal(size=5)
        compare_jax_and_py([v], o2, [vv])
        f = function([v], o2[-1], mode="FAST_RUN")
        assert np.isclose(float(np.asarray(f(vv))), 2.0 * vv.sum())

    def test_identical_scans_merge_to_one(self):
        """Two structurally identical scans over the same inputs merge
        (CSE at the Scan level)."""
        v = at.vector("v", dtype="float64")
        o1, _ = scan(lambda x_t: x_t * 2.0, sequences=[v])
        o2, _ = scan(lambda x_t: x_t * 2.0, sequences=[v])
        out = o1.sum() + o2.sum()
        f = function([v], out, mode="FAST_RUN")
        post = f.maker.fgraph.outputs
        assert n_scan_nodes(post) <= 1
        vv = rng.normal(size=4)
        assert np.isclose(float(np.asarray(f(vv))), 4.0 * vv.sum())

    def test_different_scans_do_not_merge(self):
        v = at.vector("v", dtype="float64")
        o1, _ = scan(lambda x_t: x_t * 2.0, sequences=[v])
        o2, _ = scan(lambda x_t: x_t * 3.0, sequences=[v])
        out = o1.sum() + o2.sum()
        f = function([v], out, mode="FAST_RUN")
        vv = rng.normal(size=4)
        assert np.isclose(float(np.asarray(f(vv))), 5.0 * vv.sum())

    def test_grad_of_chained_scans(self):
        v = at.vector("v", dtype="float64")
        o1, _ = scan(lambda x_t: tm.tanh(x_t), sequences=[v])
        o2, _ = scan(lambda y_t, acc: acc * (1.0 + y_t), sequences=[o1],
                     outputs_info=[at.constant(np.float64(1.0))])
        vv = rng.uniform(-0.5, 0.5, size=4)
        g = grad(o2[-1], v)
        f = function([v], g, mode="FAST_RUN")
        eps = 1e-6
        f0 = function([v], o2[-1], mode="FAST_RUN")
        for i in range(4):
            d = np.zeros(4); d[i] = eps
            fd = (float(np.asarray(f0(vv + d)))
                  - float(np.asarray(f0(vv - d)))) / (2 * eps)
            assert np.isclose(np.asarray(f(vv))[i], fd, rtol=1e-4)


# ---------------------------------------------------------------------------
# pickling (reference test_pickling)
# ---------------------------------------------------------------------------

class TestPickling:
    def test_compiled_scan_function_roundtrip(self):
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t, acc: acc + tm.sqr(x_t), sequences=[v],
                       outputs_info=[at.constant(np.float64(0.0))])
        f = function([v], outs[-1], mode="FAST_RUN")
        vv = rng.normal(size=5)
        expect = float(np.asarray(f(vv)))
        f2 = pickle.loads(pickle.dumps(f))
        assert np.isclose(float(np.asarray(f2(vv))), expect)

    def test_scan_with_shared_state_roundtrip(self):
        w = atp.shared(np.float64(1.5), name="w")
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t: x_t * w, sequences=[v])
        f = function([v], outs, mode="FAST_RUN")
        f2 = pickle.loads(pickle.dumps(f))
        vv = rng.normal(size=3)
        np.testing.assert_allclose(np.asarray(f2(vv)), np.asarray(f(vv)))


# ---------------------------------------------------------------------------
# shape inference without running the loop (reference
# test_while_infer_shape, test_infershape_seq_shorter_nsteps)
# ---------------------------------------------------------------------------

class TestShapeInference:
    def test_shape_of_map_output_is_seq_len(self):
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t: x_t * 2.0, sequences=[v])
        f = function([v], outs.shape, mode="FAST_RUN")
        shp = np.asarray(f(np.zeros(7)))
        assert tuple(shp) == (7,)
        # shape graph must not execute the scan itself
        assert n_scan_nodes(f.maker.fgraph.outputs) == 0

    def test_shape_of_nsteps_output(self):
        k = at.iscalar("k")
        outs, _ = scan(lambda acc: acc * 2.0,
                       outputs_info=[at.constant(np.float64(1.0))],
                       n_steps=k)
        f = function([k], outs.shape, mode="FAST_RUN")
        assert tuple(np.asarray(f(5))) == (5,)
        assert n_scan_nodes(f.maker.fgraph.outputs) == 0

    def test_matrix_state_shape(self):
        m0 = at.matrix("m0", dtype="float64")
        outs, _ = scan(lambda m: m * 1.1, outputs_info=[m0], n_steps=4)
        f = function([m0], outs.shape, mode="FAST_RUN")
        assert tuple(np.asarray(f(np.zeros((2, 3))))) == (4, 2, 3)


# ---------------------------------------------------------------------------
# build-time validation (reference test_outputs_taps_check,
# test_missing_input_error, test_bad_broadcast_check, mintap_onestep)
# ---------------------------------------------------------------------------

class TestValidation:
    def test_outputs_info_without_taps_key_ok(self):
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t, acc: acc + x_t, sequences=[v],
                       outputs_info=[{"initial": at.constant(np.float64(0.0))}])
        f = function([v], outs[-1], mode="FAST_RUN")
        vv = rng.normal(size=3)
        assert np.isclose(float(np.asarray(f(vv))), vv.sum())

    def test_taps_must_be_negative(self):
        v = at.vector("v", dtype="float64")
        with pytest.raises((ValueError, TypeError)):
            scan(lambda a, b: a + b, sequences=[v],
                 outputs_info=[{"initial": at.vector("i", dtype="float64"),
                                "taps": [1]}])

    def test_wrong_arity_body_raises(self):
        v = at.vector("v", dtype="float64")
        with pytest.raises(TypeError):
            scan(lambda x_t, extra_arg_never_given: x_t, sequences=[v])

    def test_mintap_onestep(self):
        """A single-step scan with a deep tap still needs (and uses)
        only the provided init rows."""
        init = at.vector("init", dtype="float64")  # 2 rows for taps [-2,-1]
        outs, _ = scan(
            lambda m2, m1: m1 + m2,
            outputs_info=[{"initial": init, "taps": [-2, -1]}],
            n_steps=1)
        f = function([init], outs, mode="FAST_RUN")
        got = np.asarray(f(np.array([1.0, 2.0])))
        np.testing.assert_allclose(got, [3.0])

    def test_init_state_wrong_ndim_raises(self):
        """A body producing a scalar carry against a VECTOR init is a
        genuine type mismatch (a matrix init with broadcasting body is
        legal — the carry is simply a matrix)."""
        v = at.vector("v", dtype="float64")
        with pytest.raises((TypeError, ValueError)):
            scan(lambda x_t, acc: acc.sum() + x_t, sequences=[v],
                 outputs_info=[at.vector("i", dtype="float64")])

    def test_dtype_change_in_carry_raises(self):
        """A body whose output dtype differs from the init dtype must be
        rejected at build time (the carry type must be loop-invariant)."""
        with pytest.raises((TypeError, ValueError)):
            scan(lambda acc: tm.cast(acc, "float32") * np.float32(1.0),
                 outputs_info=[at.constant(np.float64(1.0))], n_steps=3)


# ---------------------------------------------------------------------------
# misc behaviors: backwards+taps grad, multiple outs w/ different taps,
# constant-folded n_steps (reference test_constant_folding_n_steps)
# ---------------------------------------------------------------------------

class TestMiscBehaviors:
    def test_multiple_outs_different_taps_grad(self):
        v = at.vector("v", dtype="float64")
        i1 = at.vector("i1", dtype="float64")  # taps [-2,-1]
        i2 = at.scalar("i2", dtype="float64")  # tap [-1]

        def body(x_t, a_m2, a_m1, b_m1):
            return a_m1 * 0.5 + a_m2 * 0.25 + x_t, b_m1 + x_t * x_t

        (o1, o2), _ = scan(
            body, sequences=[v],
            outputs_info=[{"initial": i1, "taps": [-2, -1]}, i2])
        vv = rng.normal(size=5)
        i1v = rng.normal(size=2)
        i2v = float(rng.normal())
        compare_jax_and_py([v, i1, i2], [o1, o2], [vv, i1v, i2v])
        cost = o1[-1] + o2[-1]
        g = grad(cost, [v, i1, i2])
        f = function([v, i1, i2], g, mode="FAST_RUN")
        f0 = function([v, i1, i2], cost, mode="FAST_RUN")
        eps = 1e-6
        gv = [np.asarray(x) for x in f(vv, i1v, i2v)]
        d = np.zeros(5); d[2] = eps
        fd = (float(np.asarray(f0(vv + d, i1v, i2v)))
              - float(np.asarray(f0(vv - d, i1v, i2v)))) / (2 * eps)
        assert np.isclose(gv[0][2], fd, rtol=1e-4)

    def test_backwards_with_state_grad(self):
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t, acc: acc * 0.9 + x_t, sequences=[v],
                       outputs_info=[at.constant(np.float64(0.0))],
                       go_backwards=True)
        vv = rng.normal(size=4)
        g = grad(outs[-1], v)
        f = function([v], g, mode="FAST_RUN")
        got = np.asarray(f(vv))
        # processed in reverse: v[3] enters first and decays 3 more steps,
        # v[0] enters last with no decay → d(final)/d(v[i]) = 0.9**i
        expect = 0.9 ** np.arange(4)
        np.testing.assert_allclose(got, expect)

    def test_constant_n_steps_folds(self):
        """n_steps given as a 0-d constant graph folds; the compiled
        function runs the loop the right number of times."""
        n = at.constant(np.int64(2)) + at.constant(np.int64(3))
        outs, _ = scan(lambda acc: acc + 1.0,
                       outputs_info=[at.constant(np.float64(0.0))],
                       n_steps=n)
        f = function([], outs[-1], mode="FAST_RUN")
        assert float(np.asarray(f())) == 5.0

    def test_scan_output_sliced_then_grad(self):
        """Composition: grad through a prefix window of the stack (rides
        scan_save_mem_prefix when active)."""
        v = at.vector("v", dtype="float64")
        outs, _ = scan(lambda x_t, acc: acc + tm.exp(x_t), sequences=[v],
                       outputs_info=[at.constant(np.float64(0.0))])
        cost = outs[:3].sum()
        g = grad(cost, v)
        vv = rng.normal(size=6)
        f = function([v], g, mode="FAST_RUN")
        got = np.asarray(f(vv))
        # v[0] contributes to outs[0..2] (3 times), v[1] to 2, v[2] to 1
        expect = np.exp(vv) * np.array([3.0, 2.0, 1.0, 0.0, 0.0, 0.0])
        np.testing.assert_allclose(got, expect, rtol=1e-8)

    def test_sequence_dict_with_positive_and_negative_taps_grad(self):
        x = at.vector("x", dtype="float64")
        outs, _ = scan(lambda xm1, xp1: xm1 * xp1,
                       sequences=[{"input": x, "taps": [-1, 1]}])
        vv = rng.uniform(0.5, 1.5, size=5)
        compare_jax_and_py([x], outs, [vv])
        verify_grad(
            lambda xx: scan(lambda xm1, xp1: xm1 * xp1,
                            sequences=[{"input": xx, "taps": [-1, 1]}])[0].sum(),
            [vv], rng=rng)
