"""Scan feature-COMBINATION grid (reference ``tests/scan/test_basic.py``
breadth): sequences × output kinds × go_backwards × modes, symbolic
n_steps, truncate_gradient differentials against a disconnected-grad
unroll, strict mode, return_list, and heterogeneous multi-output
bodies — value checks against a numpy simulator, gradient checks
against unrolled graphs."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.scan.basic import scan

rng = np.random.default_rng(808)

MODES = ["PY", "FAST_RUN"]


def fvec(name):
    return at.vector(name, dtype="float64")


# ---------------------------------------------------------------------------
# sequences × output-kind × go_backwards value grid
# ---------------------------------------------------------------------------

class TestDirectionKindGrid:
    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("backwards", [False, True])
    def test_sitsot_with_sequence(self, mode, backwards):
        x = fvec("x")
        h0 = at.scalar("h0", dtype="float64")
        ys, _ = scan(lambda xt, h: 0.5 * h + xt, sequences=[x],
                     outputs_info=[h0], go_backwards=backwards)
        f = function([x, h0], ys, mode=mode)
        xv = rng.normal(size=6)
        seq = xv[::-1] if backwards else xv
        h = 0.25
        want = []
        for t in range(6):
            h = 0.5 * h + seq[t]
            want.append(h)
        np.testing.assert_allclose(np.asarray(f(xv, 0.25)), want)

    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("backwards", [False, True])
    def test_nitsot_map(self, mode, backwards):
        x = fvec("x")
        ys, _ = scan(lambda xt: xt ** 2, sequences=[x],
                     go_backwards=backwards)
        f = function([x], ys, mode=mode)
        xv = rng.normal(size=5)
        seq = xv[::-1] if backwards else xv
        np.testing.assert_allclose(np.asarray(f(xv)), seq ** 2)

    @pytest.mark.parametrize("mode", MODES)
    @pytest.mark.parametrize("backwards", [False, True])
    def test_mitsot_taps(self, mode, backwards):
        x = fvec("x")
        h0 = fvec("h0")          # (2,) buffer for taps [-2, -1]
        ys, _ = scan(lambda xt, hm2, hm1: hm2 * 0.25 + hm1 * 0.5 + xt,
                     sequences=[x],
                     outputs_info=[{"initial": h0, "taps": [-2, -1]}],
                     go_backwards=backwards)
        f = function([x, h0], ys, mode=mode)
        xv = rng.normal(size=5)
        h0v = np.array([0.3, -0.2])
        seq = xv[::-1] if backwards else xv
        buf = list(h0v)
        want = []
        for t in range(5):
            v = buf[-2] * 0.25 + buf[-1] * 0.5 + seq[t]
            buf.append(v)
            want.append(v)
        np.testing.assert_allclose(np.asarray(f(xv, h0v)), want)

    @pytest.mark.parametrize("backwards", [False, True])
    def test_gradient_through_direction(self, backwards):
        x = fvec("x")
        ys, _ = scan(lambda xt, h: h * 0.9 + xt ** 2, sequences=[x],
                     outputs_info=[at.constant(np.float64(0.0))],
                     go_backwards=backwards)
        cost = tm.sum(ys)
        (gx,) = atp.grad(cost, [x])
        f = function([x], gx, mode="PY")
        xv = rng.normal(size=4)
        # finite differences
        eps = 1e-6
        fc = function([x], cost, mode="PY")
        want = np.zeros(4)
        for i in range(4):
            e = np.zeros(4); e[i] = eps
            want[i] = (float(np.asarray(fc(xv + e)))
                       - float(np.asarray(fc(xv - e)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(f(xv)), want, rtol=1e-4)


# ---------------------------------------------------------------------------
# n_steps forms
# ---------------------------------------------------------------------------

class TestNSteps:
    @pytest.mark.parametrize("mode", MODES)
    def test_symbolic_n_steps(self, mode):
        n = at.iscalar("n")
        ys, _ = scan(lambda h: h * 2.0,
                     outputs_info=[at.constant(np.float64(1.0))], n_steps=n)
        f = function([n], ys[-1], mode=mode)
        assert float(np.asarray(f(5))) == 32.0
        assert float(np.asarray(f(3))) == 8.0

    @pytest.mark.parametrize("mode", MODES)
    def test_n_steps_truncates_sequence(self, mode):
        x = fvec("x")
        n = at.iscalar("n")
        ys, _ = scan(lambda xt: xt + 1.0, sequences=[x], n_steps=n)
        f = function([x, n], ys, mode=mode)
        xv = rng.normal(size=7)
        got = np.asarray(f(xv, 4))
        assert got.shape == (4,)
        np.testing.assert_allclose(got, xv[:4] + 1.0)

    def test_data_dependent_n_steps_falls_back_with_warning(self):
        import warnings

        n = at.iscalar("n")
        ys, _ = scan(lambda h: h * 2.0,
                     outputs_info=[at.constant(np.float64(1.0))], n_steps=n)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            f = function([n], ys[-1], mode="FAST_RUN")
            assert float(np.asarray(f(4))) == 16.0
        assert [w for w in rec if "py path" in str(w.message)]

    def test_shape_derived_n_steps_stays_on_xla(self):
        import warnings

        x = at.tensor(dtype="float64", shape=(None,), name="x")
        ys, _ = scan(lambda h: h + 1.0,
                     outputs_info=[at.constant(np.float64(0.0))],
                     n_steps=x.shape[0])
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            f = function([x], ys[-1], mode="FAST_RUN")
            assert float(np.asarray(f(np.zeros(5)))) == 5.0
        assert not [w for w in rec if "py path" in str(w.message)]

    def test_n_steps_one(self):
        ys, _ = scan(lambda h: h + 1.0,
                     outputs_info=[at.constant(np.float64(0.0))], n_steps=1)
        f = function([], ys, mode="PY")
        np.testing.assert_allclose(np.asarray(f()), [1.0])

    def test_sequence_shorter_than_n_steps_raises(self):
        x = fvec("x")
        ys, _ = scan(lambda xt: xt, sequences=[x], n_steps=9)
        f = function([x], ys, mode="PY")
        with pytest.raises(Exception):
            f(np.zeros(3))


# ---------------------------------------------------------------------------
# truncate_gradient: differential vs a disconnected-grad unroll
# ---------------------------------------------------------------------------

class TestTruncateGradient:
    N = 6

    def _unrolled_cost(self, x, w, k):
        """Unroll h_t = tanh(w*h + x_t); with truncation k, h_{t-k} is
        treated as constant for step t's backward — equivalent to
        cutting the recurrent path k steps back from the END."""
        from aesara_tpu.gradient import disconnected_grad

        h = at.constant(np.float64(0.0))
        hs = []
        for t in range(self.N):
            h = tm.tanh(w * h + x[t])
            hs.append(h)
            # cut the chain so at most k recurrent steps backprop
            if k > 0 and t == self.N - 1 - k:
                h = disconnected_grad(h)
        return tm.sum(hs[-1])

    @pytest.mark.parametrize("k", [1, 3])
    def test_matches_unroll_cut(self, k):
        x = fvec("x")
        w = at.scalar("w", dtype="float64")
        ys, _ = scan(lambda xt, h, wv: tm.tanh(wv * h + xt), sequences=[x],
                     outputs_info=[at.constant(np.float64(0.0))],
                     non_sequences=[w], truncate_gradient=k)
        cost = tm.sum(ys[-1])
        (gw,) = atp.grad(cost, [w])
        (gw_ref,) = atp.grad(self._unrolled_cost(x, w, k), [w])
        f = function([x, w], [gw, gw_ref], mode="PY")
        xv = rng.normal(size=self.N) * 0.5
        a, b = f(xv, 0.7)
        np.testing.assert_allclose(float(np.asarray(a)),
                                   float(np.asarray(b)), rtol=1e-10)

    def test_minus_one_is_full_bptt(self):
        x = fvec("x")
        w = at.scalar("w", dtype="float64")
        ys, _ = scan(lambda xt, h, wv: tm.tanh(wv * h + xt), sequences=[x],
                     outputs_info=[at.constant(np.float64(0.0))],
                     non_sequences=[w], truncate_gradient=-1)
        (gw,) = atp.grad(tm.sum(ys[-1]), [w])
        (gw_ref,) = atp.grad(self._unrolled_cost(x, w, 0), [w])
        f = function([x, w], [gw, gw_ref], mode="PY")
        xv = rng.normal(size=self.N) * 0.5
        a, b = f(xv, 0.7)
        np.testing.assert_allclose(float(np.asarray(a)),
                                   float(np.asarray(b)), rtol=1e-10)

    def test_truncation_changes_gradient(self):
        # sanity: k=1 and full BPTT genuinely differ on this graph
        x = fvec("x")
        w = at.scalar("w", dtype="float64")

        def build(k):
            ys, _ = scan(lambda xt, h, wv: tm.tanh(wv * h + xt), sequences=[x],
                         outputs_info=[at.constant(np.float64(0.0))],
                         non_sequences=[w], truncate_gradient=k)
            return atp.grad(tm.sum(ys[-1]), [w])[0]

        f = function([x, w], [build(1), build(-1)], mode="PY")
        a, b = f(rng.normal(size=self.N) * 0.5, 0.7)
        assert abs(float(np.asarray(a)) - float(np.asarray(b))) > 1e-12


# ---------------------------------------------------------------------------
# strict mode / return_list
# ---------------------------------------------------------------------------

class TestStrictAndReturnList:
    def test_strict_rejects_implicit_shared(self):
        s = atp.shared(np.float64(2.0), name="s")
        x = fvec("x")
        with pytest.raises(Exception, match="strict|shared"):
            scan(lambda xt: xt * s, sequences=[x], strict=True)

    def test_strict_ok_with_explicit_nonseq(self):
        s = atp.shared(np.float64(2.0), name="s")
        x = fvec("x")
        ys, _ = scan(lambda xt, sv: xt * sv, sequences=[x],
                     non_sequences=[s], strict=True)
        f = function([x], ys, mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.ones(3))), [2.0] * 3)

    def test_return_list_single_output(self):
        x = fvec("x")
        out, _ = scan(lambda xt: xt + 1.0, sequences=[x], return_list=True)
        assert isinstance(out, list) and len(out) == 1
        f = function([x], out[0], mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.zeros(3))), [1.0] * 3)

    def test_no_return_list_single_is_variable(self):
        x = fvec("x")
        out, _ = scan(lambda xt: xt + 1.0, sequences=[x])
        assert not isinstance(out, list)


# ---------------------------------------------------------------------------
# heterogeneous multi-output bodies
# ---------------------------------------------------------------------------

class TestHeterogeneousOutputs:
    @pytest.mark.parametrize("mode", MODES)
    def test_nit_sit_mit_shared_in_one_scan(self, mode):
        x = fvec("x")
        h0 = at.scalar("h0", dtype="float64")
        m0 = fvec("m0")           # (2,) for taps [-2,-1]
        acc = atp.shared(np.float64(0.0), name="acc")

        def body(xt, hm1, mm2, mm1):
            sq = xt ** 2                       # nit-sot
            h = 0.5 * hm1 + xt                 # sit-sot
            m = mm2 + mm1 + xt                 # mit-sot
            return (sq, h, m), {acc: acc + xt}

        (sqs, hs, ms), updates = scan(
            body, sequences=[x],
            outputs_info=[None, h0, {"initial": m0, "taps": [-2, -1]}])
        f = function([x, h0, m0], [sqs, hs, ms], updates=updates, mode=mode)
        xv = rng.normal(size=5)
        got_sq, got_h, got_m = [np.asarray(v) for v in f(xv, 0.1,
                                                         np.array([1.0, 2.0]))]
        np.testing.assert_allclose(got_sq, xv ** 2)
        h = 0.1
        want_h = []
        for t in range(5):
            h = 0.5 * h + xv[t]
            want_h.append(h)
        np.testing.assert_allclose(got_h, want_h)
        buf = [1.0, 2.0]
        want_m = []
        for t in range(5):
            v = buf[-2] + buf[-1] + xv[t]
            buf.append(v)
            want_m.append(v)
        np.testing.assert_allclose(got_m, want_m)
        np.testing.assert_allclose(float(acc.get_value()), xv.sum())
        acc.set_value(np.float64(0.0))

    def test_grad_through_multi_output(self):
        x = fvec("x")

        def body(xt, hm1):
            return xt ** 2, 0.5 * hm1 + xt

        (sqs, hs), _ = scan(
            body, sequences=[x],
            outputs_info=[None, at.constant(np.float64(0.0))])
        cost = tm.sum(sqs) + tm.sum(hs)
        (gx,) = atp.grad(cost, [x])
        fc = function([x], cost, mode="PY")
        fg = function([x], gx, mode="PY")
        xv = rng.normal(size=4)
        eps = 1e-6
        want = np.zeros(4)
        for i in range(4):
            e = np.zeros(4); e[i] = eps
            want[i] = (float(np.asarray(fc(xv + e)))
                       - float(np.asarray(fc(xv - e)))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(fg(xv)), want, rtol=1e-4)


# ---------------------------------------------------------------------------
# multiple sequences, unequal roles
# ---------------------------------------------------------------------------

class TestMultipleSequences:
    @pytest.mark.parametrize("mode", MODES)
    def test_two_sequences_zip_shortest_static(self, mode):
        a = fvec("a")
        b = fvec("b")
        ys, _ = scan(lambda at_, bt: at_ * bt, sequences=[a, b])
        f = function([a, b], ys, mode=mode)
        av = rng.normal(size=4)
        bv = rng.normal(size=4)
        np.testing.assert_allclose(np.asarray(f(av, bv)), av * bv)

    def test_sequence_dict_with_taps(self):
        # sequence taps: xt at [-1, 0, 1] sees a sliding window
        x = fvec("x")
        ys, _ = scan(lambda xm1, x0, xp1: xm1 + x0 + xp1,
                     sequences=[{"input": x, "taps": [-1, 0, 1]}])
        f = function([x], ys, mode="PY")
        xv = rng.normal(size=6)
        want = xv[:-2] + xv[1:-1] + xv[2:]
        np.testing.assert_allclose(np.asarray(f(xv)), want)

    def test_sequence_positive_taps_only(self):
        x = fvec("x")
        ys, _ = scan(lambda x0, xp2: x0 * xp2,
                     sequences=[{"input": x, "taps": [0, 2]}])
        f = function([x], ys, mode="PY")
        xv = rng.normal(size=6)
        np.testing.assert_allclose(np.asarray(f(xv)), xv[:-2] * xv[2:])
