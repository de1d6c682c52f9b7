"""While-scan case matrices (VERDICT r3 #5): until-loops across carry
kinds, the bounded ``padded_while`` XLA strategy, grads through
truncated runs, and the final-only rewrite interplay — reference
``tests/scan/test_basic.py`` while families re-expressed.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.scan.basic import scan, until

rng = np.random.default_rng(11)


def c64(v):
    return at.constant(np.float64(v))


class TestWhileCarryKinds:
    def test_scalar_carry(self):
        out, _ = scan(lambda acc: (acc * 2.0, until(acc * 2.0 > 20.0)),
                      outputs_info=[c64(1.0)], n_steps=64)
        f = function([], out[-1], mode="PY")
        assert float(f()) == 32.0

    def test_vector_carry(self):
        init = at.as_tensor_variable(np.ones(3))
        out, _ = scan(lambda v: (v + 1.0, until(at.sum(v + 1.0) > 8.0)),
                      outputs_info=[init], n_steps=32)
        f = function([], out[-1], mode="PY")
        np.testing.assert_allclose(np.asarray(f()), [3.0, 3.0, 3.0])

    def test_two_carries_condition_on_one(self):
        outs, _ = scan(
            lambda a, b: ((a + 1.0, b * 2.0), until(a + 1.0 >= 4.0)),
            outputs_info=[c64(0.0), c64(1.0)], n_steps=64)
        f = function([], [outs[0][-1], outs[1][-1]], mode="PY")
        ra, rb = f()
        assert float(ra) == 4.0 and float(rb) == 16.0

    def test_while_with_sequence_consumption(self):
        x = at.vector("x", dtype="float64")
        out, _ = scan(lambda xt, acc: (acc + xt, until(acc + xt > 2.0)),
                      sequences=[x], outputs_info=[c64(0.0)])
        f = function([x], out, mode="PY")
        r = np.asarray(f(np.array([1.0, 1.0, 1.0, 1.0, 1.0])))
        np.testing.assert_allclose(r, [1.0, 2.0, 3.0])

    def test_while_nit_sot_output(self):
        out, _ = scan(
            lambda acc: ((acc + 1.0, (acc + 1.0) ** 2),
                         until(acc + 1.0 >= 4.0)),
            outputs_info=[c64(0.0), None], n_steps=32)
        f = function([], out[1], mode="PY")
        np.testing.assert_allclose(np.asarray(f()), [1.0, 4.0, 9.0, 16.0])


class TestPaddedWhile:
    """padded_while=True: while-loop as a BOUNDED scan with a done-flag
    carry — static shapes for XLA (SURVEY §7(b))."""

    def test_matches_plain_while_final(self):
        out_plain, _ = scan(lambda acc: (acc * 2.0, until(acc * 2.0 > 20.0)),
                            outputs_info=[c64(1.0)], n_steps=16)
        (vals, valid), _ = scan(
            lambda acc: (acc * 2.0, until(acc * 2.0 > 20.0)),
            outputs_info=[c64(1.0)], n_steps=16, padded_while=True)
        f_plain = function([], out_plain[-1], mode="PY")
        f_pad = function([], [vals[-1], valid], mode="PY")
        pv, mask = f_pad()
        assert float(f_plain()) == float(np.asarray(pv)) == 32.0
        assert np.asarray(mask).sum() == 5  # 2,4,8,16,32

    def test_padded_compiles_on_xla(self):
        (vals, valid), _ = scan(
            lambda acc: (acc + 1.0, until(acc + 1.0 >= 5.0)),
            outputs_info=[c64(0.0)], n_steps=16, padded_while=True)
        f = function([], vals[-1], mode="JAX")
        assert float(np.asarray(f())) == 5.0

    def test_padded_requires_n_steps(self):
        with pytest.raises(Exception):
            out, _ = scan(lambda acc: (acc + 1.0, until(acc >= 5.0)),
                          outputs_info=[c64(0.0)], padded_while=True)

    def test_padded_stack_is_frozen_after_stop(self):
        """Post-stop slots hold the final value (pad semantics), so
        [-1] is always the converged state."""
        (vals, valid), _ = scan(
            lambda acc: (acc + 1.0, until(acc + 1.0 >= 3.0)),
            outputs_info=[c64(0.0)], n_steps=8, padded_while=True)
        f = function([], [vals, valid], mode="JAX")
        r, m = [np.asarray(v) for v in f()]
        assert r.shape[0] == 8
        assert float(r[-1]) == 3.0          # frozen at the converged value
        np.testing.assert_array_equal(m, [1, 1, 1, 0, 0, 0, 0, 0])


class TestWhileGrads:
    def test_grad_through_while_executed_steps(self):
        """Round-5 upgrade (reference test_grad_until contract): the
        reverse sweep covers the EXECUTED steps, read off the stacked
        output's length.  acc_t = x^t; with x=2, until x^t>100 fires
        entering the step after acc=64: 7 steps run, final = 2^7, so
        d(final)/dx = 7·2^6 — the trip count is treated as locally
        constant, exactly the reference's semantics."""
        x = at.scalar("x", dtype="float64")
        out, _ = scan(lambda acc: (acc * x, until(acc * x > 100.0)),
                      outputs_info=[c64(1.0)], n_steps=50)
        g = grad(out[-1], x)
        f = function([x], [out[-1], g], mode="PY")
        val, gv = f(np.float64(2.0))
        assert float(val) == 2.0 ** 7
        assert abs(float(gv) - 7 * 2.0 ** 6) < 1e-9

    def test_bounded_alternative_is_differentiable(self):
        """The sanctioned route: run the FIXED bound and select — grads
        flow (what padded_while enables structurally)."""
        x = at.scalar("x", dtype="float64")
        out, _ = scan(lambda acc: acc * x, outputs_info=[c64(1.0)],
                      n_steps=7)
        g = grad(out[-1], x)
        f = function([x], g, mode="PY")
        assert abs(float(f(np.float64(2.0))) - 7 * 2.0 ** 6) < 1e-9


class TestWhileEdges:
    def test_condition_true_at_first_step(self):
        out, _ = scan(lambda acc: (acc + 1.0, until(acc + 1.0 >= 0.5)),
                      outputs_info=[c64(0.0)], n_steps=16)
        f = function([], out, mode="PY")
        r = np.asarray(f())
        assert r.shape == (1,) and float(r[0]) == 1.0

    def test_bound_reached_before_condition(self):
        out, _ = scan(lambda acc: (acc + 1.0, until(acc > 1000.0)),
                      outputs_info=[c64(0.0)], n_steps=4)
        f = function([], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f()), [1.0, 2.0, 3.0, 4.0])

    def test_shared_update_stops_with_loop(self):
        s = atp.shared(np.float64(0.0), name="s")

        def body(acc):
            return acc + 1.0, {s: s + 10.0}, until(acc + 1.0 >= 2.0)

        out, updates = scan(body, outputs_info=[c64(0.0)], n_steps=16)
        f = function([], out, updates=updates, mode="PY")
        f()
        assert float(s.get_value()) == 20.0  # two executed steps only

    def test_while_inside_grad_graph(self):
        """A while-scan used to compute a quantity that then feeds an
        outer differentiable expression."""
        x = at.scalar("x", dtype="float64")
        out, _ = scan(lambda acc: (acc * 0.5, until(acc * 0.5 < 0.1)),
                      outputs_info=[x], n_steps=64)
        final = out[-1]
        y = final * final
        f = function([x], y, mode="PY")
        v = float(f(np.float64(1.0)))
        assert abs(v - 0.0625 ** 2) < 1e-12
