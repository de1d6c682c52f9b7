"""R-operator sweep (VERDICT r4 item 4; reference ``tests/test_rop.py``,
390 LoC): Rop over an op zoo, each case checked two ways —

1. directional finite differences: Rop(f, x, v) ≈ (f(x+εv) − f(x−εv)) / 2ε
2. agreement between the two Rop implementations: the double-backward
   default (``use_op_rop=False``) and the forward-mode op rule
   (``use_op_rop=True``) where the op provides one.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
import aesara_tpu.tensor.nlinalg as nl
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import Rop

rng = np.random.default_rng(3434)


def check_rop(build, shapes, use_op_rop_both=True, rtol=1e-4, seed=0):
    """``build(*xs) -> output`` (any shape); checks Rop wrt EVERY input."""
    r = np.random.default_rng(seed)
    xs = [at.TensorType("float64", (None,) * len(s))(f"x{i}")
          for i, s in enumerate(shapes)]
    vals = [r.normal(size=s) * 0.5 for s in shapes]
    out = build(*xs)
    f0 = function(xs, out, mode="FAST_RUN", on_unused_input="ignore")
    for i, (x, xv) in enumerate(zip(xs, vals)):
        v = at.TensorType("float64", (None,) * xv.ndim)("v")
        vv = r.normal(size=xv.shape)
        impls = [False, True] if use_op_rop_both else [False]
        results = []
        for use_op in impls:
            rop = Rop(out, x, v, use_op_rop=use_op)
            fr = function(xs + [v], rop, mode="FAST_RUN",
                          on_unused_input="ignore")
            results.append(np.asarray(fr(*vals, vv)))
        eps = 1e-6
        vp = list(vals); vm = list(vals)
        vp[i] = xv + eps * vv
        vm[i] = xv - eps * vv
        fd = (np.asarray(f0(*vp)) - np.asarray(f0(*vm))) / (2 * eps)
        for res, use_op in zip(results, impls):
            np.testing.assert_allclose(
                res, fd, rtol=rtol, atol=1e-6,
                err_msg=f"Rop(use_op_rop={use_op}) wrt input {i}")
        if len(results) == 2:
            np.testing.assert_allclose(results[0], results[1], rtol=1e-8,
                                       err_msg="double-backward vs op rule")


class TestElemwiseRop:
    def test_tanh_chain(self):
        check_rop(lambda x: tm.tanh(x * 2.0) + tm.exp(x * 0.1), [(3, 4)])

    def test_sigmoid_mul(self):
        check_rop(lambda x, y: tm.sigmoid(x) * y, [(4,), (4,)])

    def test_broadcasted_operands(self):
        check_rop(
            lambda x, y: x.dimshuffle(0, "x") * y.dimshuffle("x", 0),
            [(3,), (5,)])

    def test_second_order_composition(self):
        check_rop(lambda x: tm.log(1.0 + tm.sqr(x)), [(6,)])


class TestReductionRop:
    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_sum(self, axis):
        check_rop(lambda x: x.sum(axis=axis), [(3, 4)])

    def test_mean(self):
        check_rop(lambda x: x.mean(axis=1), [(3, 4)])

    def test_prod_default_path_only(self):
        # Prod has no op-level forward rule (same as the reference);
        # the double-backward default must still be exact
        check_rop(lambda x: (x + 3.0).prod(axis=0), [(2, 3)],
                  use_op_rop_both=False)

    def test_max_smooth_point_default_path_only(self):
        # max is differentiable away from ties; no op-level forward rule
        check_rop(lambda x: x.max(axis=1), [(3, 5)],
                  use_op_rop_both=False)

    def test_prod_max_op_rop_raise_informatively(self):
        x = at.matrix("x", dtype="float64")
        v_ = at.matrix("v", dtype="float64")
        with pytest.raises(NotImplementedError):
            Rop(x.prod(axis=0), x, v_, use_op_rop=True)


class TestLinalgRop:
    def test_dot_mm(self):
        check_rop(lambda a, b: tm.dot(a, b), [(3, 4), (4, 5)])

    def test_dot_chain_cost(self):
        check_rop(lambda a, b: tm.sum(tm.dot(a, b) ** 2),
                  [(3, 4), (4, 2)])

    def test_matrix_inverse(self):
        check_rop(
            lambda a: nl.matrix_inverse(a + 4.0 * at.eye(3)), [(3, 3)],
            rtol=1e-3)

    def test_det(self):
        check_rop(lambda a: nl.det(a + 4.0 * at.eye(3)), [(3, 3)],
                  rtol=1e-3)

    def test_batched_dot(self):
        check_rop(lambda a, b: tm.batched_dot(a, b),
                  [(2, 3, 4), (2, 4, 2)])


class TestStructuralRop:
    def test_subtensor(self):
        check_rop(lambda x: x[1:, :2] * 3.0, [(4, 5)])

    def test_inc_subtensor(self):
        check_rop(
            lambda x, y: at.inc_subtensor(x[1:3], y), [(5, 2), (2, 2)])

    def test_join(self):
        check_rop(lambda a, b: at.concatenate([a, b], axis=0).sum(axis=1),
                  [(2, 3), (4, 3)])

    def test_reshape_dimshuffle(self):
        check_rop(lambda x: x.reshape((6,)).dimshuffle("x", 0), [(2, 3)])

    def test_alloc(self):
        check_rop(lambda x: at.alloc(x, 4, 3) * 2.0, [(3,)])

    def test_set_subtensor_constant(self):
        check_rop(lambda x: at.set_subtensor(x[0], 0.0), [(4, 3)])


class TestScanRop:
    def test_rnn_final_state(self):
        def build(W):
            h0 = at.as_tensor_variable(np.array([0.1, -0.2, 0.3]))
            from aesara_tpu.scan.basic import scan

            outs, _ = scan(lambda h, WW: tm.tanh(tm.dot(WW, h)),
                           outputs_info=[h0], non_sequences=[W], n_steps=3)
            return outs[-1]

        check_rop(build, [(3, 3)], use_op_rop_both=True, rtol=1e-3)

    def test_cumulative_over_sequence(self):
        def build(v):
            from aesara_tpu.scan.basic import scan

            outs, _ = scan(lambda x_t, acc: acc + tm.sqr(x_t),
                           sequences=[v],
                           outputs_info=[at.constant(np.float64(0.0))])
            return outs

        check_rop(build, [(5,)], use_op_rop_both=True, rtol=1e-4)


class TestRopPolicies:
    def test_disconnected_output_raise(self):
        x = at.vector("x", dtype="float64")
        c = at.constant(np.ones(3))
        v = at.vector("v", dtype="float64")
        with pytest.raises((ValueError, Exception)):
            r = Rop(c * 1.0, x, v, disconnected_outputs="raise")
            if r is None:
                raise ValueError("disconnected")

    def test_disconnected_output_ignore_gives_none_or_zero(self):
        x = at.vector("x", dtype="float64")
        v = at.vector("v", dtype="float64")
        out = at.as_tensor_variable(np.ones(3)) * 2.0
        r = Rop(out, x, v, disconnected_outputs="ignore")
        if r is not None:
            f = function([x, v], r, mode="FAST_RUN",
                         on_unused_input="ignore")
            np.testing.assert_allclose(
                np.asarray(f(np.ones(3), np.ones(3))), 0.0)

    def test_linearity_in_tangent(self):
        x = at.vector("x", dtype="float64")
        v = at.vector("v", dtype="float64")
        out = tm.tanh(x).sum()
        r = Rop(out, x, v)
        f = function([x, v], r, mode="FAST_RUN")
        xv = rng.normal(size=4)
        vv = rng.normal(size=4)
        a = float(np.asarray(f(xv, vv)))
        b = float(np.asarray(f(xv, 2.0 * vv)))
        assert np.isclose(b, 2.0 * a)

    def test_multiple_outputs_list(self):
        x = at.vector("x", dtype="float64")
        v = at.vector("v", dtype="float64")
        outs = [tm.tanh(x), tm.sqr(x).sum()]
        rops = Rop(outs, x, v)
        f = function([x, v], list(rops), mode="FAST_RUN")
        xv, vv = rng.normal(size=3), rng.normal(size=3)
        r1, r2 = f(xv, vv)
        np.testing.assert_allclose(np.asarray(r1),
                                   (1 - np.tanh(xv) ** 2) * vv, rtol=1e-8)
        assert np.isclose(float(np.asarray(r2)), float(2 * xv @ vv))
