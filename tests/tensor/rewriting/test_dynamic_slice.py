"""Affine symbolic slice → DynamicSlice/DynamicIncSubtensor specs.

The reference executes ``data[index*B:(index+1)*B]`` (tutorial
``logistic_sgd.py`` minibatch idiom) with per-node C thunks at any offset;
under XLA a traced slice bound cannot compile, so this stack instead
proves the window length constant and lowers to ``lax.dynamic_slice``
(`tensor/rewriting/subtensor.py::local_affine_slice_to_dynamic`).
Reference counterpart for the op semantics: ``aesara/tensor/subtensor.py``
Subtensor over symbolic scalars.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.tensor.subtensor import DynamicIncSubtensor, DynamicSlice
from tests.rewrite_corpus import op_labels, py_mode, rewrite_only

SPEC = ("canonicalize", "stabilize", "specialize")
rng = np.random.default_rng(7)


def _spec(out):
    return rewrite_only(out, include=SPEC)


class TestAffineSliceRecognition:
    def test_minibatch_idiom(self):
        x = at.matrix("x", dtype="float64")
        i = at.iscalar("i")
        res = _spec(x[i * 4 : (i + 1) * 4])
        assert "DynamicSlice" in op_labels(res)
        assert "Subtensor" not in op_labels(res)

    def test_start_plus_const(self):
        x = at.vector("x", dtype="float64")
        s = at.lscalar("s")
        res = _spec(x[s : s + 7])
        assert "DynamicSlice" in op_labels(res)

    def test_shifted_window(self):
        x = at.vector("x", dtype="float64")
        s = at.lscalar("s")
        res = _spec(x[s + 2 : s + 9])
        assert "DynamicSlice" in op_labels(res)

    def test_two_axis_window(self):
        x = at.tensor3("x", dtype="float64")
        i, j = at.iscalar("i"), at.iscalar("j")
        res = _spec(x[i : i + 2, j * 3 : (j + 1) * 3])
        lbls = op_labels(res)
        assert "DynamicSlice" in lbls

    def test_full_leading_axis_then_window(self):
        x = at.matrix("x", dtype="float64")
        j = at.iscalar("j")
        res = _spec(x[:, j : j + 5])
        assert "DynamicSlice" in op_labels(res)

    def test_non_constant_window_stays(self):
        x = at.vector("x", dtype="float64")
        s, t = at.lscalar("s"), at.lscalar("t")
        res = _spec(x[s:t])
        assert "DynamicSlice" not in op_labels(res)
        assert "Subtensor" in op_labels(res)

    def test_negative_window_stays(self):
        x = at.vector("x", dtype="float64")
        s = at.lscalar("s")
        res = _spec(x[s : s - 3])
        assert "DynamicSlice" not in op_labels(res)

    def test_strided_stays(self):
        x = at.vector("x", dtype="float64")
        s = at.lscalar("s")
        res = _spec(x[s : s + 6 : 2])
        assert "DynamicSlice" not in op_labels(res)

    def test_window_larger_than_static_dim_stays(self):
        x = at.matrix("x", dtype="float64")
        i = at.iscalar("i")
        xk = at.specify_shape(x, (3, 4))
        res = _spec(xk[i : i + 8])
        assert "DynamicSlice" not in op_labels(res)

    def test_static_slices_untouched(self):
        x = at.matrix("x", dtype="float64")
        res = _spec(x[1:3])
        assert "DynamicSlice" not in op_labels(res)

    def test_inc_subtensor_dual(self):
        x = at.matrix("x", dtype="float64")
        v = at.matrix("v", dtype="float64")
        i = at.iscalar("i")
        res = _spec(at.set_subtensor(x[i * 2 : (i + 1) * 2], v))
        assert "DynamicIncSubtensor" in op_labels(res)

    def test_inc_subtensor_add_dual(self):
        x = at.vector("x", dtype="float64")
        v = at.vector("v", dtype="float64")
        s = at.lscalar("s")
        res = _spec(at.inc_subtensor(x[s : s + 3], v))
        assert "DynamicIncSubtensor" in op_labels(res)


class TestDynamicSliceValues:
    @pytest.mark.parametrize("i", [0, 1, 4])
    def test_xla_matches_numpy_in_range(self, i):
        Xd = atp.shared(
            rng.normal(size=(10, 4)).astype("float32"), name="Xd"
        )
        idx = at.iscalar("idx")
        B = 2
        f = atp.function([idx], Xd[idx * B : (idx + 1) * B], mode="FAST_RUN")
        np.testing.assert_allclose(
            np.asarray(f(i)),
            np.asarray(Xd.get_value())[i * B : (i + 1) * B],
            rtol=1e-6,
        )

    def test_grad_through_window(self):
        Xd = atp.shared(
            np.arange(40, dtype="float32").reshape(10, 4), name="Xd"
        )
        w = atp.shared(np.ones((4,), "float32"), name="w")
        i = at.iscalar("i")
        loss = at.sum(Xd[i * 2 : (i + 1) * 2] @ w)
        g = atp.grad(loss, w)
        f = atp.function([i], g, mode="FAST_RUN")
        np.testing.assert_allclose(
            np.asarray(f(1)),
            np.arange(40).reshape(10, 4)[2:4].sum(axis=0),
        )

    def test_grad_wrt_base(self):
        x = at.vector("x", dtype="float64")
        s = at.lscalar("s")
        out = at.sum(at.sqr(x[s : s + 3]))
        g = atp.grad(out, x)
        f = atp.function([x, s], g, mode="FAST_RUN")
        xv = np.arange(6, dtype="float32")
        got = np.asarray(f(xv, 2))
        want = np.zeros(6, "float32")
        want[2:5] = 2 * xv[2:5]
        np.testing.assert_allclose(got, want)

    def test_update_loop_one_program(self):
        """The minibatch SGD loop: one compiled program, many offsets."""
        Xd = atp.shared(
            rng.normal(size=(20, 3)).astype("float32"), name="Xd"
        )
        w = atp.shared(np.zeros((3,), "float32"), name="w")
        i = at.iscalar("i")
        B = 5
        xb = Xd[i * B : (i + 1) * B]
        loss = at.sum(at.sqr(xb @ w - 1.0))
        g = atp.grad(loss, w)
        f = atp.function([i], loss, updates={w: w - 0.01 * g}, mode="FAST_RUN")
        losses = [float(np.asarray(f(k % 4))) for k in range(12)]
        assert losses[-1] < losses[0]

    def test_set_window_roundtrip(self):
        Xd = atp.shared(np.zeros((8, 2), "float32"), name="Xd")
        v = at.matrix("v", dtype="float64")
        i = at.iscalar("i")
        upd = at.set_subtensor(Xd[i * 2 : (i + 1) * 2], v)
        f = atp.function([i, v], [], updates={Xd: upd}, mode="FAST_RUN")
        f(1, np.ones((2, 2), "float32"))
        got = np.asarray(Xd.get_value())
        assert (got[2:4] == 1).all() and (got[:2] == 0).all() and (got[4:] == 0).all()

    def test_inc_window_accumulates(self):
        x = at.vector("x", dtype="float64")
        v = at.vector("v", dtype="float64")
        s = at.lscalar("s")
        out = at.inc_subtensor(x[s : s + 2], v)
        f = atp.function([x, v, s], out, mode="FAST_RUN")
        got = np.asarray(f(np.ones(5, "float32"), np.full(2, 3.0, "float32"), 1))
        np.testing.assert_allclose(got, [1, 4, 4, 1, 1])

    def test_py_oracle_matches_xla_clamping(self):
        """Documented lax clamp semantics hold on BOTH backends."""
        op = DynamicSlice((3,))
        x = at.vector("x", dtype="float64")
        s = at.lscalar("s")
        out = op(x, s)
        f_py = atp.function([x, s], out, mode="PY")
        f_xla = atp.function([x, s], out, mode="FAST_RUN")
        xv = np.arange(6, dtype="float32")
        for start in (-2, 0, 2, 4, 10):
            np.testing.assert_allclose(
                np.asarray(f_py(xv, start)), np.asarray(f_xla(xv, start))
            )

    def test_dynamic_inc_py_oracle_matches_xla(self):
        op = DynamicIncSubtensor((2,))
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        s = at.lscalar("s")
        out = op(x, y, s)
        f_py = atp.function([x, y, s], out, mode="PY")
        f_xla = atp.function([x, y, s], out, mode="FAST_RUN")
        xv = np.zeros(5, "float32")
        yv = np.ones(2, "float32")
        for start in (-1, 0, 3, 4, 9):
            np.testing.assert_allclose(
                np.asarray(f_py(xv, yv, start)), np.asarray(f_xla(xv, yv, start))
            )

    def test_verify_grad_dynamic_slice(self):
        from aesara_tpu.gradient import verify_grad

        op = DynamicSlice((2,))
        verify_grad(
            lambda x: op(x, np.int64(1)),
            [rng.normal(size=(5,)).astype("float64")],
            rng=np.random.default_rng(0),
            mode="PY",
        )

    def test_verify_grad_dynamic_inc(self):
        from aesara_tpu.gradient import verify_grad

        op = DynamicIncSubtensor((2,))
        verify_grad(
            lambda x, y: op(x, y, np.int64(2)),
            [
                rng.normal(size=(5,)).astype("float64"),
                rng.normal(size=(2,)).astype("float64"),
            ],
            rng=np.random.default_rng(0),
            mode="PY",
        )
