"""Round-2 math rewrites (reference ``tensor/rewriting/math.py``):
erfc stabilizations via erfcx, sigmoid·exp merging, functional-inverse
elimination, reduction restructuring, abs lifting.

Every case checks topology AND values against a float64 oracle.
"""

import numpy as np
import pytest
import scipy.special as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise

M = atp.compile.mode.Mode("py", "fast_run")
rng = np.random.default_rng(11)


def _scalar_ops(f):
    """Scalar-op class names, looking through fused Composites."""
    names = []
    for n in f.maker.fgraph.toposort():
        if not isinstance(n.op, Elemwise):
            continue
        s = n.op.scalar_op
        inner = getattr(s, "fgraph", None)
        if inner is not None:  # Composite: collect its inner ops
            names.extend(
                type(inode.op).__name__ for inode in inner.apply_nodes
            )
        else:
            names.append(type(s).__name__)
    return names


class TestErfcStabilize:
    def test_log_erfc_finite_and_accurate(self):
        x = at.vector("x", dtype="float64")
        f = atp.function([x], tm.log(tm.erfc(x)), mode=M)
        xv = np.array([-8, -2, 0, 1, 5, 10, 25], dtype="float32")
        got = f(xv)
        expect = np.log(sp.erfc(xv.astype("float64")))
        assert np.all(np.isfinite(got))
        assert np.allclose(got, expect, rtol=1e-4)
        # naive f32 evaluation underflows erfc beyond ~x=10: prove the
        # rewrite is what keeps it finite
        assert np.isneginf(np.log(sp.erfc(np.float32(25.0)).astype("float32")))

    def test_log_erfc_topology(self):
        x = at.vector("x", dtype="float64")
        f = atp.function([x], tm.log(tm.erfc(x)), mode=M)
        ops = _scalar_ops(f)
        assert "Erfcx" in ops and "Switch" in ops

    def test_grad_log_erfc_finite(self):
        x = at.vector("x", dtype="float64")
        g = atp.grad(tm.log(tm.erfc(x)).sum(), x)
        f = atp.function([x], g, mode=M)
        xv = np.array([-3, 0, 5, 10, 20], dtype="float32")
        gv = f(xv)
        x64 = xv.astype("float64")
        expect = -2 / np.sqrt(np.pi) * np.exp(-(x64**2)) / sp.erfc(x64)
        assert np.all(np.isfinite(gv))
        assert np.allclose(gv, expect, rtol=1e-3)

    def test_exp_neg_sqr_over_erfc_direct(self):
        x = at.vector("x", dtype="float64")
        expr = tm.exp(-(x**2)) / tm.erfc(x)
        f = atp.function([x], expr, mode=M)
        ops = _scalar_ops(f)
        assert "Erfcx" in ops
        xv = np.array([0.0, 1.0, 12.0], dtype="float32")
        got = f(xv)
        assert np.all(np.isfinite(got))
        assert np.allclose(got, 1 / sp.erfcx(xv.astype("float64")), rtol=1e-4)


class TestSigmoidExp:
    def test_sigm_times_exp(self):
        x = at.vector("x", dtype="float64")
        f = atp.function([x], tm.sigmoid(x) * tm.exp(-x), mode=M)
        xv = np.linspace(-4, 4, 9).astype("float32")
        assert np.allclose(f(xv), sp.expit(-xv), rtol=1e-5)
        assert "Exp" not in _scalar_ops(f)

    def test_sigm_times_exp_with_extra_factor(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        f = atp.function([x, y], y * tm.sigmoid(x) * tm.exp(-x), mode=M)
        xv = np.linspace(-2, 2, 5).astype("float32")
        yv = rng.standard_normal(5).astype("float32")
        assert np.allclose(f(xv, yv), yv * sp.expit(-xv), rtol=1e-5)


class TestFuncInv:
    @pytest.mark.parametrize(
        "build",
        [
            lambda v: tm.rad2deg(tm.deg2rad(v)),
            lambda v: tm.deg2rad(tm.rad2deg(v)),
            lambda v: tm.tanh(tm.arctanh(v)),
            lambda v: tm.arctanh(tm.tanh(v)),
            lambda v: tm.sinh(tm.arcsinh(v)),
            lambda v: -(-v),
            lambda v: tm.reciprocal(tm.reciprocal(v)),
        ],
    )
    def test_pairs_eliminated(self, build):
        x = at.vector("x", dtype="float64")
        f = atp.function([x], build(x), mode=M)
        assert all(
            type(n.op).__name__ == "DeepCopyOp"
            for n in f.maker.fgraph.apply_nodes
        )
        xv = np.linspace(0.1, 0.9, 5).astype("float32")
        assert np.allclose(f(xv), xv, rtol=1e-6)

    def test_non_pair_kept(self):
        x = at.vector("x", dtype="float64")
        f = atp.function([x], tm.cosh(tm.arcsinh(x)), mode=M)
        xv = np.linspace(-1, 1, 5).astype("float32")
        assert np.allclose(f(xv), np.cosh(np.arcsinh(xv)), rtol=1e-5)


class TestReductionRestructure:
    def test_sum_div_dimshuffle(self):
        m = at.matrix("m", dtype="float64")
        y = at.vector("y", dtype="float64")
        expr = (m / y.dimshuffle(0, "x")).sum(axis=1)
        f = atp.function([m, y], expr, mode=M)
        order = f.maker.fgraph.toposort()
        kinds = [type(n.op).__name__ for n in order]
        assert kinds.index("Sum") < kinds.index("Elemwise")
        mv = rng.random((3, 4)).astype("float32")
        yv = (rng.random(3) + 0.5).astype("float32")
        assert np.allclose(f(mv, yv), (mv / yv[:, None]).sum(1), rtol=1e-5)

    def test_sum_div_dimshuffle_declines_nonbroadcast(self):
        m = at.matrix("m", dtype="float64")
        y = at.matrix("y", dtype="float64")
        expr = (m / y).sum(axis=1)  # denominator varies along the axis
        f = atp.function([m, y], expr, mode=M)
        mv = rng.random((3, 4)).astype("float32")
        yv = (rng.random((3, 4)) + 0.5).astype("float32")
        assert np.allclose(f(mv, yv), (mv / yv).sum(1), rtol=1e-5)

    def test_reduce_join_sum(self):
        a, b, c = at.vector("a", dtype="float64"), at.vector("b", dtype="float64"), at.vector("c", dtype="float64")
        expr = at.join(
            0, a.dimshuffle("x", 0), b.dimshuffle("x", 0), c.dimshuffle("x", 0)
        ).sum(axis=0)
        f = atp.function([a, b, c], expr, mode=M)
        kinds = [type(n.op).__name__ for n in f.maker.fgraph.toposort()]
        assert "Join" not in kinds and "Sum" not in kinds
        vs = [rng.random(4).astype("float32") for _ in range(3)]
        assert np.allclose(f(*vs), vs[0] + vs[1] + vs[2], rtol=1e-6)

    def test_reduce_join_max(self):
        a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
        expr = tm.max(at.join(0, a.dimshuffle("x", 0), b.dimshuffle("x", 0)),
                      axis=0)
        f = atp.function([a, b], expr, mode=M)
        kinds = [type(n.op).__name__ for n in f.maker.fgraph.toposort()]
        assert "Join" not in kinds
        av, bv = rng.random(4).astype("float32"), rng.random(4).astype("float32")
        assert np.allclose(f(av, bv), np.maximum(av, bv))

    def test_reduce_all_axes_to_none(self):
        m = at.matrix("m", dtype="float64")
        f = atp.function([m], m.sum(axis=(0, 1)), mode="PY")
        sums = [n.op for n in f.maker.fgraph.toposort()
                if type(n.op).__name__ == "Sum"]
        assert sums and sums[0].axis is None
        mv = rng.random((3, 4)).astype("float32")
        assert np.allclose(f(mv), mv.sum())


class TestAbsLift:
    def test_abs_mul(self):
        x, y = at.vector("x", dtype="float64"), at.vector("y", dtype="float64")
        f = atp.function([x, y], tm.abs(x * y), mode=M)
        xv = rng.standard_normal(6).astype("float32")
        yv = rng.standard_normal(6).astype("float32")
        assert np.allclose(f(xv, yv), np.abs(xv * yv), rtol=1e-6)

    def test_abs_div_values(self):
        x, y = at.vector("x", dtype="float64"), at.vector("y", dtype="float64")
        f = atp.function([x, y], tm.abs(x / y), mode=M)
        xv = rng.standard_normal(6).astype("float32")
        yv = (rng.random(6) + 0.5).astype("float32") * np.sign(
            rng.standard_normal(6)
        ).astype("float32")
        assert np.allclose(f(xv, yv), np.abs(xv / yv), rtol=1e-5)
