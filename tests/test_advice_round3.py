"""Regression tests for the round-2 advisor findings (ADVICE.md r2):

1. (high)   Elemwise.R_op over-counted broadcast inputs' tangents.
2. (medium) Gemm/Gemv fusion accepted a statically-broadcasting z,
            giving the fused node false static-shape metadata.
3. (low)    local_join_empty crashed the canonicalize pass when every
            join operand was statically empty.
4. (low)    load_checkpoint restored every ml_dtypes shared as bf16.
5. (low)    local_sumsqr2dot dropped a requested upcast accumulation.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import Rop

rng = np.random.default_rng(3)


class TestElemwiseRopBroadcast:
    """ADVICE r2 #1: the JVP must use partials at the OUTPUT shape,
    not L_op's broadcast-summed partials."""

    def test_add_broadcast_tangent_not_scaled(self):
        x = at.tensor("x", dtype="float64", shape=(1, 3))
        y = at.tensor("y", dtype="float64", shape=(4, 3))
        r = Rop(x + y, [x], [at.ones_like(x)], use_op_rop=True)
        f = function([x, y], r)
        out = np.asarray(f(np.zeros((1, 3)), np.zeros((4, 3))))
        # d(x+y)/dt with dx/dt = 1 is exactly 1 — the bug returned 4.0
        np.testing.assert_allclose(out, np.ones((4, 3)))

    def test_mul_broadcast_matches_double_backward(self):
        x = at.tensor("x", dtype="float64", shape=(1, 3))
        y = at.tensor("y", dtype="float64", shape=(4, 3))
        vx = at.tensor("vx", dtype="float64", shape=(1, 3))
        z = (x * y + at.tanh(x)).sum()
        r1 = Rop(z, [x], [vx])
        r2 = Rop(z, [x], [vx], use_op_rop=True)
        f = function([x, y, vx], [r1, r2])
        a, b = f(rng.normal(size=(1, 3)), rng.normal(size=(4, 3)),
                 rng.normal(size=(1, 3)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10)

    def test_dimshuffled_bias_pattern(self):
        # the common model pattern: bias row broadcast over the batch
        w = at.matrix("w", dtype="float64")
        b = at.vector("b", dtype="float64")
        vb = at.vector("vb", dtype="float64")
        out = at.tanh(w + b.dimshuffle("x", 0)).sum()
        r1 = Rop(out, [b], [vb])
        r2 = Rop(out, [b], [vb], use_op_rop=True)
        f = function([w, b, vb], [r1, r2])
        a, bb = f(rng.normal(size=(5, 3)), rng.normal(size=3),
                  rng.normal(size=3))
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-10)


class TestGemmFusionBroadcastZ:
    """ADVICE r2 #2: fusion must not absorb a z that broadcasts against
    the dot — Gemm types its output from z's static shape."""

    def _fused(self, f):
        from aesara_tpu.tensor.blas import Gemm, Gemv

        return [n for n in f.fgraph.apply_nodes
                if isinstance(n.op, (Gemm, Gemv))]

    def test_broadcasting_z_not_fused_and_correct(self):
        z = at.tensor("z", dtype="float64", shape=(1, 3))
        x = at.tensor("x", dtype="float64", shape=(4, 5))
        y = at.tensor("y", dtype="float64", shape=(5, 3))
        out = z + at.dot(x, y)
        f = function([z, x, y], out, mode="FAST_RUN")
        assert f.fgraph.outputs[0].type.shape == (4, 3)
        for n in self._fused(f):
            assert n.outputs[0].type.shape == (4, 3)
        Zv, Xv, Yv = (rng.normal(size=(1, 3)), rng.normal(size=(4, 5)),
                      rng.normal(size=(5, 3)))
        np.testing.assert_allclose(
            np.asarray(f(Zv, Xv, Yv)), Zv + Xv @ Yv, rtol=1e-12)

    def test_matching_z_still_fuses(self):
        z = at.tensor("z", dtype="float64", shape=(4, 3))
        x = at.tensor("x", dtype="float64", shape=(4, 5))
        y = at.tensor("y", dtype="float64", shape=(5, 3))
        f = function([z, x, y], z + at.dot(x, y), mode="FAST_RUN")
        assert self._fused(f), "non-broadcasting z should still fuse"

    def test_gemv_broadcast_guard(self):
        # vector case: a z typed (1,) against a longer dot result
        z = at.tensor("z", dtype="float64", shape=(1,))
        A = at.tensor("A", dtype="float64", shape=(4, 5))
        x = at.tensor("x", dtype="float64", shape=(5,))
        f = function([z, A, x], z + at.dot(A, x), mode="FAST_RUN")
        assert f.fgraph.outputs[0].type.shape == (4,)
        Zv, Av, Xv = rng.normal(size=1), rng.normal(size=(4, 5)), rng.normal(size=5)
        np.testing.assert_allclose(
            np.asarray(f(Zv, Av, Xv)), Zv + Av @ Xv, rtol=1e-12)


class TestJoinAllEmpty:
    """ADVICE r2 #3: a join whose operands are ALL statically empty must
    still canonicalize (previously join() raised and aborted the pass)."""

    def test_all_empty_join_compiles(self):
        e1 = at.tensor("e1", dtype="float64", shape=(0, 2))
        e2 = at.tensor("e2", dtype="float64", shape=(0, 2))
        out = at.concatenate([e1, e2], axis=0) + 1.0
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # the bug surfaced as a warning
            f = function([e1, e2], out, mode="FAST_RUN")
        res = np.asarray(f(np.zeros((0, 2)), np.zeros((0, 2))))
        assert res.shape == (0, 2)


class TestCheckpointMlDtypes:
    """ADVICE r2 #4: ml_dtypes shareds restore to their DECLARED dtype."""

    def test_bfloat16_roundtrip_resolves_declared_dtype(self, tmp_path):
        # float8 is not a TensorType dtype yet; the fix makes restore
        # resolve the DECLARED sv.type.dtype via ml_dtypes, so any
        # future ml_dtypes storage dtype round-trips too
        import ml_dtypes

        from aesara_tpu.compile.sharedvalue import shared
        from aesara_tpu.models.checkpoint import load_checkpoint, save_checkpoint

        vbf = shared(np.arange(4).astype(ml_dtypes.bfloat16), name="wbf")
        p = tmp_path / "ck.npz"
        save_checkpoint(str(p), [vbf])
        vbf.set_value(np.zeros(4, dtype=ml_dtypes.bfloat16))
        load_checkpoint(str(p), [vbf])
        got = np.asarray(vbf.get_value())
        assert got.dtype == np.dtype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(
            got.astype("float32"), np.arange(4, dtype="float32"))


class TestSumsqr2dotPrecisionGuard:
    """ADVICE r2 #5: skip the dot rewrite when the Sum upcasts."""

    def _has_dot(self, res):
        from aesara_tpu.graph.rewriting.utils import rewrite_graph
        from aesara_tpu.tensor.math import Dot

        out = rewrite_graph(res, include=["canonicalize", "specialize"])

        def walk(v, acc):
            if v.owner is None:
                return
            acc.append(v.owner.op)
            for i in v.owner.inputs:
                walk(i, acc)

        acc = []
        walk(out, acc)
        return any(isinstance(op, Dot) for op in acc), out

    def test_upcast_sum_not_rewritten(self):
        x = at.vector("x", dtype="float32")
        s = at.sum(x ** 2, acc_dtype="float64", dtype="float64")
        has_dot, out = self._has_dot(s)
        assert not has_dot, "f64 accumulation must not become an f32 dot"

    def test_same_dtype_sum_still_rewritten(self):
        x = at.vector("x", dtype="float32")
        s = at.sum(x ** 2)
        has_dot, _ = self._has_dot(s)
        assert has_dot, "plain sum(sqr(x)) should still ride the MXU"
