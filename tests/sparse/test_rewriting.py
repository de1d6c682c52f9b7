"""Sparse rewrite pack: topology + values-unchanged tests (reference
``tests/sparse/test_rewriting.py`` coverage of the user-visible cases)."""

import numpy as np
import pytest
import scipy.sparse as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.graph.ir import applys_between, equal_computations
from aesara_tpu.graph.rewriting.utils import rewrite_graph
from aesara_tpu.sparse import basic as sb
from aesara_tpu.sparse.basic import (
    CSM,
    DenseFromSparse,
    Dot,
    SparseFromDense,
    StructuredDot,
    Usmm,
    csm_properties,
)

rng = np.random.default_rng(41)


def rand_csr(m, n, density=0.3, dtype="float64"):
    return sp.random(m, n, density=density, format="csr",
                     random_state=7).astype(dtype)


def ops_in(out, *roots):
    return [n.op for n in applys_between(list(roots), [out])]


def test_dense_sparse_roundtrips():
    x = at.matrix("x", dtype="float64")
    res = rewrite_graph(sb.dense_from_sparse(SparseFromDense("csr")(x)))
    assert equal_computations([res], [x])

    s = sb.csr_matrix("s", dtype="float64")
    res = rewrite_graph(SparseFromDense("csr")(sb.dense_from_sparse(s)))
    assert res is s or equal_computations([res], [s])
    # format mismatch must NOT fold
    res = rewrite_graph(SparseFromDense("csc")(sb.dense_from_sparse(s)))
    assert not (res is s)


def test_csm_properties_of_csm():
    d = at.vector("d", dtype="float64")
    i = at.vector("i", dtype="int32")
    p = at.vector("p", dtype="int32")
    shp = at.vector("shp", dtype="int32")
    m = CSM("csr")(d, i, p, shp)
    parts = csm_properties(m)
    res = rewrite_graph(parts[0])
    assert equal_computations([res], [d]) or res is d


def test_csm_of_csm_properties():
    s = sb.csr_matrix("s", dtype="float64")
    parts = csm_properties(s)
    rebuilt = CSM("csr")(*parts)
    res = rewrite_graph(rebuilt)
    assert res is s or equal_computations([res], [s])
    # different format must NOT fold
    rebuilt2 = CSM("csc")(*parts)
    res2 = rewrite_graph(rebuilt2)
    assert not (res2 is s)


def test_dot_to_structured_dot():
    s = sb.csr_matrix("s", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = Dot()(s, y)
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    assert any(isinstance(op, StructuredDot) for op in ops_in(res, s, y))
    assert not any(isinstance(op, Dot) for op in ops_in(res, s, y))
    sv = rand_csr(4, 3)
    yv = rng.normal(size=(3, 5))
    f_raw = function([s, y], out, mode="PY")
    f_new = function([s, y], res, mode="PY")
    np.testing.assert_allclose(f_raw(sv, yv), f_new(sv, yv))


def test_dense_dot_of_dense_from_sparse():
    s = sb.csr_matrix("s", dtype="float64")
    y = at.matrix("y", dtype="float64")
    out = at.dot(sb.dense_from_sparse(s), y)
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    ops = ops_in(res, s, y)
    assert any(isinstance(op, StructuredDot) for op in ops)
    assert not any(isinstance(op, DenseFromSparse) for op in ops)
    sv = rand_csr(4, 3)
    yv = rng.normal(size=(3, 5))
    f_raw = function([s, y], out, mode="PY")
    f_new = function([s, y], res, mode="PY")
    np.testing.assert_allclose(f_raw(sv, yv), f_new(sv, yv))


def test_usmm_fusion():
    s = sb.csr_matrix("s", dtype="float64")
    y = at.matrix("y", dtype="float64")
    z = at.matrix("z", dtype="float64")
    alpha = at.scalar("alpha", dtype="float64")
    out = z + alpha * Dot()(s, y)
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    assert any(isinstance(op, Usmm) for op in ops_in(res, s, y, z, alpha))
    sv = rand_csr(4, 3)
    yv = rng.normal(size=(3, 5))
    zv = rng.normal(size=(4, 5))
    f_raw = function([s, y, z, alpha], out, mode="PY")
    f_new = function([s, y, z, alpha], res, mode="PY")
    np.testing.assert_allclose(
        f_raw(sv, yv, zv, 2.5), f_new(sv, yv, zv, 2.5)
    )


def test_usmm_fusion_no_alpha():
    s = sb.csr_matrix("s", dtype="float64")
    y = at.matrix("y", dtype="float64")
    z = at.matrix("z", dtype="float64")
    out = z + Dot()(s, y)
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    assert any(isinstance(op, Usmm) for op in ops_in(res, s, y, z))
    sv = rand_csr(4, 3)
    yv = rng.normal(size=(3, 5))
    zv = rng.normal(size=(4, 5))
    f_raw = function([s, y, z], out, mode="PY")
    f_new = function([s, y, z], res, mode="PY")
    np.testing.assert_allclose(f_raw(sv, yv, zv), f_new(sv, yv, zv))


def test_neg_neg_and_transpose_transpose():
    s = sb.csr_matrix("s", dtype="float64")
    res = rewrite_graph(sb.neg(sb.neg(s)))
    assert res is s or equal_computations([res], [s])
    res = rewrite_graph(sb.transpose(sb.transpose(s)))
    assert res is s or equal_computations([res], [s])


def test_cast_cast_and_same_dtype():
    s = sb.csr_matrix("s", dtype="float64")
    res = rewrite_graph(sb.sp_cast(s, "float64"))
    assert res is s or equal_computations([res], [s])
    # narrowing intermediate must NOT merge (truncation is semantic)
    out = sb.sp_cast(sb.sp_cast(s, "float32"), "float64")
    res = rewrite_graph(out)
    casts = [op for op in ops_in(res, s) if isinstance(op, sb.Cast)]
    assert len(casts) == 2
    # widening intermediate merges to one cast
    s32 = sb.csr_matrix("s32", dtype="float32")
    out2 = sb.sp_cast(sb.sp_cast(s32, "float64"), "float32")
    res2 = rewrite_graph(out2)
    assert res2 is s32 or equal_computations([res2], [s32])
    sv = rand_csr(4, 3)
    f_raw = function([s], out, mode="PY")
    f_new = function([s], res, mode="PY")
    np.testing.assert_allclose(
        np.asarray(f_raw(sv).todense()), np.asarray(f_new(sv).todense())
    )


def test_ensure_sorted_indices_idempotent():
    s = sb.csr_matrix("s", dtype="float64")
    out = sb.EnsureSortedIndices()(sb.EnsureSortedIndices()(s))
    res = rewrite_graph(out)
    ensures = [op for op in ops_in(res, s)
               if isinstance(op, sb.EnsureSortedIndices)]
    assert len(ensures) == 1


def test_diag_of_square_diagonal():
    v = at.vector("v", dtype="float64")
    res = rewrite_graph(sb.diag(sb.square_diagonal(v)))
    assert equal_computations([res], [v]) or res is v


def test_dense_from_sparse_of_square_diagonal():
    v = at.vector("v", dtype="float64")
    out = sb.dense_from_sparse(sb.square_diagonal(v))
    res = rewrite_graph(out, include=["canonicalize", "specialize"])
    assert not any(
        isinstance(op, (sb.SquareDiagonal, DenseFromSparse))
        for op in ops_in(res, v)
    )
    vv = rng.normal(size=4)
    f_raw = function([v], out, mode="PY")
    f_new = function([v], res, mode="PY")
    np.testing.assert_allclose(f_raw(vv), f_new(vv))


def test_fast_run_pipeline_with_sparse_graph():
    """End-to-end: a sparse regression graph compiles and trains under
    the full pipeline with the pack registered."""
    sv = rand_csr(20, 6)
    s = sb.sparse_shared(sv, name="S")
    w = atp.shared(np.zeros(6), name="w")
    y = at.vector("y", dtype="float64")
    pred = sb.structured_dot(s, w.dimshuffle(0, "x")).flatten()
    loss = ((pred - y) ** 2).mean()
    g = atp.grad(loss, w)
    f = atp.function([y], loss, updates={w: w - 0.1 * g}, mode="PY")
    yv = rng.normal(size=20)
    l0 = float(np.asarray(f(yv)))
    l1 = float(np.asarray(f(yv)))
    assert l1 < l0


# ---------------------------------------------------------------------------
# dense-graph elemwise entry points (round-2 additions)
# ---------------------------------------------------------------------------

def _sparse_in(name="s", fmt="csr", dtype="float64"):
    from aesara_tpu.sparse.basic import SparseTensorType

    return SparseTensorType(fmt, dtype)(name)


class TestElemwiseEntryPoints:
    def test_mul_sd_specializes(self):
        s = _sparse_in()
        d = at.matrix("d", dtype="float64")
        out = sb.dense_from_sparse(s) * d
        f = function([s, d], out, mode="FAST_RUN")
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "MulSD" in ops, ops
        sv = rand_csr(4, 5)
        dv = rng.normal(size=(4, 5))
        np.testing.assert_allclose(
            np.asarray(f(sv, dv)), sv.toarray() * dv, rtol=1e-10
        )

    def test_mul_ss_specializes(self):
        s1, s2 = _sparse_in("s1"), _sparse_in("s2")
        out = sb.dense_from_sparse(s1) * sb.dense_from_sparse(s2)
        f = function([s1, s2], out, mode="FAST_RUN")
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "MulSS" in ops, ops
        a, b = rand_csr(4, 5), rand_csr(4, 5, density=0.5)
        np.testing.assert_allclose(
            np.asarray(f(a, b)), a.toarray() * b.toarray(), rtol=1e-10
        )

    def test_mul_sv_row_broadcast(self):
        s = _sparse_in()
        v = at.vector("v", dtype="float64")
        out = sb.dense_from_sparse(s) * v.dimshuffle("x", 0)
        f = function([s, v], out, mode="FAST_RUN")
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "MulSV" in ops, ops
        sv = rand_csr(4, 5)
        vv = rng.normal(size=5)
        np.testing.assert_allclose(
            np.asarray(f(sv, vv)), sv.toarray() * vv, rtol=1e-10
        )

    def test_add_sd_specializes(self):
        s = _sparse_in()
        d = at.matrix("d", dtype="float64")
        out = sb.dense_from_sparse(s) + d
        f = function([s, d], out, mode="FAST_RUN")
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "AddSD" in ops, ops
        sv = rand_csr(4, 5)
        dv = rng.normal(size=(4, 5))
        np.testing.assert_allclose(
            np.asarray(f(sv, dv)), sv.toarray() + dv, rtol=1e-10
        )

    def test_add_ss_specializes(self):
        s1, s2 = _sparse_in("s1"), _sparse_in("s2")
        out = sb.dense_from_sparse(s1) + sb.dense_from_sparse(s2)
        f = function([s1, s2], out, mode="FAST_RUN")
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "AddSS" in ops, ops
        a, b = rand_csr(4, 5), rand_csr(4, 5, density=0.5)
        np.testing.assert_allclose(
            np.asarray(f(a, b)), (a + b).toarray(), rtol=1e-10
        )

    def test_sampling_dot_recognized(self):
        s = _sparse_in("p")
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        out = sb.dense_from_sparse(s) * at.dot(x, y.T)
        f = function([s, x, y], out, mode="FAST_RUN")
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "SamplingDot" in ops, ops
        pv = rand_csr(4, 6)
        xv, yv = rng.normal(size=(4, 3)), rng.normal(size=(6, 3))
        np.testing.assert_allclose(
            np.asarray(f(pv, xv, yv)),
            pv.toarray() * (xv @ yv.T), rtol=1e-10,
        )

    def test_dense_needed_elsewhere_blocks_specialization(self):
        """When the densified operand has another consumer, the dense
        array exists anyway — don't add sparse work on top."""
        s = _sparse_in()
        d = at.matrix("d", dtype="float64")
        dense = sb.dense_from_sparse(s)
        out = [dense * d, at.exp(dense)]
        f = function([s, d], out, mode="FAST_RUN")
        ops = [type(n.op).__name__ for n in f.fgraph.apply_nodes]
        assert "MulSD" not in ops, ops

    def test_add_cancel_through_dfs(self):
        s = _sparse_in()
        out = sb.dense_from_sparse(s) + sb.dense_from_sparse(sb.neg(s))
        f = function([s], out, mode="FAST_RUN", on_unused_input="ignore")
        sv = rand_csr(4, 5)
        np.testing.assert_allclose(np.asarray(f(sv)), np.zeros((4, 5)))
