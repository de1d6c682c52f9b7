"""The densify bridge: sparse FUNCTION inputs whose sparse cone
tolerates dense values bridge onto the device as a dense array (one
host-side densify, memoized) and compute on the MXU; inputs whose cone
needs the sparsity structure — or escapes as a sparse output — keep the
BCOO bridge.  Reference boundary: aesara's JAX backend py-falls-back on
any scipy input (`/root/reference/aesara/link/jax/linker.py`); here both
plans stay one jitted XLA program and must agree with the PY oracle.
"""

import numpy as np
import pytest
import scipy.sparse as sps

import aesara_tpu as A
import aesara_tpu.tensor as at
from aesara_tpu import sparse
from aesara_tpu.compile.function import function
from aesara_tpu.config import config
from aesara_tpu.sparse import basic as sb

rng = np.random.default_rng(7)


def _csr(n=8, d=6, density=0.4, dtype="float64"):
    return sps.random(
        n, d, density=density, format="csr", dtype=dtype,
        random_state=np.random.RandomState(3),
    )


def _plan(f):
    return tuple(p for p in f.fn.sparse_plan if p is not None)


def test_structured_dot_densifies_and_matches_py():
    x = sparse.csr_matrix("x", dtype="float64")
    w = at.vector("w", dtype="float64")
    out = at.dot(x, w)  # structured_dot via sugar
    f = function([x, w], out, mode="FAST_RUN")
    fp = function([x, w], out, mode="PY")
    assert _plan(f) == ("dense",)
    xv, wv = _csr(), rng.normal(size=6)
    np.testing.assert_allclose(f(xv, wv), fp(xv, wv), rtol=1e-12)
    np.testing.assert_allclose(f(xv, wv), xv @ wv, rtol=1e-12)


def test_glm_grad_step_matches_py():
    # the BASELINE config-5 shape: structured_dot fwd + transpose-dot grad
    x = sparse.csr_matrix("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    w = A.shared(rng.normal(size=6), name="w")
    pred = at.dot(x, w)
    loss = at.sum((pred - y) ** 2)
    gw = A.grad(loss, w)
    xv, yv = _csr(), rng.normal(size=8)

    f = function([x, y], gw, mode="FAST_RUN")
    fp = function([x, y], gw, mode="PY")
    assert _plan(f) == ("dense",)
    np.testing.assert_allclose(
        np.asarray(f(xv, yv)), np.asarray(fp(xv, yv)), rtol=1e-10
    )


def test_sparse_output_keeps_bcoo():
    # x.T is sparse-typed AND a function output: the cone escapes, so
    # the bridge must not densify
    x = sparse.csr_matrix("x", dtype="float64")
    f = function([x], sb.transpose(x), mode="FAST_RUN")
    assert _plan(f) == ("bcoo",)
    xv = _csr()
    res = f(xv)
    assert sps.issparse(res)
    np.testing.assert_allclose(res.toarray(), xv.T.toarray())


def test_structure_consumer_stays_correct():
    # CSMProperties reads the concrete index vectors — not densify-safe
    # (and with no XLA lowering it degrades to the py path); either way
    # the densify bridge must not have claimed it
    import warnings

    from aesara_tpu.sparse.basic import csm_data

    x = sparse.csr_matrix("x", dtype="float64")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f = function([x], at.sum(csm_data(x)), mode="FAST_RUN")
    plan = getattr(f.fn, "sparse_plan", None)
    assert plan is None or plan[0] != "dense"
    xv = _csr()
    np.testing.assert_allclose(float(f(xv)), xv.data.sum(), rtol=1e-12)


def test_two_sparse_operand_op_keeps_bcoo():
    x = sparse.csr_matrix("x", dtype="float64")
    y = sparse.csr_matrix("y", dtype="float64")
    out = sb.dense_from_sparse(sb.add(x, y))
    f = function([x, y], out, mode="FAST_RUN")
    assert _plan(f) == ("bcoo", "bcoo")
    xv, yv = _csr(), _csr()
    np.testing.assert_allclose(
        np.asarray(f(xv, yv)), (xv + yv).toarray(), rtol=1e-12
    )


def test_dense_duals_match_py():
    # every densify-safe op with a dense value where the graph says
    # sparse, against the PY oracle
    x = sparse.csr_matrix("x", dtype="float64")
    m = at.matrix("m", dtype="float64")
    v = at.vector("v", dtype="float64")
    outs = [
        sb.sp_sum(x, axis=None),
        sb.sp_sum(x, axis=0),
        sb.sp_sum(x, axis=1),
        sb.dense_from_sparse(sb.mul(x, m)),
        sb.dense_from_sparse(sb.mul_s_v(x, v)),
        sb.add(x, m),
        sb.dense_from_sparse(sb.neg(x)),
        sb.dense_from_sparse(sb.sampling_dot(m, m, x)),
    ]
    f = function([x, m, v], outs, mode="FAST_RUN")
    fp = function([x, m, v], outs, mode="PY")
    assert _plan(f) == ("dense",)
    xv = _csr(8, 8)
    mv, vv = rng.normal(size=(8, 8)), rng.normal(size=8)
    for got, want in zip(f(xv, mv, vv), fp(xv, mv, vv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10)


def test_cone_descends_through_scan():
    # sparse non-seq consumed inside a scan body by densify-safe ops:
    # the analysis walks the inner fgraph, so the bridge still densifies
    # (the pattern of a whole training loop fused into one program)
    import aesara_tpu as A
    from aesara_tpu.scan.basic import scan

    x = sparse.csr_matrix("x", dtype="float64")
    w0 = at.vector("w0", dtype="float64")
    y = at.vector("y", dtype="float64")

    def step(wv):
        pred = at.dot(x, wv)
        gw = A.grad(at.sum((pred - y) ** 2), wv)
        return wv - 0.1 * gw

    ws, updates = scan(step, outputs_info=[w0], n_steps=4)
    f = function([x, w0, y], ws[-1], mode="FAST_RUN")
    fp = function([x, w0, y], ws[-1], mode="PY")
    assert _plan(f) == ("dense",)
    xv = _csr()
    w0v, yv = rng.normal(size=6), rng.normal(size=8)
    np.testing.assert_allclose(
        np.asarray(f(xv, w0v, yv)), np.asarray(fp(xv, w0v, yv)), rtol=1e-9
    )


def test_scan_with_structure_consumer_keeps_bcoo():
    # a structure-reading op INSIDE the scan body must block the densify
    from aesara_tpu.scan.basic import scan
    from aesara_tpu.sparse.basic import csm_data

    x = sparse.csr_matrix("x", dtype="float64")
    w0 = at.scalar("w0", dtype="float64")

    def step(wv):
        return wv + at.sum(csm_data(x))

    ws, _ = scan(step, outputs_info=[w0], n_steps=3)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        f = function([x, w0], ws[-1], mode="FAST_RUN")
    plan = getattr(f.fn, "sparse_plan", None)
    assert plan is None or plan[_plan_pos(f)] != "dense"
    xv = _csr()
    np.testing.assert_allclose(
        float(f(xv, 1.0)), 1.0 + 3 * xv.data.sum(), rtol=1e-12
    )


def _plan_pos(f):
    return next(i for i, p in enumerate(f.fn.sparse_plan) if p is not None)


def test_never_and_size_gate_force_bcoo():
    x = sparse.csr_matrix("x", dtype="float64")
    w = at.vector("w", dtype="float64")
    out = at.dot(x, w)
    xv, wv = _csr(), rng.normal(size=6)
    with config.change_flags(sparse_densify="never"):
        f = function([x, w], out, mode="FAST_RUN")
        assert _plan(f) == ("bcoo",)
        np.testing.assert_allclose(f(xv, wv), xv @ wv, rtol=1e-12)
    with config.change_flags(sparse_densify_max_mb=0):
        f = function([x, w], out, mode="FAST_RUN")
        # plan says dense-eligible, but the per-call size gate refuses —
        # the BCOO path must still produce the right value
        np.testing.assert_allclose(f(xv, wv), xv @ wv, rtol=1e-12)
