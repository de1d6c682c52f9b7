"""BSS (blocked segment-slot) Pallas structured_dot path.

Differential vs the scipy oracle and the PY mode, on the CPU backend —
``pallas_call`` runs the SAME kernel body through the Pallas interpreter
(link/jax/bss.py chooses interpret off-TPU), so layout + kernel logic is
exercised; the real-chip numbers live in benchmarks/README.md.

Reference counterpart: the structured-dot C kernels exercised by
/root/reference/tests/sparse/test_basic.py (StructuredDot tests).
"""

import numpy as np
import pytest
import scipy.sparse as sps

import aesara_tpu as at_mod
import aesara_tpu.tensor as at
from aesara_tpu import config, function, shared
from aesara_tpu.link.jax.bss import (
    BSSMat,
    bss_eligible,
    bss_matmul,
    cell_occupancy,
    csr_to_bss,
)
from aesara_tpu.sparse import basic as sb


def _rand_csr(n, d, density, seed=0, dtype=np.float32):
    return sps.random(n, d, density=density, format="csr", dtype=dtype,
                      random_state=np.random.RandomState(seed))


@pytest.mark.parametrize(
    "n,d,density",
    [
        (128, 128, 0.05),
        (300, 200, 0.03),   # unaligned both dims
        (1, 257, 0.5),      # single row, d just over 2 segments
        (257, 1, 0.5),      # single col
        (64, 640, 0.01),
    ],
)
def test_bss_spmv_matches_scipy(n, d, density):
    x = _rand_csr(n, d, density)
    bss = csr_to_bss(x)
    rng = np.random.RandomState(1)
    v = rng.normal(size=d).astype(np.float32)
    got = np.asarray(bss_matmul(bss, v))
    np.testing.assert_allclose(got, x @ v, rtol=2e-5, atol=2e-5)


def test_bss_matrix_rhs_and_dtypes():
    x = _rand_csr(200, 300, 0.04)
    bss = csr_to_bss(x)
    rng = np.random.RandomState(2)
    b = rng.normal(size=(300, 3)).astype(np.float32)
    got = np.asarray(bss_matmul(bss, b))
    assert got.shape == (200, 3)
    np.testing.assert_allclose(got, x @ b, rtol=2e-5, atol=2e-5)
    # f64 matrices bridge at f32 (TPU-native precision)
    x64 = _rand_csr(64, 64, 0.1, dtype=np.float64)
    got64 = np.asarray(bss_matmul(csr_to_bss(x64), np.ones(64, np.float32)))
    np.testing.assert_allclose(got64, (x64 @ np.ones(64)), rtol=1e-5,
                               atol=1e-5)


def test_bss_empty_and_dense_rows():
    # nnz = 0: all-zero output
    z = sps.csr_matrix((50, 70), dtype=np.float32)
    got = np.asarray(bss_matmul(csr_to_bss(z), np.ones(70, np.float32)))
    np.testing.assert_array_equal(got, np.zeros(50, np.float32))
    # one fully dense row drives cell occupancy to the per-cell max
    x = sps.lil_matrix((130, 256), dtype=np.float32)
    x[3, :] = 1.0
    x[129, 7] = 2.0
    x = x.tocsr()
    assert cell_occupancy(x) == 128
    bss = csr_to_bss(x)
    v = np.arange(256, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(bss_matmul(bss, v)), x @ v,
                               rtol=1e-5, atol=1e-4)


def test_bss_transpose_layout():
    x = _rand_csr(100, 180, 0.05, seed=3)
    bss = csr_to_bss(x, with_transpose=True)
    v = np.random.RandomState(4).normal(size=100).astype(np.float32)
    xt = bss.transpose()
    assert isinstance(xt, BSSMat) and xt.shape == (180, 100)
    np.testing.assert_allclose(np.asarray(bss_matmul(xt, v)), x.T @ v,
                               rtol=2e-5, atol=2e-5)
    # double transpose returns the original layout
    np.testing.assert_allclose(
        np.asarray(bss_matmul(xt.transpose(), np.ones(180, np.float32))),
        x @ np.ones(180, np.float32), rtol=2e-5, atol=2e-5)
    with pytest.raises(ValueError, match="no transposed layout"):
        csr_to_bss(x).transpose()


def test_bss_implicit_zeros_never_touch_rhs():
    # column 5 holds inf; rows without a stored entry in cols [0,128)
    # touching it must stay finite (padded-slot masking)
    x = sps.csr_matrix(
        (np.array([1.0, 2.0], np.float32), (np.array([0, 1]),
                                            np.array([5, 200]))),
        shape=(4, 256),
    )
    v = np.ones(256, np.float32)
    v[5] = np.inf
    got = np.asarray(bss_matmul(csr_to_bss(x), v))
    assert np.isinf(got[0])          # row 0 stores (0, 5)
    assert np.all(np.isfinite(got[1:]))  # others never touch col 5


def test_bss_eligibility_gate():
    assert bss_eligible(_rand_csr(256, 256, 0.01))
    # dense-ish matrix: occupancy blows the P_GATE
    assert not bss_eligible(_rand_csr(256, 256, 0.9))
    assert not bss_eligible(np.zeros((4, 4)))
    assert not bss_eligible(sps.csr_matrix((0, 5), dtype=np.float32))


def test_function_bridges_bss_and_matches_py():
    x_sp = _rand_csr(256, 384, 0.02, seed=5)
    x = shared(x_sp, name="x")
    w = at.vector("w", dtype="float64")
    out = sb.structured_dot(x, at.shape_padright(w)).flatten()
    f = function([w], out, mode="FAST_RUN")
    f_py = function([w], out, mode="PY")
    assert "bss" in f.fn.sparse_plan
    wv = np.random.RandomState(6).normal(size=384).astype(config.floatX)
    np.testing.assert_allclose(f(wv), f_py(wv), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(f(wv), x_sp @ wv, rtol=2e-5, atol=2e-5)


def test_function_glm_grad_uses_transposed_bss():
    # the BASELINE config-5 pattern: forward SpMV + transposed SpMV in
    # the gradient, both through the BSS bridge
    x_sp = _rand_csr(512, 256, 0.02, seed=7)
    x = shared(x_sp, name="x")
    y = np.random.RandomState(8).normal(size=512).astype(config.floatX)
    w = shared(np.zeros(256, config.floatX), name="w")
    pred = sb.structured_dot(x, at.shape_padright(w + 0.1)).flatten()
    loss = at.mean((pred - y) ** 2)
    gw = at_mod.grad(loss, w)
    f = function([], [loss, gw], mode="FAST_RUN")
    f_py = function([], [loss, gw], mode="PY")
    got, g_got = f()
    exp, g_exp = f_py()
    np.testing.assert_allclose(got, exp, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g_got, g_exp, rtol=2e-4, atol=2e-5)


def test_usmm_bridges_bss():
    x_sp = _rand_csr(192, 160, 0.03, seed=9)
    x = shared(x_sp, name="x")
    yv = np.random.RandomState(10).normal(size=(160, 2)).astype(np.float32)
    zv = np.random.RandomState(11).normal(size=(192, 2)).astype(np.float32)
    out = sb.usmm(np.float32(0.5), x, at.as_tensor_variable(yv),
                  at.as_tensor_variable(zv))
    f = function([], out, mode="FAST_RUN")
    np.testing.assert_allclose(
        f(), 0.5 * (x_sp @ yv) + zv, rtol=2e-5, atol=2e-5)


def test_wide_rhs_rides_bss_mxu_kernel():
    # rhs with 32 static columns exceeds C_GATE: round 5 routes it to
    # the block-densify MXU SpMM kernel — the plan stays BSS
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.link.jax.sparse_dispatch import bss_inputs

    x_sp = _rand_csr(128, 128, 0.05, seed=12)
    x = shared(x_sp, name="x")
    bv = np.random.RandomState(13).normal(size=(128, 32)).astype(np.float32)
    out = sb.structured_dot(x, at.as_tensor_variable(bv))
    xv = sb.SparseTensorType("csr", "float32", (None, None))("xv")
    b2 = at.matrix("b2", dtype="float32")
    b2.type = type(b2.type)(b2.type.dtype, (None, 32))
    fg = FunctionGraph(
        [xv], [sb.structured_dot(xv, at.as_tensor_variable(bv))], clone=True)
    assert bss_inputs(fg)[0] is not None
    f = function([], out, mode="FAST_RUN")
    np.testing.assert_allclose(f(), x_sp @ bv, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("C", [16, 128, 200])
def test_bss_wide_spmm_matches_scipy(C):
    x = _rand_csr(200, 330, 0.04, seed=21)
    a = csr_to_bss(x)
    bv = np.random.RandomState(22).normal(size=(330, C)).astype(np.float32)
    got = np.asarray(bss_matmul(a, bv))
    np.testing.assert_allclose(got, x @ bv, rtol=3e-5, atol=3e-5)


def test_bss_wide_spmm_bf16():
    import jax.numpy as jnp

    x = _rand_csr(128, 256, 0.05, seed=23)
    a = csr_to_bss(x)
    bv = np.random.RandomState(24).normal(size=(256, 64)).astype(np.float32)
    got = np.asarray(bss_matmul(a, jnp.asarray(bv, dtype=jnp.bfloat16)),
                     dtype=np.float32)
    ref = x @ bv
    # bf16 MXU dots with f32 accumulate: ~3 decimal digits
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_bss_sddmm_matches_pattern_sampling():
    from aesara_tpu.link.jax.bss import bss_sddmm

    n, d, C = 150, 260, 24
    x = _rand_csr(n, d, 0.03, seed=25)
    rs = np.random.RandomState(26)
    gz = rs.normal(size=(n, C)).astype(np.float32)
    bv = rs.normal(size=(d, C)).astype(np.float32)
    got = np.asarray(bss_sddmm(csr_to_bss(x), gz, bv).todense())
    dense_ga = gz @ bv.T
    ref = x.copy()
    rows = np.repeat(np.arange(n), np.diff(x.indptr))
    ref.data = dense_ga[rows, x.indices]
    np.testing.assert_allclose(got, ref.todense(), rtol=1e-4, atol=1e-4)


def test_grad_wrt_sparse_rides_bss():
    """d/d(sparse values) of sum(structured_dot(x, b)): the cone admits
    StructuredDotGradA at the pattern slot; values match PY mode."""
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.link.jax.sparse_dispatch import bss_inputs
    from aesara_tpu.gradient import grad

    from aesara_tpu.tensor.type import TensorType

    x_sp = _rand_csr(96, 140, 0.05, seed=27)
    xv = sb.SparseTensorType("csr", "float32", (None, None))("xv")
    # static column count: the BSS kernels unroll over C
    b = TensorType("float32", (None, 8))("b")
    out = at.sum(sb.structured_dot(xv, b) ** 2)
    # grad graph contains StructuredDotGradA(gz, b, xv)
    gb = grad(out, b)
    fg = FunctionGraph([xv, b], [gb], clone=True)
    # grad wrt b uses transpose(xv): admitted with transpose plan
    plan = bss_inputs(fg)[0]
    assert plan is not None and plan["transpose"]

    bv = np.random.RandomState(28).normal(size=(140, 8)).astype(np.float32)
    f_fast = function([xv, b], gb, mode="FAST_RUN")
    f_py = function([xv, b], gb, mode="PY")
    np.testing.assert_allclose(f_fast(x_sp, bv), f_py(x_sp, bv),
                               rtol=2e-4, atol=2e-4)


def test_unsafe_cone_falls_back():
    # SpSum consumer is outside the BSS-safe set: plan must not be bss
    from aesara_tpu.link.jax.sparse_dispatch import bss_inputs
    from aesara_tpu.graph.fg import FunctionGraph

    xv = sb.SparseTensorType("csr", "float32", (None, None))("x")
    w = at.vector("w", dtype="float32")
    out = sb.structured_dot(xv, at.shape_padright(w)).flatten() \
        + sb.sp_sum(xv)
    fg = FunctionGraph([xv, w], [out], clone=True)
    assert bss_inputs(fg)[0] is None
    # pure structured_dot cone: eligible, no transpose needed
    fg2 = FunctionGraph(
        [xv, w],
        [sb.structured_dot(xv, at.shape_padright(w)).flatten()],
        clone=True,
    )
    plan = bss_inputs(fg2)
    assert plan[0] == {"transpose": False} and plan[1] is None
    # transpose consumer sets the flag
    fg3 = FunctionGraph(
        [xv, w],
        [sb.structured_dot(sb.transpose(xv), at.shape_padright(w)).flatten()],
        clone=True,
    )
    assert bss_inputs(fg3)[0] == {"transpose": True}
