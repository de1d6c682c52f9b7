"""Backend differential sweep — the SURVEY §4 ``compare_jax_and_py``
strategy applied wholesale: one expression per lowering family,
compiled under BOTH the whole-graph XLA path and the py-oracle path,
asserting allclose.  This is the per-lowering correctness net for the
117-rule ``jax_funcify`` registry.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm

rng = np.random.default_rng(41)


def compare(inputs, outputs, values, rtol=1e-5, atol=1e-6):
    if not isinstance(outputs, (list, tuple)):
        outputs = [outputs]
    f_jax = atp.function(inputs, list(outputs), mode="JAX",
                         on_unused_input="ignore")
    f_py = atp.function(inputs, list(outputs), mode="PY",
                        on_unused_input="ignore")
    got = f_jax(*values)
    ref = f_py(*values)
    for g, r in zip(got, ref):
        g, r = np.asarray(g), np.asarray(r)
        assert g.shape == r.shape, (g.shape, r.shape)
        if g.dtype.kind in "fc":
            np.testing.assert_allclose(g, r, rtol=rtol, atol=atol)
        else:
            assert np.array_equal(g, r)


def _v(*shape, pos=False, dtype="float64"):
    v = rng.standard_normal(shape) if shape else rng.standard_normal()
    if pos:
        v = np.abs(v) + 0.3
    return np.asarray(v, dtype=dtype)


def test_structural_family():
    a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
    j = at.join(0, a, b)
    s1, s2 = at.split(j, at.as_tensor_variable(np.array([3, 2])), 2, axis=0)
    compare([a, b], [j, s1, s2], [_v(3), _v(2)])

    x = at.matrix("x", dtype="float64")
    compare([x], [x.T, x.reshape((6,)), x.dimshuffle(1, 0, "x"),
                  at.roll(x, 1, axis=0), at.flatten(x)],
            [_v(2, 3)])

    # sizes derived from INPUT SHAPES lower fine (static under jit);
    # runtime-scalar sizes are a documented dynamic-shape limit asserted
    # in test_dynamic_shape_limits_raise_actionably
    y = at.matrix("y", dtype="float64")
    compare([y], [at.eye(y.shape[0], y.shape[0], 0), at.arange(y.shape[1]),
                  at.alloc(np.float64(2.5), y.shape[0], 2)],
            [_v(4, 3)])


def test_elemwise_and_special_family():
    x = at.vector("x", dtype="float64")
    compare([x], [tm.tanh(x), tm.erf(x), tm.erfc(x), tm.erfcx(x),
                  tm.sigmoid(x), tm.softplus(x), tm.expm1(x),
                  tm.sign(x), tm.floor(x), tm.ceil(x)],
            [_v(7)])
    compare([x], [tm.log(x), tm.sqrt(x), tm.gamma(x), tm.gammaln(x),
                  tm.digamma(x)],
            [_v(7, pos=True)])
    from aesara_tpu.tensor.special import log_softmax, softmax

    m = at.matrix("m", dtype="float64")
    compare([m], [softmax(m, axis=-1), log_softmax(m, axis=-1)],
            [_v(3, 5)])


def test_reduction_family():
    x = at.tensor3("x", dtype="float64")
    compare([x], [x.sum(), x.sum(axis=1), x.prod(axis=(0, 2)),
                  x.max(axis=0), x.min(axis=-1), x.mean(axis=2),
                  x.var(axis=1), x.std(axis=1)],
            [_v(2, 3, 4)])
    compare([x], [tm.argmax(x, axis=1), tm.argmin(x, axis=2)],
            [_v(2, 3, 4)])


def test_dot_family():
    a, b = at.matrix("a", dtype="float64"), at.matrix("b", dtype="float64")
    v = at.vector("v", dtype="float64")
    compare([a, b, v], [tm.dot(a, b), tm.dot(a, v), tm.dot(v, a),
                        at.tensordot(a, b, axes=[[1], [0]]),
                        at.outer(v, v)],
            [_v(3, 3), _v(3, 3), _v(3)])
    t = at.tensor3("t", dtype="float64")
    compare([t], [tm.batched_dot(t, t)], [_v(2, 3, 3)])


def test_subtensor_family():
    x = at.matrix("x", dtype="float64")
    i = at.lvector("i")
    from aesara_tpu.tensor.subtensor import inc_subtensor, set_subtensor

    compare([x, i],
            [x[1:], x[:, ::2], x[::-1], x[i], x[i, 0],
             set_subtensor(x[0], x[1] * 2), inc_subtensor(x[i], x[i])],
            [_v(4, 5), np.array([2, 0], dtype="int64")])
    # non-constant boolean masks have data-dependent output length —
    # the XLA path must refuse with the documented actionable error
    with pytest.raises(NotImplementedError, match="boolean-mask"):
        atp.function([x], x[at.ge(x, 0)], mode="JAX")
    f_py = atp.function([x], x[at.ge(x, 0)], mode="PY")
    xv = _v(3, 3)
    assert np.allclose(np.asarray(f_py(xv)), xv[xv >= 0])


def test_linalg_family():
    a = at.matrix("a", dtype="float64")
    spd = at.matrix("spd", dtype="float64")
    av = _v(4, 4)
    spdv = av @ av.T + 4 * np.eye(4)
    from aesara_tpu.tensor.nlinalg import det, matrix_inverse, pinv, trace
    from aesara_tpu.tensor.slinalg import cholesky, solve, solve_triangular

    # well-conditioned GENERAL (non-symmetric) matrix
    gen = av + 5 * np.eye(4)
    compare([a], [det(a), trace(a), matrix_inverse(a)], [gen], rtol=1e-6)
    compare([spd], [cholesky(spd), matrix_inverse(spd), pinv(spd)],
            [spdv], rtol=1e-6)
    b = at.vector("b", dtype="float64")
    compare([spd, b], [solve(spd, b, assume_a="pos", lower=True)],
            [spdv, _v(4)], rtol=1e-6)


def test_extra_ops_family():
    x = at.vector("x", dtype="float64")
    xi = at.lvector("xi")
    compare([x], [at.cumsum(x), at.cumprod(x)], [_v(6)])
    # bincount/unique have data-dependent output shapes: py-oracle only
    f_py = atp.function([xi], [at.bincount(xi), at.unique(xi)], mode="PY")
    iv = np.array([1, 3, 1, 0, 2], dtype="int64")
    b, u = f_py(iv)
    assert np.array_equal(np.asarray(b), np.bincount(iv))
    assert np.array_equal(np.asarray(u), np.unique(iv))
    compare([xi], [at.repeat(xi, 2)], [iv])
    m = at.matrix("m", dtype="float64")
    compare([m], [at.diff(m, axis=0), m.ravel(),
                  at.broadcast_to(m[:1], (3, 4))],
            [_v(2, 4)])


def test_sort_family():
    x = at.vector("x", dtype="float64")
    from aesara_tpu.tensor.sort import argsort, sort, topk

    compare([x], [sort(x), argsort(x), topk(x, 3)], [_v(7)])


def test_fft_family():
    x = at.matrix("x", dtype="float64")
    from aesara_tpu.tensor.fft import irfft, rfft

    xv = _v(2, 8)
    r = rfft(x)
    compare([x], [r, irfft(r)], [xv], rtol=1e-6)


def test_gradient_composites():
    """Grad graphs differ structurally from forward graphs — sweep a
    few full backward pipelines."""
    x = at.matrix("x", dtype="float64")
    w = at.matrix("w", dtype="float64")
    from aesara_tpu.gradient import grad

    loss = tm.sum(tm.tanh(tm.dot(x, w)) ** 2)
    gx, gw = grad(loss, [x, w])
    compare([x, w], [loss, gx, gw], [_v(3, 4), _v(4, 2)], rtol=1e-6)

    from aesara_tpu.tensor.special import softmax

    p = softmax(tm.dot(x, w), axis=-1)
    nll = -tm.log(p[0, 0])
    compare([x, w], list(grad(nll, [x, w])), [_v(3, 4), _v(4, 2)],
            rtol=1e-6)


def test_scan_composites():
    from aesara_tpu.gradient import grad
    from aesara_tpu.scan import scan

    x = at.vector("x", dtype="float64")
    h, _ = scan(lambda a, acc: tm.tanh(acc * 1.1 + a), sequences=[x],
                outputs_info=[at.constant(np.float64(0.0))])
    cost = h.sum()
    g = grad(cost, x)
    compare([x], [h, cost, g], [_v(6)], rtol=1e-6)


def test_ifelse_and_switch():
    from aesara_tpu.ifelse import ifelse

    c = at.iscalar("c")
    a, b = at.vector("a", dtype="float64"), at.vector("b", dtype="float64")
    compare([c, a, b], [ifelse(at.gt(c, 0), a * 2, b - 1),
                        at.switch(at.gt(a, 0), a, b)],
            [np.int32(1), _v(4), _v(4)])


def test_random_family_bit_identity():
    """Random draws must be BIT-identical between backends (the rng_fn
    doubles as oracle and lowering)."""
    from aesara_tpu.tensor.random.utils import RandomStream

    srng = RandomStream(seed=7)
    u = srng.uniform(size=(5,))
    n = srng.normal(size=(5,))
    f_jax = atp.function([], [u, n], mode="JAX")
    srng2 = RandomStream(seed=7)
    u2 = srng2.uniform(size=(5,))
    n2 = srng2.normal(size=(5,))
    f_py = atp.function([], [u2, n2], mode="PY")
    a = [np.asarray(v) for v in f_jax()]
    b = [np.asarray(v) for v in f_py()]
    for g, r in zip(a, b):
        assert np.array_equal(g, r)


def test_dynamic_shape_limits_raise_actionably():
    """Runtime-scalar-sized allocs are an INHERENT XLA limit: the
    lowering must fail with the documented actionable message (not a
    raw jax tracer error)."""
    n = at.iscalar("n")
    f = atp.function([n], at.alloc(np.float64(1.0), n, 2), mode="JAX")
    with pytest.raises(NotImplementedError, match="py mode"):
        f(np.int32(3))
