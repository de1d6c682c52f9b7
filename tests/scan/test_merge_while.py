"""ScanMerge rewrite and while-Scan XLA lowering
(reference ``scan/rewriting.py`` ScanMerge:1947; while-loop semantics of
``scan/op.py`` perform)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.scan import until
from aesara_tpu.scan.basic import scan
from aesara_tpu.scan.op import Scan


def _scan_nodes(f):
    return [n for n in f.maker.fgraph.toposort() if isinstance(n.op, Scan)]


def test_scan_merge_independent():
    x0 = at.scalar("x0")
    y0 = at.scalar("y0")
    n = 10
    outs1, _ = scan(lambda x: x * 1.5, outputs_info=[x0], n_steps=n)
    outs2, _ = scan(lambda y: y + 2.0, outputs_info=[y0], n_steps=n)
    f = atp.function([x0, y0], [outs1, outs2])
    assert len(_scan_nodes(f)) == 1
    r1, r2 = f(1.0, 0.0)
    assert np.allclose(r1, 1.5 ** np.arange(1, n + 1), rtol=1e-5)
    assert np.allclose(r2, 2.0 * np.arange(1, n + 1), rtol=1e-5)


def test_scan_merge_skips_dependent():
    x0 = at.scalar("x0")
    outs3, _ = scan(lambda x: x * 2.0, outputs_info=[x0], n_steps=5)
    outs4, _ = scan(lambda y: y + 1.0, outputs_info=[outs3[-1]], n_steps=5)
    f = atp.function([x0], outs4)
    assert len(_scan_nodes(f)) == 2
    assert np.allclose(f(1.0), 2.0**5 + np.arange(1, 6), rtol=1e-5)


def test_scan_merge_skips_different_n_steps():
    x0 = at.scalar("x0")
    y0 = at.scalar("y0")
    s = at.vector("s")
    o5, _ = scan(lambda e, acc: acc + e, sequences=[s], outputs_info=[x0])
    o6, _ = scan(lambda y: y * 3.0, outputs_info=[y0], n_steps=7)
    f = atp.function([s, x0, y0], [o5[-1], o6[-1]])
    assert len(_scan_nodes(f)) == 2
    a, b = f(np.ones(4, dtype="float32"), 0.0, 1.0)
    assert float(a) == 4.0
    assert abs(float(b) - 3.0**7) < 1e-2


def test_while_scan_lowers_to_while_loop():
    # Newton iteration: the [-1] usage becomes final_only via scan_save_mem,
    # which unlocks the lax.while_loop lowering
    a = at.scalar("a")
    x0 = at.scalar("x0")

    def step(x, a):
        new = (x + a / x) / 2.0
        return new, until(at.math.abs(new * new - a) < 1e-6)

    outs, _ = scan(step, outputs_info=[x0], non_sequences=[a], n_steps=100)
    f = atp.function([x0, a], outs[-1])
    nodes = _scan_nodes(f)
    assert nodes and nodes[0].op.info.as_while
    assert nodes[0].op.info.final_only == (True,)
    got = float(f(1.0, 2.0))
    assert abs(got - np.sqrt(2)) < 1e-5


def test_while_scan_with_sequence_early_stop():
    s = at.vector("s")
    acc0 = at.scalar("acc0")

    def stepseq(el, acc):
        new = acc + el
        return new, until(new > 10.0)

    outs, _ = scan(stepseq, sequences=[s], outputs_info=[acc0])
    f = atp.function([s, acc0], outs[-1])
    sv = np.arange(1.0, 11.0).astype("float32")
    assert float(f(sv, 0.0)) == 15.0  # 1+2+3+4+5 stops the loop
    # matches the py oracle
    fp = atp.function([s, acc0], outs[-1], mode="PY")
    assert float(fp(sv, 0.0)) == 15.0


def test_while_scan_stacked_outputs_stay_py():
    # stacked while outputs are dynamic-length: XLA lowering must refuse,
    # py path must serve them
    x0 = at.scalar("x0")

    def step(x):
        new = x + 1.0
        return new, until(new >= 3.0)

    outs, _ = scan(step, outputs_info=[x0], n_steps=10)
    fp = atp.function([x0], outs, mode="PY")
    assert np.allclose(fp(0.0), [1.0, 2.0, 3.0])

    from aesara_tpu.link.jax.dispatch import jax_funcify

    node = outs.owner
    with pytest.raises(NotImplementedError, match="stacked"):
        jax_funcify(node.op, node=node)


def test_rop_through_scan_vs_jax_jvp():
    """Forward-mode (Rop, double-backward construction) through a scan
    matches jax.jvp ground truth."""
    import jax
    import jax.numpy as jnp

    from aesara_tpu.gradient import Rop

    rng = np.random.default_rng(0)
    x0v = rng.normal(size=4).astype("float32")
    Wv = (rng.normal(size=(4, 4)) * 0.5).astype("float32")
    uv = rng.normal(size=4).astype("float32")

    x0 = at.vector("x0")
    W = at.matrix("W")
    u = at.vector("u")
    outs, _ = scan(lambda h, W_: at.math.tanh(at.math.dot(W_, h)),
                   outputs_info=[x0], non_sequences=[W], n_steps=5)
    jvp = Rop(outs[-1], x0, u)
    f = atp.function([x0, W, u], jvp, mode="PY")

    def fwd(x):
        h = x
        for _ in range(5):
            h = jnp.tanh(Wv @ h)
        return h

    _, expected = jax.jvp(fwd, (jnp.asarray(x0v),), (jnp.asarray(uv),))
    assert np.allclose(np.asarray(f(x0v, Wv, uv)), np.asarray(expected),
                       atol=1e-5)


def test_scan_edge_behaviors():
    """go_backwards, non-contiguous taps, strict mode, mixed kinds
    (reference tests/scan/test_basic.py behaviors)."""
    s = at.vector("s")
    sv = np.array([1.0, 2.0, 3.0], dtype="float32")

    outs, _ = scan(lambda e, acc: acc + e, sequences=[s],
                   outputs_info=[at.as_tensor_variable(np.float32(0.0))],
                   go_backwards=True)
    f = atp.function([s], outs, mode="PY")
    assert np.allclose(f(sv), [3.0, 5.0, 6.0])

    # taps=[-2] only: value interleave from a 2-row initial window
    x0 = at.matrix("x0")
    outs2, _ = scan(lambda xm2: xm2 + 1.0,
                    outputs_info=[dict(initial=x0, taps=[-2])], n_steps=5)
    f2 = atp.function([x0], outs2, mode="PY")
    init = np.array([[0.0], [10.0]], dtype="float32")
    assert np.allclose(np.asarray(f2(init)).ravel(), [1, 11, 2, 12, 3])

    # strict=True: implicit shared use raises; explicit passing works;
    # updated shareds are exempt (they ride the carry)
    w = atp.shared(np.float32(2.0), name="w")
    with pytest.raises(ValueError, match="strict"):
        scan(lambda e: e * w, sequences=[s], strict=True)
    outs3, _ = scan(lambda e, w_: e * w_, sequences=[s], non_sequences=[w],
                    strict=True)
    f3 = atp.function([s], outs3, mode="PY")
    assert np.allclose(f3(sv), sv * 2)
    c = atp.shared(np.float32(0.0), name="c")
    scan(lambda e: {c: c + e}, sequences=[s], strict=True)  # no raise

    # mixed kinds in one scan: sit-sot + nit-sot + shared update
    c2 = atp.shared(np.float32(0.0), name="c2")

    def step(e, acc):
        return (acc + e, e * 2.0), {c2: c2 + 1.0}

    (acc_out, dbl), upd = scan(
        step, sequences=[s],
        outputs_info=[at.as_tensor_variable(np.float32(0.0)), None])
    f4 = atp.function([s], [acc_out[-1], dbl], updates=upd, mode="PY")
    a, d = f4(sv)
    assert float(a) == 6.0 and np.allclose(d, sv * 2)
    assert float(c2.get_value()) == 3.0
