"""Pallas kernel tests (interpret-compatible on CPU via explicit calls)."""

import numpy as np
import pytest

import jax

import aesara_tpu as atp
import aesara_tpu.tensor as at

rng = np.random.default_rng(88)


def test_softmax_rows_kernel_cpu_interpret():
    # pallas kernels run in interpret mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    from aesara_tpu.link.jax.pallas_kernels import log_softmax_rows, softmax_rows

    x = rng.normal(size=(5, 37)).astype("float32")
    with pltpu.force_tpu_interpret_mode():
        res = np.asarray(softmax_rows(jax.numpy.asarray(x)))
        lres = np.asarray(log_softmax_rows(jax.numpy.asarray(x)))
    expected = np.exp(x - x.max(1, keepdims=True))
    expected /= expected.sum(1, keepdims=True)
    np.testing.assert_allclose(res, expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(lres, np.log(expected), rtol=1e-4, atol=1e-5)


def test_composite_pallas_kernel_cpu_interpret():
    from jax.experimental.pallas import tpu as pltpu

    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.link.jax.pallas_kernels import composite_pallas_fn
    from aesara_tpu.scalar.composite import Composite
    from aesara_tpu.tensor.rewriting.elemwise import FusionOptimizer
    from aesara_tpu.tensor.elemwise import Elemwise

    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    out = at.exp(x) * at.math.sigmoid(y) + at.tanh(x)
    fg = FunctionGraph(outputs=[out], clone=True)
    FusionOptimizer().rewrite(fg)
    comp_node = fg.toposort()[0]
    assert isinstance(comp_node.op.scalar_op, Composite)

    xv = rng.normal(size=300).astype("float32")
    yv = rng.normal(size=300).astype("float32")
    fn = composite_pallas_fn(comp_node.op.scalar_op, np.dtype("float32"))
    with pltpu.force_tpu_interpret_mode():
        # leaf order is the composite's input order
        leaves = comp_node.inputs
        vals = {"x": xv, "y": yv}
        args = [vals[l.name] for l in leaves]
        res = np.asarray(fn(*[jax.numpy.asarray(a) for a in args]))
    expected = np.exp(xv) * (1 / (1 + np.exp(-yv))) + np.tanh(xv)
    np.testing.assert_allclose(res, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "shape,causal",
    [((2, 96, 64), False), ((2, 96, 64), True), ((1, 160, 40), True),
     ((1, 1100, 64), True)],
    ids=["plain", "causal", "oddshape", "multitile-causal"],
)
def test_flash_attention_backward_cpu_interpret(shape, causal):
    """FlashAttention-2 backward vs the XLA composition's vjp."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from aesara_tpu.link.jax.pallas_kernels import flash_attention_grads
    from aesara_tpu.tensor.nnet.attention import _attention_ref

    BH, T, D = shape
    q = rng.normal(size=shape).astype("float32") * 0.3
    k = rng.normal(size=shape).astype("float32") * 0.3
    v = rng.normal(size=shape).astype("float32")
    do = rng.normal(size=shape).astype("float32")
    scale = float(1.0 / np.sqrt(D))

    def f(q_, k_, v_):
        return _attention_ref(q_, k_, v_, causal, scale).astype(jnp.float32)

    _, vjp = jax.vjp(f, q, k, v)
    refs = vjp(do)
    with pltpu.force_tpu_interpret_mode():
        gots = flash_attention_grads(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(do), causal=causal, scale=scale,
        )
    for name, got, want in zip(("dq", "dk", "dv"), gots, refs):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3,
            err_msg=f"{name} shape={shape} causal={causal}",
        )


def test_flash_gate_policy():
    from aesara_tpu.config import config
    from aesara_tpu.link.jax.pallas_kernels import use_flash_for

    # 'off' always wins
    with config.change_flags(flash_attention="off"):
        assert not use_flash_for((4, 4096, 128), "float32", min_seqlen=1024)
    # 'on' forces regardless of backend/size
    with config.change_flags(flash_attention="on"):
        assert use_flash_for((4, 128, 64), "float32", min_seqlen=1024)
        assert not use_flash_for((4, 128, 64), "int32", min_seqlen=1024)
    # 'auto' needs a non-cpu backend — on the CPU test platform it's off
    with config.change_flags(flash_attention="auto"):
        if jax.default_backend() == "cpu":
            assert not use_flash_for((4, 4096, 128), "float32",
                                     min_seqlen=1024)
