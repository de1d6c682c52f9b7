"""Per-Apply attribution of the compiled XLA program.

Reference counterpart: per-Apply ProfileStats on the production backend
(/root/reference/aesara/compile/profiling.py:185).  Here the program is
ONE fused XLA computation, so attribution rides HLO ``op_name``
metadata emitted by ``jax.named_scope`` per node (link/jax/linker.py)
and is read back by ``link/jax/profile_attr.attribute``.
"""

import io

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.link.jax.profile_attr import attribute, parse_hlo, print_report


def _hlo_of(f):
    return f.fn.jit_fn.lower(*f.fn.last_args).compile().as_text()


def test_named_scopes_reach_hlo_metadata():
    x = at.matrix("x", dtype="float64")
    w = atp.shared(np.random.rand(32, 16).astype("float32"), name="w")
    out = at.tanh(at.dot(x, w)).sum()
    f = atp.function([x], out, mode="FAST_RUN")
    f(np.random.rand(8, 32).astype("float32"))
    hlo = _hlo_of(f)
    # every non-trivial node's scope appears in some instruction
    assert 'op_name="' in hlo and "n0." in hlo


def test_dot_flops_and_rows():
    m, k, n = 64, 128, 32
    x = at.matrix("x", dtype="float64")
    w = atp.shared(np.random.rand(k, n).astype("float32"), name="w")
    out = at.dot(x, w).sum()
    f = atp.function([x], out, mode="FAST_RUN")
    f(np.random.rand(m, k).astype("float32"))
    rep = attribute(f)
    assert rep["rows"], "no attributed rows"
    dot_rows = [r for r in rep["rows"] if any("Dot" in n or "dot" in str(
        r["opcodes"]) for n in (r["nodes"] or r["scopes"]))]
    assert dot_rows
    total_flops = sum(r["flops"] for r in rep["rows"])
    assert total_flops == pytest.approx(2 * m * k * n, rel=0.01)
    # shares sum to <= 1 and named_fraction is sane
    assert 0.0 <= rep["named_fraction"] <= 1.0
    assert abs(sum(r["share"] for r in rep["rows"])
               + rep["glue_model_s"] / rep["total_model_s"] - 1.0) < 1e-6


def test_fused_elemwise_lists_constituents():
    x = at.matrix("x", dtype="float64")
    y = at.tanh(x * 2.0 + 1.0) + at.exp(x)
    f = atp.function([x], y, mode="FAST_RUN")
    f(np.random.rand(64, 64).astype("float32"))
    rep = attribute(f)
    # XLA fuses the chain; the fusion row must still carry >= 1 named
    # graph node (rewrites may have merged all elemwise into one node)
    named = [r for r in rep["rows"] if r["nodes"]]
    assert named


def test_transformer_step_attribution_meets_90pct():
    from aesara_tpu.gradient import grad
    from aesara_tpu.models import TransformerEncoderLayer
    from aesara_tpu.models.optim import sgd
    from aesara_tpu.tensor import math as tm

    layer = TransformerEncoderLayer(64, 4, 128, seed=0)
    rng = np.random.default_rng(0)
    x = atp.shared((rng.normal(size=(2, 32, 64)) * 0.1).astype("float32"),
                   name="x")
    h = layer(x)
    loss = tm.mean(tm.sqr(h))
    step = atp.function([], loss, updates=sgd(loss, layer.params, lr=0.01),
                        mode="FAST_RUN")
    step()
    rep = attribute(step)
    assert rep["named_fraction"] >= 0.90, (
        f"only {rep['named_fraction']:.2%} of modeled device time maps "
        "to named graph nodes")
    # the heavy rows are the matmuls: flops-carrying rows exist and
    # reference real Apply nodes
    heavy = [r for r in rep["rows"] if r["flops"] > 0]
    assert heavy and all(r["nodes"] for r in heavy[:3])


def test_profile_summary_includes_attribution():
    x = at.matrix("x", dtype="float64")
    w = atp.shared(np.random.rand(32, 16).astype("float32"), name="w")
    out = at.dot(x, w).sum()
    f = atp.function([x], out, mode="FAST_RUN", profile=True)
    f(np.random.rand(8, 32).astype("float32"))
    buf = io.StringIO()
    f.profile.summary(file=buf)
    text = buf.getvalue()
    assert "per-node attribution" in text
    assert "dot(x, w)" in text


def test_attribute_needs_a_call_first():
    x = at.vector("x", dtype="float64")
    f = atp.function([x], x * 2, mode="FAST_RUN")
    with pytest.raises(TypeError, match="called at least once"):
        attribute(f)
