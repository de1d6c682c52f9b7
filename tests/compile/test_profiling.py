"""Per-pass rewrite profiling + memory accounting + scan profile
(reference ``compile/profiling.py:185+`` rewriter_profile, ``:249-259``
memory profile, ``scan/op.py:3344`` profile_printer)."""

import io

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.compile.profiling import ProfileMode, ProfileStats


def _profiled_function(outs_builder):
    mode = ProfileMode()
    x = at.matrix("x", dtype="float64")
    f = function([x], outs_builder(x), mode=mode,
                 profile=mode.profile_stats)
    return f, mode.profile_stats, x


def test_rewriter_profile_collected_per_stage():
    f, stats, _ = _profiled_function(lambda x: at.exp(x + 0.0) * 1.0)
    assert stats.rewriter_profile, "no per-stage rewrite profile collected"
    names = [row[0] for row in stats.rewriter_profile]
    # the optdb's named stages must appear, each with a timing and node counts
    for expected in ("merge1", "canonicalize", "specialize"):
        assert expected in names, (expected, names)
    for name, dt, n_in, n_out in stats.rewriter_profile:
        assert dt >= 0.0 and n_in >= 0 and n_out >= 0
    # canonicalize must have REMOVED the +0/*1 noise
    canon = dict((r[0], r) for r in stats.rewriter_profile)["canonicalize"]
    assert canon[3] <= canon[2]


def test_equilibrium_profile_has_passes_and_rewriter_times():
    f, stats, _ = _profiled_function(lambda x: at.log(1 + at.exp(x)))
    assert stats.equilibrium_profile
    stage = stats.equilibrium_profile.get("canonicalize") or next(
        iter(stats.equilibrium_profile.values())
    )
    assert stage["passes"] >= 1
    assert isinstance(stage["rewriter_time"], dict)


def test_summary_prints_stage_table_and_memory():
    f, stats, _ = _profiled_function(lambda x: at.exp(x).sum(axis=0))
    f(np.ones((64, 32)))
    buf = io.StringIO()
    stats.summary(file=buf)
    text = buf.getvalue()
    assert "rewrite pipeline (per optdb stage)" in text
    assert "canonicalize" in text
    assert "memory profile" in text and "MB" in text
    # per-op runtime table still present
    assert "per-op time" in text


def test_scan_profile_section():
    from aesara_tpu.scan.basic import scan

    mode = ProfileMode()
    x = at.vector("x", dtype="float64")
    h, _ = scan(lambda xt, acc: acc + at.exp(xt), sequences=[x],
                outputs_info=[at.constant(np.float64(0.0))])
    f = function([x], h, mode=mode, profile=mode.profile_stats)
    f(np.ones(5))
    buf = io.StringIO()
    mode.profile_stats.summary(file=buf)
    text = buf.getvalue()
    assert "scan loops" in text
    assert "inner:" in text


def test_device_trace_context(tmp_path):
    """device_trace captures a jax profiler trace directory."""
    import numpy as np

    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.compile.profiling import device_trace

    x = at.vector("x", dtype="float64")
    f = atp.function([x], (x * 2).sum(), mode="JAX")
    logdir = str(tmp_path / "trace")
    with device_trace(logdir):
        f(np.ones(8, dtype="float32"))
    import os

    assert os.path.isdir(logdir) and os.listdir(logdir)
