"""Bad-rewrite attribution: the culprit finder that names WHICH rewrite
broke a program (reference ``aesara/compile/debugmode.py:699``
``_find_bad_optimizations`` + ``:1172`` ``_VariableEquivalenceTracker``).

Strategy here (TPU re-design): instead of tracking variable equivalences
through every mutation, the finder re-runs the py oracle against each
optdb stage prefix (the position_cutoff order), then replays the guilty
stage probing every ``replace_all_validate`` commit — the single
transaction point every node rewrite goes through with its ``reason``.
"""

import numpy as np
import pytest

import aesara_tpu.scalar as aes
import aesara_tpu.tensor as at
from aesara_tpu.compile.debugmode import (
    BadOptimization,
    DebugMode,
    RewriteCulpritReport,
    find_bad_rewrite,
)
from aesara_tpu.compile.function import function
from aesara_tpu.graph.rewriting.basic import (
    WalkingGraphRewriter,
    node_rewriter,
)
from aesara_tpu.graph.rewriting.db import RewriteDatabaseQuery
from aesara_tpu.tensor.elemwise import Elemwise


@node_rewriter([Elemwise])
def evil_sub_to_add(fgraph, node):
    """Deliberately WRONG: rewrites a - b into a + b."""
    if isinstance(node.op.scalar_op, aes.ops.Sub):
        return [at.add(*node.inputs)]
    return False


def _evil_query(position):
    evil = WalkingGraphRewriter(evil_sub_to_add)
    evil.name = "evil_sub_to_add_pass"
    return RewriteDatabaseQuery(
        include=["fast_run"], extra_rewrites=[(evil, position)]
    )


XVAL = np.array([1.0, 2.0, 3.0], dtype="float32")
YVAL = np.array([0.5, 0.25, 4.0], dtype="float32")


def _graph():
    x = at.vector("x")
    y = at.vector("y")
    out = (x - y) * 2.0
    return x, y, out


def test_culprit_named_for_planted_wrong_rewrite():
    x, y, out = _graph()
    report = find_bad_rewrite(
        [x, y], [out], [XVAL, YVAL], optimizer=_evil_query(2.5)
    )
    assert isinstance(report, RewriteCulpritReport)
    # the transaction probe names the node rewriter itself
    assert "evil_sub_to_add" in report.culprit_name
    assert "evil_sub_to_add" in str(report)
    assert report.output_idx == 0


def test_no_divergence_returns_none():
    x, y, out = _graph()
    report = find_bad_rewrite(
        [x, y], [out], [XVAL, YVAL], optimizer="fast_run"
    )
    assert report is None


def test_culprit_found_at_later_pipeline_position():
    # plant the same wrong rewrite at a later stage (after uncanonicalize,
    # before the fusion band): the stage prefix scan must still isolate it
    x, y, out = _graph()
    report = find_bad_rewrite(
        [x, y], [out], [XVAL, YVAL], optimizer=_evil_query(10.0)
    )
    assert report is not None
    assert "evil_sub_to_add" in report.culprit_name


def test_wrong_rewrite_erased_by_fusion_is_no_divergence():
    # planting AFTER elemwise fusion (pos 49) means no Elemwise(Sub) node
    # remains for the wrong rewrite to fire on — the program stays correct
    # and the finder reports no divergence (not a false positive)
    x, y, out = _graph()
    report = find_bad_rewrite(
        [x, y], [out], [XVAL, YVAL], optimizer=_evil_query(98.0)
    )
    assert report is None


def test_debugmode_bisect_raises_with_culprit_name():
    x, y, out = _graph()
    mode = DebugMode(optimizer=_evil_query(2.5), bisect=True,
                     check_preallocated=False)
    f = function([x, y], out, mode=mode)
    with pytest.raises(BadOptimization, match="evil_sub_to_add"):
        f(XVAL, YVAL)


def test_debugmode_bisect_clean_program_runs():
    x, y, out = _graph()
    mode = DebugMode(bisect=True, check_preallocated=False)
    f = function([x, y], out, mode=mode)
    np.testing.assert_allclose(f(XVAL, YVAL), (XVAL - YVAL) * 2.0, rtol=1e-6)


def test_debugmode_bisect_with_shared_updates():
    # updates participate: the update output is compared against the
    # unrewritten oracle too, and the culprit is still named
    from aesara_tpu.compile.sharedvalue import shared

    s = shared(np.array([10.0, 20.0, 30.0], dtype="float32"), name="s")
    x = at.vector("x")
    new_s = s - x  # evil flips this to s + x
    mode = DebugMode(optimizer=_evil_query(2.5), bisect=True,
                     check_preallocated=False)
    f = function([x], [], updates=[(s, new_s)], mode=mode)
    with pytest.raises(BadOptimization, match="evil_sub_to_add"):
        f(XVAL)
