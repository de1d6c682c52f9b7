"""Shared harness for the rewrite behavior-spec corpora.

The reference's rewrite suites (``/root/reference/tests/tensor/rewriting/
test_math.py``, ``test_subtensor.py``, ``test_basic.py``,
``/root/reference/tests/scan/test_rewriting.py``) pin each rule with many
operand patterns, each asserting BOTH the post-rewrite topology and the
value.  These helpers re-create that methodology against this op set:

- ``op_labels(graphs)`` — the set of op "labels" reachable from some
  outputs: Op class names, ``Elemwise{Scalar}``/``CAReduce{Scalar}``
  compound names, scalar-op class names (including those hidden inside
  ``Composite`` fusions), making topology assertions robust to fusion.
- ``rewrite_and_check(...)`` — clone-rewrite a graph under the requested
  pipeline tags, assert labels that must be ``present``/``absent``, then
  run BOTH the original and the rewritten graph through the py oracle
  (every op's ``perform``) on the given test values and compare.

Value checks run via the py linker on purpose: the XLA-vs-py differential
sweep already pins backend agreement, so the corpus can afford thousands
of cases without thousands of XLA compiles.
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import OPT_NONE, Mode
from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Constant, Variable, ancestors
from aesara_tpu.graph.rewriting.utils import rewrite_graph
from aesara_tpu.link.basic import PerformLinker

py_mode = Mode(PerformLinker(), OPT_NONE)

__all__ = [
    "op_labels",
    "count_label",
    "rewrite_and_check",
    "rewrite_only",
    "py_mode",
]


def _labels_of_op(op):
    labels = [type(op).__name__]
    scalar_op = getattr(op, "scalar_op", None)
    if scalar_op is not None:
        sname = type(scalar_op).__name__
        labels.append(f"{type(op).__name__}{{{sname}}}")
        labels.append(sname)
        # Composite fusions hide the interesting scalar ops inside an
        # inner graph — surface them so `absent=("Exp",)` still means
        # "no exp is computed anywhere".
        inner = getattr(scalar_op, "outputs", None)
        if inner is not None:
            for v in ancestors(inner):
                if v.owner is not None:
                    labels.append(type(v.owner.op).__name__)
    # HasInnerGraph ops (OpFromGraph, Scan): surface inner ops with a
    # prefix-free label so "no Dot inside" style checks are expressible.
    inner_fg = getattr(op, "fgraph", None)
    if inner_fg is not None and isinstance(inner_fg, FunctionGraph):
        for node in inner_fg.apply_nodes:
            for lbl in _labels_of_op(node.op):
                labels.append(lbl)
    return labels


def op_labels(graphs):
    """Multiset of op labels reachable from ``graphs`` (list of Variables)."""
    if isinstance(graphs, Variable):
        graphs = [graphs]
    out = []
    for v in ancestors(list(graphs)):
        if v.owner is not None:
            out.extend(_labels_of_op(v.owner.op))
    return out


def count_label(graphs, label):
    return op_labels(graphs).count(label)


def rewrite_only(out, include=("canonicalize",), **kwargs):
    """Rewrite ``out`` (Variable or list) in place and return the result.

    No clone: the rewritten graph keeps referencing the caller's input
    variables, so the result can be compiled directly (tests build their
    graphs inline, so mutating them is fine).
    """
    return rewrite_graph(out, include=include, clone=False, **kwargs)


def rewrite_and_check(
    inputs,
    out,
    test_values,
    *,
    include=("canonicalize",),
    present=(),
    absent=(),
    expect_constant=None,
    check_dtype=True,
    rtol=1e-5,
    atol=1e-7,
    **query_kwargs,
):
    """Rewrite ``out`` under ``include`` tags, assert topology, compare
    values of original-vs-rewritten under the py oracle.

    Returns the rewritten output variable for extra ad-hoc assertions.
    """
    single = isinstance(out, Variable)
    outs = [out] if single else list(out)
    # Clone with an explicit old->new map so the rewritten graph can be
    # compiled against clones of the SAME input list (rewrite_graph's
    # clone=True would lose the correspondence).
    from aesara_tpu.graph.ir import clone_get_equiv, graph_inputs

    memo = clone_get_equiv(list(graph_inputs(outs)), outs)
    cl_inputs = [memo.get(i, i) for i in inputs]
    res = rewrite_graph([memo[o] for o in outs], include=include, **query_kwargs)
    res = list(res) if not isinstance(res, Variable) else [res]

    labels = op_labels(res)
    for lbl in present:
        assert lbl in labels, f"expected {lbl!r} in rewritten graph; got {sorted(set(labels))}"
    for lbl in absent:
        assert lbl not in labels, f"{lbl!r} should have been rewritten away; got {sorted(set(labels))}"

    if expect_constant is not None:
        assert single and isinstance(res[0], Constant), (
            f"expected full constant fold; got {res[0]} owner={res[0].owner}"
        )
        np.testing.assert_allclose(
            np.asarray(res[0].data), expect_constant, rtol=rtol, atol=atol
        )

    f_ref = function(inputs, outs, mode=py_mode, on_unused_input="ignore")
    f_new = function(cl_inputs, res, mode=py_mode, on_unused_input="ignore")
    ref_vals = f_ref(*test_values)
    new_vals = f_new(*test_values)
    if single:
        ref_vals, new_vals = [ref_vals], [new_vals]
    for a, b in zip(ref_vals, new_vals):
        a, b = np.asarray(a), np.asarray(b)
        if check_dtype:
            assert a.dtype == b.dtype, f"rewrite changed dtype {a.dtype} -> {b.dtype}"
        assert a.shape == b.shape, f"rewrite changed shape {a.shape} -> {b.shape}"
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, equal_nan=True)
    return res[0] if single else res
