"""Graph-core tests (traversal, clone, toposort, equality) — mirrors
``tests/graph/test_basic.py`` strategy in the reference."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.ir import (
    ancestors,
    applys_between,
    clone,
    clone_replace,
    equal_computations,
    general_toposort,
    graph_inputs,
    io_toposort,
    vars_between,
)


def build():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    z = (x + y) * at.exp(x)
    return x, y, z


def test_graph_inputs():
    x, y, z = build()
    assert set(graph_inputs([z])) == {x, y}


def test_ancestors_includes_intermediates():
    x, y, z = build()
    anc = ancestors([z])
    assert x in anc and y in anc and z in anc
    assert len([a for a in anc if a.owner is not None]) == 3  # add, exp, mul


def test_io_toposort_order():
    x, y, z = build()
    order = io_toposort([x, y], [z])
    assert order[-1] is z.owner
    positions = {id(n): i for i, n in enumerate(order)}
    for node in order:
        for inp in node.inputs:
            if inp.owner is not None:
                assert positions[id(inp.owner)] < positions[id(node)]


def test_general_toposort_cycle_detection():
    # build an artificial cycle through the deps function
    deps = {1: [2], 2: [3], 3: [1]}
    with pytest.raises(ValueError):
        general_toposort([1], deps=lambda n: deps.get(n, []))


def test_clone_is_structurally_equal():
    x, y, z = build()
    (x2, y2), (z2,) = clone([x, y], [z])
    assert z2 is not z
    assert equal_computations([z2], [z], [x2, y2], [x, y])


def test_clone_replace():
    x, y, z = build()
    w = at.vector("w", dtype="float64")
    z2 = clone_replace(z, {y: w})
    assert w in graph_inputs([z2])
    assert y not in graph_inputs([z2])


def test_equal_computations_distinguishes():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    assert equal_computations([x + y], [x + y])
    assert not equal_computations([x + y], [x - y])
    assert not equal_computations([x + y], [x + x])


def test_equal_computations_constants():
    x = at.vector("x", dtype="float64")
    a = x + np.asarray([1.0, 2.0], dtype="float32")
    b = x + np.asarray([1.0, 2.0], dtype="float32")
    c = x + np.asarray([1.0, 3.0], dtype="float32")
    assert equal_computations([a], [b])
    assert not equal_computations([a], [c])


def test_vars_applys_between():
    x, y, z = build()
    vs = vars_between([x, y], [z])
    ns = applys_between([x, y], [z])
    assert z in vs
    assert len(ns) == 3


def test_variable_eval():
    x = at.scalar("x", dtype="float64")
    y = at.scalar("y", dtype="float64")
    z = x + y
    assert np.isclose(z.eval({x: 2.0, y: 3.0}), 5.0)
