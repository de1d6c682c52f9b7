"""FunctionGraph tests: clients index, replace, features, integrity."""

import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.features import History, NodeFinder, ReplaceValidate
from aesara_tpu.graph.fg import FunctionGraph, MissingInputError


def build_fg():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    z = (x + y) * at.exp(x)
    fg = FunctionGraph([x, y], [z], clone=False)
    return x, y, z, fg


def test_clients_index():
    x, y, z, fg = build_fg()
    add_out = z.owner.inputs[0]
    assert (z.owner, 0) in fg.clients[add_out]
    assert ("output", 0) in fg.clients[z]
    fg.check_integrity()


def test_replace():
    x, y, z, fg = build_fg()
    add_out = z.owner.inputs[0]
    sub = x - y
    fg.replace(add_out, sub, reason="test")
    fg.check_integrity()
    assert fg.outputs[0].owner.inputs[0] is sub
    # the add node must be gone
    from aesara_tpu.tensor.math import add as tadd

    assert not any(
        n.op == tadd.elemwise_op for n in fg.apply_nodes
    )


def test_replace_type_mismatch_raises():
    x, y, z, fg = build_fg()
    bad = at.matrix("m", dtype="float64")
    with pytest.raises(TypeError):
        fg.replace(z, bad, reason="test")


def test_missing_input_raises():
    x, y, z, fg = build_fg()
    w = at.vector("w", dtype="float64")
    with pytest.raises(MissingInputError):
        fg.replace(z.owner.inputs[0], x + w, reason="test")


def test_history_revert():
    x, y, z, fg = build_fg()
    fg.attach_feature(History())
    chk = fg.checkpoint()
    fg.replace(z.owner.inputs[0], x - y, reason="test")
    fg.revert(chk)
    fg.check_integrity()
    assert fg.outputs[0] is z


def test_replace_validate():
    x, y, z, fg = build_fg()
    fg.attach_feature(ReplaceValidate())
    fg.replace_validate(z.owner.inputs[0], x - y, reason="test")
    fg.check_integrity()


def test_node_finder():
    x, y, z, fg = build_fg()
    fg.attach_feature(NodeFinder())
    from aesara_tpu.tensor.math import exp as texp

    found = fg.get_nodes(texp.elemwise_op)
    assert len(found) == 1


def test_prune_on_unused():
    x, y, z, fg = build_fg()
    # replacing the root output with a pass-through drops the whole graph
    fg.change_node_input("output", 0, x, reason="test", check=True)
    assert len(fg.apply_nodes) == 0
    fg.check_integrity()
