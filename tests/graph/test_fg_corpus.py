"""FunctionGraph behavior-depth corpus.

Behavior specs mirroring the intents of the reference FunctionGraph suite
(``/root/reference/tests/graph/test_fg.py``): construction/cloning rules,
import semantics (missing inputs, import_missing), client bookkeeping
across change_node_input/replace/remove_node, multi-output pruning,
integrity checking, pickling, and feature-driven orderings.  Written
fresh against this framework's API.
"""

import pickle

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.features import Feature
from aesara_tpu.graph.fg import OUTPUT, FunctionGraph, MissingInputError
from aesara_tpu.graph.ir import Apply, Constant, Type, Variable
from aesara_tpu.graph.op import Op


class _T(Type):
    def filter(self, data, strict=False, allow_downcast=None):
        return data

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))

    def __str__(self):
        return "T"


T = _T()


def V(name=None):
    return Variable(T, None, None, name=name)


class _MyOp(Op):
    __props__ = ()

    def make_node(self, *inputs):
        return Apply(self, list(inputs), [V()])

    def perform(self, node, inputs, outputs):
        outputs[0][0] = inputs[0]

    def __str__(self):
        return "MyOp"


class _TwoOut(Op):
    __props__ = ()

    def make_node(self, *inputs):
        return Apply(self, list(inputs), [V(), V()])

    def perform(self, node, inputs, outputs):
        outputs[0][0] = inputs[0]
        outputs[1][0] = inputs[0]

    def __str__(self):
        return "TwoOut"


myop = _MyOp()
twoout = _TwoOut()


# --- construction ---------------------------------------------------------------


def test_init_clone_isolates_original():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    z = x + y
    fg = FunctionGraph([x, y], [z], clone=True)
    assert fg.outputs[0] is not z
    # mutating the fgraph leaves the caller's graph alone
    fg.replace(fg.outputs[0], fg.inputs[0] * 2)
    assert z.owner is not None and str(z.owner.op) != "mul"


def test_init_infers_inputs_excluding_constants():
    x = at.vector("x", dtype="float64")
    z = x + np.ones(3)
    fg = FunctionGraph(outputs=[z], clone=False)
    assert fg.inputs == [x]
    # the constant is tracked as a variable but not an input
    const_inputs = [
        v for v in fg.variables if isinstance(v, Constant)
    ]
    assert len(const_inputs) >= 1


def test_init_rejects_owned_inputs():
    x = V("x")
    mid = myop(x)
    out = myop(mid)
    with pytest.raises(ValueError, match="owner"):
        FunctionGraph([mid], [out], clone=False)


def test_init_missing_input_raises():
    x, y = V("x"), V("y")
    out = myop(x)
    out2 = myop(y)
    with pytest.raises(MissingInputError):
        FunctionGraph([x], [out, out2], clone=False)


# --- import semantics --------------------------------------------------------------


def test_import_node_undeclared_input_raises():
    x, y = V("x"), V("y")
    fg = FunctionGraph([x], [myop(x)], clone=False)
    stray = myop(y)
    with pytest.raises(MissingInputError):
        fg.import_node(stray.owner, reason="test")


def test_import_missing_adds_input():
    x, y = V("x"), V("y")
    fg = FunctionGraph([x], [myop(x)], clone=False)
    stray = myop(y)
    fg.import_node(stray.owner, reason="test", import_missing=True)
    assert y in fg.inputs
    assert stray.owner in fg.apply_nodes
    fg.check_integrity_if = getattr(fg, "check_integrity", None)


def test_import_var_constant_needs_no_declaration():
    x = V("x")
    fg = FunctionGraph([x], [myop(x)], clone=False)
    c = Constant(T, 7)
    combined = myop(c)
    fg.import_node(combined.owner, reason="test")
    assert c in fg.variables and c not in fg.inputs


def test_import_tags_reason():
    x = V("x")
    fg = FunctionGraph([x], [myop(x)], clone=False)
    extra = myop(x)
    fg.import_node(extra.owner, reason="my_reason")
    assert "my_reason" in extra.owner.tag.imported_by


# --- mutation bookkeeping ------------------------------------------------------------


def test_change_node_input_updates_clients():
    x, y = V("x"), V("y")
    a = myop(x)
    out = myop(a)
    fg = FunctionGraph([x, y], [out], clone=False)
    fg.change_node_input(out.owner, 0, y)
    assert out.owner.inputs[0] is y
    assert (out.owner, 0) in fg.clients[y]
    # a's node became dead and was pruned
    assert a.owner not in fg.apply_nodes
    fg.check_integrity()


def test_change_output_updates_clients():
    x, y = V("x"), V("y")
    out = myop(x)
    fg = FunctionGraph([x, y], [out], clone=False)
    fg.change_node_input(OUTPUT, 0, y)
    assert fg.outputs[0] is y
    assert (OUTPUT, 0) in fg.clients[y]
    assert out.owner not in fg.apply_nodes
    fg.check_integrity()


def test_change_node_input_type_check():
    x = at.vector("x", dtype="float64")
    i = at.iscalar("i")
    out = x * 2
    fg = FunctionGraph([x, i], [out], clone=False)
    with pytest.raises(TypeError):
        fg.change_node_input(out.owner, 0, i)


def test_replace_filters_raw_values():
    x = at.vector("x", dtype="float64")
    out = x * 2
    fg = FunctionGraph([x], [out], clone=False)
    # raw data is converted through x's type into a Constant
    fg.replace(fg.outputs[0], np.zeros(3, dtype=x.dtype))
    assert isinstance(fg.outputs[0], Constant)
    fg.check_integrity()


def test_replace_unknown_var_is_noop():
    x = V("x")
    out = myop(x)
    fg = FunctionGraph([x], [out], clone=False)
    before = set(fg.variables)
    fg.replace(V("stranger"), x)
    assert set(fg.variables) == before


def test_replace_shared_subexpression_all_clients():
    x = V("x")
    a = myop(x)
    o1 = myop(a)
    o2 = myop(a)
    fg = FunctionGraph([x], [o1, o2], clone=False)
    b = myop(myop(x))
    fg.replace(a, b)
    assert o1.owner.inputs[0] is b and o2.owner.inputs[0] is b
    assert a.owner not in fg.apply_nodes
    fg.check_integrity()


def test_multi_output_partial_use_and_prune():
    x = V("x")
    o0, o1 = twoout(x)
    consumer = myop(o0)
    fg = FunctionGraph([x], [consumer], clone=False)
    assert o0.owner in fg.apply_nodes
    assert o1 in fg.variables  # sibling output tracked even if unused
    # replacing the only use prunes the whole node (both outputs)
    fg.replace(consumer, x)
    assert o0.owner not in fg.apply_nodes
    assert o0 not in fg.variables and o1 not in fg.variables
    fg.check_integrity()


def test_remove_node_multi_out_clears_clients():
    x = V("x")
    o0, o1 = twoout(x)
    c0 = myop(o0)
    fg = FunctionGraph([x], [c0], clone=False)
    fg.remove_node(o0.owner)
    assert o0.owner not in fg.apply_nodes
    assert o0 not in fg.variables


def test_contains_variables_and_nodes():
    x = V("x")
    a = myop(x)
    out = myop(a)
    fg = FunctionGraph([x], [out], clone=False)
    assert x in fg and a in fg and out in fg
    assert a.owner in fg and out.owner in fg
    assert V("stranger") not in fg
    assert "not a graph object" not in fg


# --- integrity ------------------------------------------------------------------------


def test_check_integrity_detects_tampering():
    x = V("x")
    a = myop(x)
    out = myop(a)
    fg = FunctionGraph([x], [out], clone=False)
    fg.check_integrity()
    # sever a client edge behind the fgraph's back
    fg.clients[a].clear()
    with pytest.raises(Exception):
        fg.check_integrity()


def test_check_integrity_detects_missing_node():
    x = V("x")
    a = myop(x)
    out = myop(a)
    fg = FunctionGraph([x], [out], clone=False)
    fg.apply_nodes.discard(a.owner)
    with pytest.raises(Exception, match="apply_nodes"):
        fg.check_integrity()


# --- pickling / cloning -----------------------------------------------------------------


def test_pickle_roundtrip_preserves_structure():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    fg = FunctionGraph([x, y], [x * y + 1], clone=True)
    fg2 = pickle.loads(pickle.dumps(fg))
    assert len(fg2.inputs) == 2 and len(fg2.outputs) == 1
    assert len(fg2.apply_nodes) == len(fg.apply_nodes)
    fg2.check_integrity()
    assert str(fg2) == str(fg)


def test_clone_preserves_update_mapping():
    x = at.vector("x", dtype="float64")
    out = x * 2
    fg = FunctionGraph([x], [out], clone=False, update_mapping={0: 0})
    fg2 = fg.clone()
    assert fg2.update_mapping == {0: 0}
    assert fg2.outputs[0] is not out
    fg2.check_integrity()


# --- feature orderings -------------------------------------------------------------------


class _ForceOrder(Feature):
    """Force node_b before node_a via the orderings hook."""

    def __init__(self, after, before):
        self.after = after
        self.before = before

    def orderings(self, fgraph):
        return {self.after: [self.before]}


def test_feature_orderings_drive_toposort():
    x = V("x")
    a = myop(x)
    b = myop(x)
    out = twoout(a)  # keep both alive through one consumer each
    o0, o1 = out
    top = myop(o0)
    fg = FunctionGraph([x], [top, b], clone=False)
    default = fg.toposort()
    fg.attach_feature(_ForceOrder(a.owner, b.owner))
    forced = fg.toposort()
    assert forced.index(b.owner) < forced.index(a.owner)
    assert set(forced) == set(default)
