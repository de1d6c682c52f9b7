"""Destroy-handler legality behavior corpus.

Behavior specs mirroring the intents of the reference's destroy-handler
suite (``/root/reference/tests/graph/test_destroyhandler.py``): view-chain
root tracking (droot), destroy races, protected inputs reached through
views, usage-loop cycles, and reader-before-destroyer orderings.  All
cases are written fresh against this framework's Feature API.
"""

import pytest

from aesara_tpu.graph.destroyhandler import (
    DestroyHandler,
    InconsistencyError,
    Supervisor,
    droot,
    fast_inplace_check,
)
from aesara_tpu.graph.features import ReplaceValidate
from aesara_tpu.graph.fg import FunctionGraph
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


class _Base(Op):
    __props__ = ()
    nin = 1

    def make_node(self, *inputs):
        return Apply(self, list(inputs), [V()])

    def perform(self, node, inputs, outputs):
        outputs[0][0] = inputs[0]

    def __str__(self):
        return type(self).__name__


class Plain(_Base):
    """Reads its inputs, aliases nothing."""


class ViewOp(_Base):
    view_map = {0: [0]}


class DestroyOp(_Base):
    destroy_map = {0: [0]}


class DestroySecond(_Base):
    nin = 2
    destroy_map = {0: [1]}


plain, view, destroy = Plain(), ViewOp(), DestroyOp()
destroy_second = DestroySecond()


def make_fg(inputs, outputs, protected=()):
    fg = FunctionGraph(inputs, outputs, clone=False)
    fg.attach_feature(ReplaceValidate())
    fg.attach_feature(DestroyHandler())
    if protected:
        fg.attach_feature(Supervisor(protected))
    return fg


def test_droot_follows_view_chain():
    x = V("x")
    v1 = view(x)
    v2 = view(v1)
    assert droot(v2) is x
    assert droot(v1) is x
    assert droot(x) is x
    # destroy_map output is NOT a view for root purposes
    d = destroy(x)
    assert droot(d) is d


def test_single_destroyer_valid_and_ordered():
    x = V("x")
    r = plain(x)  # reader of x
    d = destroy(x)
    fg = make_fg([x], [r, d])
    fg.validate()  # legal
    topo = fg.toposort()
    assert topo.index(r.owner) < topo.index(d.owner)


def test_two_destroyers_of_same_variable_race():
    x = V("x")
    d1 = destroy(x)
    d2 = destroy(x)
    fg = make_fg([x], [d1, d2])
    with pytest.raises(InconsistencyError, match="multiple"):
        fg.validate()


def test_two_destroyers_of_same_root_through_views_race():
    x = V("x")
    v1 = view(x)
    v2 = view(x)
    d1 = destroy(v1)
    d2 = destroy(v2)
    fg = make_fg([x], [d1, d2])
    with pytest.raises(InconsistencyError, match="multiple"):
        fg.validate()


def test_destroy_view_and_root_race():
    x = V("x")
    v = view(x)
    d1 = destroy(x)
    d2 = destroy(v)
    fg = make_fg([x], [d1, d2])
    with pytest.raises(InconsistencyError, match="multiple"):
        fg.validate()


def test_chain_of_destroyers_is_legal():
    # d2 destroys d1's OUTPUT — a fresh root, ordered by the data dep.
    x = V("x")
    d1 = destroy(x)
    d2 = destroy(d1)
    fg = make_fg([x], [d2])
    fg.validate()
    topo = fg.toposort()
    assert topo.index(d1.owner) < topo.index(d2.owner)


def test_protected_input_destroyed_directly():
    x = V("x")
    d = destroy(x)
    fg = make_fg([x], [d], protected=[x])
    with pytest.raises(InconsistencyError, match="protected"):
        fg.validate()


def test_protected_input_destroyed_through_view():
    x = V("x")
    v = view(x)
    d = destroy(v)
    fg = make_fg([x], [d], protected=[x])
    with pytest.raises(InconsistencyError):
        fg.validate()


def test_protected_input_destroyed_through_deep_view_chain():
    x = V("x")
    v = view(view(view(x)))
    d = destroy(v)
    fg = make_fg([x], [d], protected=[x])
    with pytest.raises(InconsistencyError):
        fg.validate()


def test_unprotected_view_destruction_is_legal():
    x = V("x")
    v = view(x)
    d = destroy(v)
    fg = make_fg([x], [d])
    fg.validate()


def test_destroying_constant_through_view_raises():
    c = Constant(T, 42)
    v = view(c)
    d = destroy(v)
    x = V("x")
    r = plain(x)
    fg = make_fg([x], [r, d])
    with pytest.raises(InconsistencyError, match="constant"):
        fg.validate()


def test_usage_loop_is_a_cycle():
    # u reads both x and the destroyer's output: readers-before-destroyer
    # says u < d, the data dep says d < u -> cycle.
    x = V("x")
    d = destroy(x)
    u = destroy_second(x, d)
    fg = make_fg([x], [u])
    with pytest.raises(InconsistencyError, match="cycle"):
        fg.validate()


def test_reader_of_view_ordered_before_root_destroyer():
    x = V("x")
    v = view(x)
    r = plain(v)  # reads x's storage through the view
    d = destroy(x)
    fg = make_fg([x], [r, d])
    fg.validate()
    topo = fg.toposort()
    assert topo.index(v.owner) < topo.index(d.owner)
    assert topo.index(r.owner) < topo.index(d.owner)


def test_reader_of_root_ordered_before_view_destroyer():
    x = V("x")
    r = plain(x)
    v = view(x)
    d = destroy(v)
    fg = make_fg([x], [r, d])
    fg.validate()
    topo = fg.toposort()
    assert topo.index(r.owner) < topo.index(d.owner)


def test_destroyers_view_aware_lookup():
    x = V("x")
    v = view(x)
    d = destroy(v)
    fg = make_fg([x], [d])
    # destroying the view destroys x; the view itself is also dead
    assert fg.destroyers(x) == [d.owner]
    assert fg.destroyers(v) == [d.owner]
    assert fg.has_destroyers([x])
    assert not fg.has_destroyers([d])


def test_prune_clears_destroyer():
    x = V("x")
    d = destroy(x)
    fg = make_fg([x], [d])
    assert fg.destroyers(x)
    # replacing the output with a non-destructive computation prunes d
    fg.replace_validate(d, plain(x))
    assert fg.destroyers(x) == []
    fg.validate()


def test_replace_validate_reverts_on_race():
    x = V("x")
    d1 = destroy(x)
    r = plain(x)
    fg = make_fg([x], [d1, r])
    fg.validate()
    # introducing a second destroyer must be rejected and reverted
    with pytest.raises(InconsistencyError):
        fg.replace_validate(r, destroy(x))
    assert r in fg.variables
    fg.validate()


def test_second_input_destroyed():
    x, y = V("x"), V("y")
    d = destroy_second(x, y)
    fg = make_fg([x, y], [d], protected=[y])
    with pytest.raises(InconsistencyError, match="protected"):
        fg.validate()
    fg2 = make_fg([x, y], [destroy_second(x, y)], protected=[x])
    fg2.validate()  # only y is destroyed; protecting x is fine


def test_fast_inplace_check_excludes_outputs_and_protected():
    x = V("x")
    a = plain(x)
    b = plain(a)
    fg = make_fg([x], [b], protected=[x])
    cands = fast_inplace_check(fg, [x, a, b])
    assert a in cands
    assert x not in cands  # protected and ownerless
    assert b not in cands  # fgraph output


def test_compiled_inplace_never_destroys_input_through_view():
    """Compile-level regression: gemm inplace accumulation must not pick a
    z that is a view of a protected function input (e.g. x[::-1]) — the
    runtime write would clobber the caller's buffer through the view."""
    import numpy as np

    import aesara_tpu as atp
    import aesara_tpu.tensor as att

    x = att.matrix("x")
    a = att.matrix("a")
    b = att.matrix("b")
    out = att.dot(a, b) * 0.5 + x[::-1]
    f = atp.function([x, a, b], out, mode="FAST_RUN")
    xv = np.arange(12, dtype=atp.config.floatX).reshape(3, 4)
    av = np.ones((3, 2), dtype=atp.config.floatX)
    bv = np.ones((2, 4), dtype=atp.config.floatX)
    keep = xv.copy()
    res = f(xv, av, bv)
    np.testing.assert_allclose(res, av @ bv * 0.5 + keep[::-1], rtol=1e-5)
    np.testing.assert_array_equal(xv, keep)  # input untouched


def test_fgraph_clone_gets_fresh_handler():
    """Review regression: cloning an fgraph must NOT rebind/reset the
    original's DestroyHandler (Feature.clone defaulting to self did)."""
    x = V("x")
    d = destroy(x)
    fg = make_fg([x], [d])
    assert fg.destroyers(x) == [d.owner]
    fg2, _ = fg.clone_get_equiv()
    # original tracking intact after the clone attached its features
    assert fg.destroyers(x) == [d.owner]
    assert fg.destroy_handler.fgraph is fg
    # the clone tracks its own destroyer, not the original's
    assert fg2.destroy_handler is not fg.destroy_handler
    (d2,) = [n for n in fg2.apply_nodes if isinstance(n.op, DestroyOp)]
    assert fg2.destroyers(fg2.inputs[0]) == [d2]
    fg.validate()
    fg2.validate()


# ---------------------------------------------------------------------------
# Input aliasing (reference destroyhandler.py:783-806): a destroyer whose
# OTHER inputs alias the destroyed root reads a buffer it clobbers in-place.
# ---------------------------------------------------------------------------


class DestroyFirstBin(_Base):
    nin = 2
    destroy_map = {0: [0]}

    def make_node(self, a, b):
        return Apply(self, [a, b], [V()])


class DestroyFirstBinTolerateSame(DestroyFirstBin):
    destroyhandler_tolerate_same = [(0, 1)]


class DestroyFirstBinTolerateAliased(DestroyFirstBin):
    destroyhandler_tolerate_aliased = [(0, 1)]


dbin = DestroyFirstBin()
dbin_same = DestroyFirstBinTolerateSame()
dbin_aliased = DestroyFirstBinTolerateAliased()


def test_input_aliasing_same_variable_rejected():
    t = V("t")
    out = dbin(t, t)
    fg = make_fg([t], [out])
    with pytest.raises(InconsistencyError, match="Input aliasing"):
        fg.validate()


def test_input_aliasing_through_views_rejected():
    t = V("t")
    out = dbin(view(t), view(t))
    fg = make_fg([t], [out])
    with pytest.raises(InconsistencyError, match="Input aliasing"):
        fg.validate()


def test_input_aliasing_destroyed_view_other_view_rejected():
    # destroys a view of t while also reading a sibling view of t
    t = V("t")
    out = dbin(view(t), t)
    fg = make_fg([t], [out])
    with pytest.raises(InconsistencyError, match="Input aliasing"):
        fg.validate()


def test_tolerate_same_allows_identical_variable():
    t = V("t")
    out = dbin_same(t, t)
    fg = make_fg([t], [out])
    fg.validate()  # op declares (0, 1) may be the same variable


def test_tolerate_same_does_not_allow_mere_aliases():
    # tolerate_same permits the IDENTICAL variable only, not sibling views
    t = V("t")
    out = dbin_same(view(t), view(t))
    fg = make_fg([t], [out])
    with pytest.raises(InconsistencyError, match="Input aliasing"):
        fg.validate()


def test_tolerate_aliased_allows_sibling_views():
    t = V("t")
    out = dbin_aliased(view(t), view(t))
    fg = make_fg([t], [out])
    fg.validate()


def test_unrelated_inputs_still_fine():
    t, u = V("t"), V("u")
    out = dbin(t, u)
    fg = make_fg([t, u], [out])
    fg.validate()


class DestroyBoth(_Base):
    nin = 2
    destroy_map = {0: [0], 1: [1]}

    def make_node(self, a, b):
        return Apply(self, [a, b], [V(), V()])


def test_destroyers_deduped_for_multi_destroy_node():
    # one Apply destroying two DIFFERENT roots appears once per root and
    # never twice in a destroyers() answer (advisor r3 dedup finding)
    t, u = V("t"), V("u")
    o1, o2 = DestroyBoth()(t, u)
    fg = make_fg([t, u], [o1, o2])
    (dst_t,) = fg.destroyers(t)
    assert fg.destroyers(t).count(dst_t) == 1
    assert fg.destroyers(u) == [dst_t]
    fg.validate()
