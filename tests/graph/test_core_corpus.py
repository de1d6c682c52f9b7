"""Graph-core behavior corpus.

Behavior specs covering the reference's graph-core suite intents
(``/root/reference/tests/graph/test_basic.py``, ``test_types.py``,
``test_sched.py``): traversal order contracts, clone aliasing rules,
structural equality, NominalVariable interning, the Type contract, and
the comparator-based scheduler toolkit.  Written fresh against this
framework's API.
"""

import pickle

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.ir import (
    Apply,
    Constant,
    NominalVariable,
    Type,
    Variable,
    ancestors,
    applys_between,
    as_string,
    clone,
    clone_get_equiv,
    clone_replace,
    equal_computations,
    general_toposort,
    get_var_by_name,
    graph_inputs,
    io_connection_pattern,
    io_toposort,
    is_in_ancestors,
    list_of_nodes,
    orphans_between,
    truncated_graph_inputs,
    vars_between,
    view_roots,
    walk,
)
from aesara_tpu.graph.op import Op
from aesara_tpu.graph.sched import (
    key_to_cmp,
    posort,
    reverse_dict,
    sort_apply_nodes,
    sort_schedule_fn,
)
from aesara_tpu.tensor.math import max_and_argmax


class _T(Type):
    """Weight-tagged dummy type: MyOp outputs carry the sum of the input
    tags, so structural positions are observable in type equality."""

    def __init__(self, tag):
        self.tag = tag

    def filter(self, data, strict=False, allow_downcast=None):
        return data

    def __eq__(self, other):
        return type(self) is type(other) and other.tag == self.tag

    def __hash__(self):
        return hash((type(self), self.tag))

    def __str__(self):
        return f"T{self.tag}"


def TV(tag, name=None):
    v = Variable(_T(tag), None, None, name=name)
    return v


class _MyOp(Op):
    __props__ = ()

    def make_node(self, *inputs):
        out = Variable(_T(sum(i.type.tag for i in inputs)), None, None)
        return Apply(self, list(inputs), [out])

    def perform(self, node, inputs, outputs):
        raise NotImplementedError

    def __str__(self):
        return "MyOp"


class _ViewOp(_MyOp):
    view_map = {0: [0]}

    def __str__(self):
        return "ViewOp"


myop = _MyOp()
viewop = _ViewOp()


# --- traversal ---------------------------------------------------------------


def _diamond():
    r1, r2 = TV(1, "r1"), TV(2, "r2")
    a = myop(r1, r2)
    b = myop(a, r1)
    c = myop(a, r2)
    top = myop(b, c)
    return r1, r2, a, b, c, top


def test_walk_bfs_vs_dfs():
    r1, r2 = TV(1), TV(2)
    o1 = myop(r1, r2)
    o2 = myop(TV(3), o1)

    def expand(v):
        return v.owner.inputs if v.owner else None

    bfs = list(walk([o2], expand, bfs=True))
    dfs = list(walk([o2], expand, bfs=False))
    assert bfs[0] is o2 and dfs[0] is o2
    assert set(bfs) == set(dfs)
    # BFS sees o2's direct inputs before o1's inputs
    assert bfs.index(o1) < bfs.index(r1)
    # each node visited exactly once even with shared subexpressions
    shared = myop(o1, o1)
    visits = list(walk([shared], expand))
    assert visits.count(o1) == 1


def test_walk_return_children_yields_pairs():
    r1, r2 = TV(1), TV(2)
    o = myop(r1, r2)

    def expand(v):
        return v.owner.inputs if v.owner else None

    pairs = list(walk([o], expand, bfs=True, return_children=True))
    assert pairs[0][0] is o and list(pairs[0][1]) == [r1, r2]
    assert {p[0] for p in pairs} == {o, r1, r2}


def test_ancestors_and_blockers():
    r1, r2, a, b, c, top = _diamond()
    anc = ancestors([top])
    assert {r1, r2, a, b, c, top} <= set(anc)
    # blocking at a hides everything upstream of a (through a's paths)
    blocked = ancestors([b], blockers=[a])
    assert a in blocked and r2 not in blocked


def test_graph_inputs_and_orphans():
    r1, r2, a, b, c, top = _diamond()
    assert set(graph_inputs([top])) == {r1, r2}
    # treating a as an input makes r1 reachable only via b's direct edge
    orphans = orphans_between([a], [top])
    assert r1 in orphans and r2 in orphans and a not in orphans


def test_vars_and_applys_between():
    r1, r2, a, b, c, top = _diamond()
    vs = vars_between([a], [top])
    assert top in vs and b in vs and c in vs
    nodes = applys_between([a], [top])
    assert {b.owner, c.owner, top.owner} <= set(nodes)
    assert a.owner not in nodes


def test_io_toposort_respects_dependencies():
    r1, r2, a, b, c, top = _diamond()
    order = io_toposort([r1, r2], [top])
    assert order.index(a.owner) < order.index(b.owner)
    assert order.index(a.owner) < order.index(c.owner)
    assert order[-1] is top.owner


def test_io_toposort_inputs_with_owners():
    # when a var WITH an owner is declared an input, its history is cut
    r1 = TV(1)
    mid = myop(r1, r1)
    out = myop(mid, TV(5))
    assert io_toposort([mid], [out]) == [out.owner]


def test_io_toposort_disconnected_and_chain():
    r1, r2, r3, r4 = TV(1), TV(2), TV(3), TV(4)
    o0 = myop(r1, r2)
    o1 = myop(r3, r4)
    both = io_toposort([r1, r2, r3, r4], [o0, o1])
    assert set(both) == {o0.owner, o1.owner}
    # mixed input/output chain: only the un-cut node appears
    chain0 = myop(r1, r2)
    chain1 = myop(chain0, r1)
    assert io_toposort([r1, chain0], [chain0, chain1]) == [chain1.owner]


def test_io_toposort_with_orderings():
    r1 = TV(1)
    a = myop(r1, r1)
    b = myop(r1, r1)
    out = myop(a, b)
    # no data dep between a and b; force b before a via orderings
    order = io_toposort([r1], [out], orderings={a.owner: [b.owner]})
    assert order.index(b.owner) < order.index(a.owner)


def test_general_toposort_cycle_and_clients():
    r1, r2 = TV(1), TV(2)
    o = myop(r1, r2)

    def prenode(obj):
        if isinstance(obj, Variable) and obj.owner:
            return [obj.owner]
        if isinstance(obj, Apply):
            return obj.inputs
        return []

    clients = {}
    res = general_toposort([o], prenode, clients=clients)
    assert res[-1] is o
    assert clients[o.owner] == [o]
    assert o.owner in clients[r1]
    # artificial cycle raises
    with pytest.raises(ValueError):
        general_toposort([o], lambda obj: [o] if obj is r1 else prenode(obj))


def test_list_of_nodes_and_is_in_ancestors():
    r1, r2, a, b, c, top = _diamond()
    nodes = list_of_nodes([r1, r2], [top])
    assert set(nodes) == {a.owner, b.owner, c.owner, top.owner}
    assert is_in_ancestors(top.owner, a.owner)
    assert not is_in_ancestors(a.owner, top.owner)


def test_truncated_graph_inputs():
    r1, r2, a, b, c, top = _diamond()
    # cutting at a: a itself plus the roots reachable around it
    cut = truncated_graph_inputs([top], [a])
    assert a in cut
    assert all(v is a or v.owner is None for v in cut)
    # default: plain graph inputs
    assert set(truncated_graph_inputs([top])) == {r1, r2}


def test_view_roots_through_chain():
    r1 = TV(1)
    v = viewop(viewop(r1, TV(2)), TV(3))
    assert view_roots(v) == [r1]
    d = myop(r1, r1)
    assert view_roots(d) == [d]


# --- clone semantics ----------------------------------------------------------


def test_clone_deep_copy_leaves_original_untouched():
    r1, r2, r5 = TV(1), TV(2), TV(5)
    inner = myop(r1, r2)
    out = myop(inner, r5)
    _, (new_out,) = clone([r1, r2, r5], [out], copy_inputs=False)
    assert new_out is not out
    assert new_out.type == out.type
    assert new_out.owner is not out.owner
    # inputs NOT copied when copy_inputs=False
    assert new_out.owner.inputs[1] is r5
    # intermediate copied deeply
    assert new_out.owner.inputs[0] is not inner
    # mutating the clone leaves the original graph intact
    new_out.owner.inputs[1] = TV(9)
    assert out.owner.inputs[1] is r5


def test_clone_copy_inputs_creates_fresh_roots():
    r1, r2 = TV(1), TV(2)
    out = myop(r1, r2)
    (n1, n2), (new_out,) = clone([r1, r2], [out], copy_inputs=True)
    assert n1 is not r1 and n2 is not r2
    assert new_out.owner.inputs == [n1, n2]


def test_clone_constant_identity():
    c1 = at.constant(1.5)
    for copy_inputs in (True, False):
        for copy_orphans in (True, False, None):
            i, o = clone([c1], [c1], copy_inputs, copy_orphans)
            # constants clone to themselves (Constant.clone returns self)
            assert o[0].equals(c1)


def test_clone_get_equiv_memo_and_coverage():
    r1, r2 = TV(1), TV(2)
    inner = myop(r1, r2)
    out = myop(inner, r1)
    memo = clone_get_equiv([r1, r2], [out], copy_inputs=True)
    assert memo[out].owner.inputs[0] is memo[inner]
    assert memo[out].owner.inputs[1] is memo[r1]
    # pre-seeded memo entries are respected
    stand_in = TV(1)
    memo2 = clone_get_equiv([r1, r2], [out], memo={r1: stand_in})
    assert memo2[out].owner.inputs[1] is stand_in


def test_clone_replace_dict_and_pairs():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    z = x + y
    w = clone_replace(z, {x: y})
    f_in = graph_inputs([w])
    assert set(f_in) == {y}
    # list-of-pairs form
    w2 = clone_replace([z], [(y, x)])[0]
    assert set(graph_inputs([w2])) == {x}


def test_clone_replace_converts_value_types():
    x = at.vector("x", dtype="float64")
    z = x * 2.0
    # raw numpy data is filtered into a constant of x's type
    w = clone_replace(z, {x: np.ones(3, dtype=x.dtype)})
    assert np.allclose(w.eval(), 2.0)


# --- structural equality -------------------------------------------------------


def test_equal_computations_contract():
    a = at.iscalar("a")
    b = at.iscalar("b")
    with pytest.raises(ValueError):
        equal_computations([a], [a, b])
    assert equal_computations([a], [a])
    assert not equal_computations([b], [a])
    assert equal_computations([at.as_tensor(1)], [at.as_tensor(1)])
    assert not equal_computations([at.as_tensor(1)], [at.as_tensor(2)])
    assert equal_computations(
        [at.as_tensor(np.r_[2, 1])], [at.as_tensor(np.r_[2, 1])]
    )
    assert not equal_computations([at.as_tensor(np.r_[2, 1])], [a])


def test_equal_computations_same_structure():
    x = at.matrix("x", dtype="float64")
    e1 = at.exp(x) + x
    e2 = at.exp(x) + x
    assert equal_computations([e1], [e2])
    assert not equal_computations([e1], [at.exp(x) - x])


def test_equal_computations_multi_output():
    m = at.matrix("m", dtype="float64")
    ma1 = max_and_argmax(m)
    ma2 = max_and_argmax(m)
    assert equal_computations(list(ma1), list(ma2))
    # outputs crossed: max vs argmax differ
    assert not equal_computations([ma1[0]], [ma2[1]])


def test_equal_computations_in_mappings():
    x, y = at.vector("x", dtype="float64"), at.vector("y", dtype="float64")
    e1 = x * 2
    e2 = y * 2
    assert not equal_computations([e1], [e2])
    assert equal_computations([e1], [e2], in_xs=[x], in_ys=[y])


# --- NominalVariable -----------------------------------------------------------


def test_nominal_variable_interned():
    t = _T(3)
    n1 = NominalVariable(0, t)
    n2 = NominalVariable(0, _T(3))
    n3 = NominalVariable(1, t)
    assert n1 is n2
    assert n1 is not n3
    assert n1.clone() is n1
    assert n1.owner is None


def test_nominal_variable_pickle_preserves_identity():
    t = _T(7)
    n = NominalVariable(4, t)
    n2 = pickle.loads(pickle.dumps(n))
    assert n2 is n


def test_nominal_variable_equality_hash():
    a = NominalVariable(2, _T(1))
    b = NominalVariable(2, _T(1))
    assert a == b and hash(a) == hash(b)
    assert a != NominalVariable(3, _T(1))


# --- eval + naming --------------------------------------------------------------


def test_variable_eval_caches_and_pickles_clean():
    x = at.scalar("x", dtype="float64")
    y = at.scalar("y", dtype="float64")
    w = 2 * (x + y)
    assert float(w.eval({x: 1.0, y: 2.0})) == 6.0
    assert hasattr(w, "_fn_cache")
    # the compiled-function cache must not survive pickling
    w2 = pickle.loads(pickle.dumps(w))
    assert not hasattr(w2, "_fn_cache")


def test_auto_name_monotonic():
    v1, v2 = TV(1), TV(2)
    i1 = int(v1.auto_name.split("_")[1])
    i2 = int(v2.auto_name.split("_")[1])
    assert i2 == i1 + 1


def test_get_var_by_name():
    x = at.vector("x", dtype="float64")
    y = at.vector("lookup_me", dtype="float64")
    z = x + y
    found = get_var_by_name([z], "lookup_me")
    assert found == (y,)
    assert get_var_by_name([z], "no_such_name") == ()


def test_as_string_renders_structure():
    r1, r2 = TV(1, "r1"), TV(2, "r2")
    o = myop(myop(r1, r2), r2)
    (s,) = as_string([r1, r2], [o])
    assert s == "MyOp(MyOp(r1, r2), r2)"
    # declared inputs cut rendering even when they have owners
    inner = myop(r1, r2)
    inner.name = "cut"
    o2 = myop(inner, r2)
    (s2,) = as_string([inner, r2], [o2])
    assert s2 == "MyOp(cut, r2)"


# --- io_connection_pattern -------------------------------------------------------


def test_io_connection_pattern_diamond():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    z = at.vector("z", dtype="float64")
    out1 = x + y
    out2 = y * z
    pat = io_connection_pattern([x, y, z], [out1, out2])
    assert pat == [[True, False], [True, True], [False, True]]


# --- Type contract ----------------------------------------------------------------


class _Super(_T):
    def is_super(self, otype):
        # any tagged type with a tag divisible by ours is a subtype
        return isinstance(otype, _T) and otype.tag % self.tag == 0


def test_type_contract_is_super_convert():
    base = _Super(2)
    sub = _T(4)
    other = _T(3)
    assert base.is_super(sub)
    assert not base.is_super(other)
    v_sub = Variable(sub, None, None)
    assert base.convert_variable(v_sub) is v_sub
    assert base.convert_variable(Variable(other, None, None)) is None
    # filter_variable passes subtypes through, rejects strangers
    assert base.filter_variable(v_sub) is v_sub
    with pytest.raises(TypeError):
        base.filter_variable(Variable(other, None, None))


def test_type_call_makes_named_variable():
    t = _T(5)
    v = t("named")
    assert v.name == "named" and v.type == t and v.owner is None


def test_constant_signature_distinguishes_values():
    c1 = Constant(_T(1), 5)
    c2 = Constant(_T(1), 5)
    c3 = Constant(_T(1), 6)
    assert c1.equals(c2)
    assert not c1.equals(c3)


# --- scheduler toolkit ---------------------------------------------------------------


def test_reverse_dict():
    d = {"a": (1, 2), "b": (2,)}
    rd = reverse_dict(d)
    assert set(rd[2]) == {"a", "b"} and set(rd[1]) == {"a"}


def test_posort_stable_and_ordered():
    # comparator: even numbers before odd ones; ties keep input order
    def cmp_parity(a, b):
        return (a % 2) - (b % 2)

    res = posort([3, 2, 1, 4], cmp_parity)
    assert res == [2, 4, 3, 1]
    # no comparators: input order preserved
    assert posort([3, 1, 2]) == [3, 1, 2]


def test_key_to_cmp():
    cmp = key_to_cmp(len)
    assert cmp("ab", "abc") < 0 and cmp("abc", "ab") > 0 and cmp("ab", "cd") == 0


def test_sort_apply_nodes_with_comparator():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    a = x + y
    b = x * y
    out = a - b

    # prefer Mul nodes first among free choices
    def muls_first(n1, n2):
        from aesara_tpu.tensor.elemwise import Elemwise

        def is_mul(n):
            return isinstance(n.op, Elemwise) and type(n.op.scalar_op).__name__ == "Mul"

        return (not is_mul(n1)) - (not is_mul(n2))

    order = sort_apply_nodes([x, y], [out], [muls_first])
    assert order.index(b.owner) < order.index(a.owner)
    assert order[-1] is out.owner
    # sort_schedule_fn wraps the same comparators into a scheduler
    sched = sort_schedule_fn(muls_first)
    fg_order = sched is not None
    assert fg_order
