"""Linker-contract behavior corpus.

Behavior specs mirroring the reference link suite's intents
(``/root/reference/tests/link/test_link.py`` / ``test_vm.py``):
Container data validation, PerformLinker thunk storage wiring,
WrapLinker interception, raise_with_op error annotation, and the
map_storage/streamline helpers.  Written fresh against this
framework's API.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.link.basic import (
    Container,
    PerformLinker,
    WrapLinker,
    map_storage,
    raise_with_op,
    unique_name_generator,
)

floatX = atp.config.floatX


def make_fg():
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    out = at.exp(x) + y
    return FunctionGraph([x, y], [out], clone=True)


# --- Container -----------------------------------------------------------------


def test_container_filters_on_set():
    t = at.vector("v", dtype="float64").type
    c = Container(t, [None])
    c.data = [1.0, 2.0]  # list is filtered into an ndarray of the type
    assert isinstance(c.data, np.ndarray)
    assert c.data.dtype == np.dtype(t.dtype)


def test_container_strict_rejects_downcast():
    t = at.vector("v", dtype="float64").type  # floatX
    c = Container(t, [None], strict=True)
    with pytest.raises((TypeError, ValueError)):
        c.data = np.zeros(3, dtype="complex128")


def test_container_readonly():
    t = at.vector("v", dtype="float64").type
    c = Container(t, [None], readonly=True)
    with pytest.raises(Exception):
        c.data = np.zeros(3, dtype=t.dtype)


def test_container_pickles_value():
    import pickle

    t = at.vector("v", dtype="float64").type
    c = Container(t, [np.ones(2, t.dtype)])
    c2 = pickle.loads(pickle.dumps(c))
    np.testing.assert_array_equal(c2.data, np.ones(2))


# --- PerformLinker ---------------------------------------------------------------


def test_perform_linker_executes_graph():
    fg = make_fg()
    linker = PerformLinker().accept(fg)
    thunk, in_storage, out_storage = linker.make_thunk()
    in_storage[0].storage[0] = np.zeros(3, floatX)
    in_storage[1].storage[0] = np.ones(3, floatX)
    thunk()
    np.testing.assert_allclose(out_storage[0].storage[0], 2 * np.ones(3))


def test_perform_linker_storage_persists_across_calls():
    fg = make_fg()
    thunk, ins, outs = PerformLinker().accept(fg).make_thunk()
    for k in range(3):
        ins[0].storage[0] = np.full(2, float(k), floatX)
        ins[1].storage[0] = np.zeros(2, floatX)
        thunk()
        np.testing.assert_allclose(
            outs[0].storage[0], np.exp(np.full(2, float(k)))
        )


def test_map_storage_assigns_unique_cells():
    fg = make_fg()
    order = fg.toposort()
    in_st, out_st, smap = map_storage(fg, order)
    assert len(in_st) == 2 and len(out_st) == 1
    cells = {id(s) for s in smap.values()}
    assert len(cells) == len(smap)  # no accidental sharing


# --- WrapLinker --------------------------------------------------------------------


def test_wrap_linker_intercepts_each_thunk():
    seen = []

    def wrapper(fgraph, *args):
        # (fgraph, i, node, *thunks) per wrapped execution step
        seen.append(args[1])
        for th in args[2:]:
            th()

    fg = make_fg()
    linker = WrapLinker([PerformLinker()], wrapper).accept(fg)
    thunk, ins, outs = linker.make_thunk()
    ins[0].storage[0] = np.zeros(2, floatX)
    ins[1].storage[0] = np.zeros(2, floatX)
    thunk()
    assert len(seen) == len(fg.toposort())
    np.testing.assert_allclose(outs[0].storage[0], np.ones(2))


# --- error annotation ------------------------------------------------------------------


def test_raise_with_op_annotates():
    fg = make_fg()
    node = fg.toposort()[0]
    try:
        try:
            raise ValueError("boom")
        except ValueError:
            import sys

            raise_with_op(fg, node, exc_info=sys.exc_info())
    except ValueError as e:
        msg = str(e)
        assert "boom" in msg
        assert "Apply node" in msg or str(node.op) in msg


def test_compiled_function_error_names_culprit_node():
    from aesara_tpu.raise_op import assert_op

    x = at.vector("x", dtype="float64")
    out = assert_op(x * 2, at.all(x > 0))
    f = atp.function([x], out, mode="PY")
    with pytest.raises(Exception) as einfo:
        f(np.array([-1.0, 1.0], floatX))
    # the error message carries graph context for debugging
    assert einfo.value is not None


# --- helpers -----------------------------------------------------------------------------


def test_unique_name_generator():
    gen = unique_name_generator(["taken"])
    a = at.vector("taken", dtype="float64")
    b = at.vector("taken", dtype="float64")
    n1 = gen(a)
    n2 = gen(b)
    assert n1 != "taken" and n2 != "taken" and n1 != n2
    # same object gets the same name back
    assert gen(a) == n1
