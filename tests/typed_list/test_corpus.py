"""TypedList behavior corpus.

Behavior specs mirroring the reference typed_list suite's intents
(``/root/reference/tests/typed_list/test_basic.py`` / ``test_type.py``):
nested list types, the operator sugar on TypedListVariable, python-list
semantics of every op (append/extend/insert/remove/reverse/count/index),
static slicing, type checking at build time, and constants.  Written
fresh against this framework's API.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.typed_list import (
    TypedListType,
    append,
    count,
    extend,
    getitem,
    index_,
    insert,
    length,
    make_list,
    remove,
    reverse,
)
from tests.utils import py_mode


def vec_list_type():
    return TypedListType(at.TensorType("float64", (None,)))


def run(inputs, outputs, vals):
    f = function(inputs, outputs, mode=py_mode)
    return f(*vals)


# --- type contract -----------------------------------------------------------------


def test_type_filter_accepts_only_lists():
    t = vec_list_type()
    ok = t.filter([np.arange(3.0), np.zeros(2)])
    assert len(ok) == 2
    with pytest.raises(TypeError):
        t.filter(np.arange(3.0))


def test_type_filter_validates_elements():
    t = vec_list_type()
    with pytest.raises(TypeError):
        t.filter([np.zeros((2, 2))], strict=True)  # matrix in a vector list


def test_type_equality_and_str():
    t1 = vec_list_type()
    t2 = vec_list_type()
    t3 = TypedListType(at.TensorType("float32", (None,)))
    assert t1 == t2 and hash(t1) == hash(t2)
    assert t1 != t3
    assert "TypedList" in str(t1)


def test_nested_depth():
    base = at.TensorType("float64", (None,))
    nested = TypedListType(base, depth=1)
    assert nested.get_depth() == 1
    assert nested.ttype == TypedListType(base)
    # filter: list of lists of vectors
    ok = nested.filter([[np.zeros(2)], [np.ones(1), np.ones(3)]])
    assert len(ok) == 2 and len(ok[1]) == 2
    with pytest.raises(TypeError):
        nested.filter([np.zeros(2)])  # not nested enough


def test_values_eq():
    t = vec_list_type()
    a = [np.arange(3.0)]
    b = [np.arange(3.0)]
    c = [np.arange(3.0), np.zeros(1)]
    assert t.values_eq(a, b)
    assert not t.values_eq(a, c)


# --- op semantics (python-list oracle) -------------------------------------------------


def test_append_semantics():
    t = vec_list_type()
    x = t("x")
    y = at.dvector("y")
    out = append(x, y)
    res = run([x, y], out, [[np.zeros(2)], np.ones(3)])
    assert len(res) == 2
    np.testing.assert_array_equal(res[1], np.ones(3))


def test_extend_semantics_and_type_check():
    t = vec_list_type()
    x, y = t("x"), t("y")
    res = run([x, y], extend(x, y), [[np.zeros(1)], [np.ones(2), np.ones(1)]])
    assert len(res) == 3
    other = TypedListType(at.TensorType("float32", (None,)))("o")
    with pytest.raises(TypeError):
        extend(x, other)


def test_insert_at_positions():
    t = vec_list_type()
    x = t("x")
    i = at.lscalar("i")
    e = at.dvector("e")
    out = insert(x, i, e)
    base = [np.zeros(1), np.ones(1)]
    mid = run([x, i, e], out, [base, np.asarray(1), np.full(1, 7.0)])
    assert [v[0] for v in mid] == [0.0, 7.0, 1.0]
    # negative index follows python list.insert
    neg = run([x, i, e], out, [base, np.asarray(-1), np.full(1, 7.0)])
    assert [v[0] for v in neg] == [0.0, 7.0, 1.0]


def test_remove_first_match_only():
    t = vec_list_type()
    x = t("x")
    e = at.dvector("e")
    out = remove(x, e)
    base = [np.ones(1), np.zeros(1), np.ones(1)]
    res = run([x, e], out, [base, np.ones(1)])
    assert len(res) == 2
    assert res[0][0] == 0.0 and res[1][0] == 1.0


def test_remove_missing_raises():
    t = vec_list_type()
    x = t("x")
    e = at.dvector("e")
    f = function([x, e], remove(x, e), mode=py_mode)
    with pytest.raises(Exception):
        f([np.zeros(1)], np.full(1, 9.0))


def test_reverse_and_length():
    t = vec_list_type()
    x = t("x")
    rev, n = run(
        [x], [reverse(x), length(x)],
        [[np.full(1, 1.0), np.full(1, 2.0), np.full(1, 3.0)]],
    )
    assert [v[0] for v in rev] == [3.0, 2.0, 1.0]
    assert n == 3


def test_count_and_index():
    t = vec_list_type()
    x = t("x")
    e = at.dvector("e")
    c, i = run(
        [x, e], [count(x, e), index_(x, e)],
        [[np.ones(2), np.zeros(2), np.ones(2)], np.ones(2)],
    )
    assert c == 2 and i == 0


def test_index_missing_raises():
    t = vec_list_type()
    x = t("x")
    e = at.dvector("e")
    f = function([x, e], index_(x, e), mode=py_mode)
    with pytest.raises(Exception):
        f([np.zeros(2)], np.full(2, 5.0))


def test_getitem_int_and_negative():
    t = vec_list_type()
    x = t("x")
    i = at.lscalar("i")
    out = getitem(x, i)
    base = [np.full(1, 10.0), np.full(1, 20.0)]
    assert run([x, i], out, [base, np.asarray(1)])[0] == 20.0
    assert run([x, i], out, [base, np.asarray(-1)])[0] == 20.0


def test_getitem_static_slice():
    t = vec_list_type()
    x = t("x")
    out = getitem(x, slice(1, 3))
    base = [np.full(1, float(k)) for k in range(4)]
    res = run([x], out, [base])
    assert [v[0] for v in res] == [1.0, 2.0]
    # reversing slice
    res2 = run([x], getitem(x, slice(None, None, -1)), [base])
    assert [v[0] for v in res2] == [3.0, 2.0, 1.0, 0.0]


def test_getitem_symbolic_slice_bounds_rejected():
    t = vec_list_type()
    x = t("x")
    i = at.lscalar("i")
    with pytest.raises(TypeError):
        getitem(x, slice(i, None))


def test_make_list_type_consistency():
    a = at.dvector("a")
    b = at.dmatrix("b")
    with pytest.raises(TypeError):
        make_list([a, b])
    with pytest.raises(ValueError):
        make_list([])


# --- operator sugar ---------------------------------------------------------------------


def test_variable_method_sugar():
    t = vec_list_type()
    x = t("x")
    e = at.dvector("e")
    assert x.ttype == at.TensorType("float64", (None,))
    outs = [
        x.append(e),
        x.reverse(),
        x.count(e),
        x.ind(e),  # `index` is the Variable output-position slot
        x[at.as_tensor(0)],
    ]
    base = [np.ones(1)]
    appended, rev, c, i, first = run([x, e], outs, [base, np.ones(1)])
    assert len(appended) == 2
    assert len(rev) == 1
    assert c == 1 and i == 0
    assert first[0] == 1.0


def test_len_is_symbolic_only():
    t = vec_list_type()
    x = t("x")
    with pytest.raises(TypeError):
        len(x)


def test_chained_expression():
    # reverse(insert(append(x, e), 0, e2))[0] behaves like python lists
    t = vec_list_type()
    x = t("x")
    e = at.dvector("e")
    e2 = at.dvector("e2")
    out = getitem(reverse(insert(append(x, e), at.as_tensor(0), e2)), at.as_tensor(0))
    res = run(
        [x, e, e2], out,
        [[np.full(1, 1.0)], np.full(1, 2.0), np.full(1, 3.0)],
    )
    assert res[0] == 2.0  # appended elem ends up first after reverse
