import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.typed_list import (
    TypedListType, append, count, extend, getitem, insert, length,
    make_list, remove, reverse,
)
from tests.utils import py_mode


def test_roundtrip_ops():
    t = TypedListType(at.TensorType("float64", (None,)))
    x = t("x")
    y = at.vector("y", dtype="float64")
    out = append(x, y)
    f = function([x, y], length(out), mode=py_mode)
    assert f([np.arange(3.0)], np.ones(2)) == 2

    f2 = function([x, y], getitem(append(x, y), 1), mode=py_mode)
    np.testing.assert_allclose(f2([np.arange(3.0)], np.ones(2)), np.ones(2))


def test_make_list_reverse_count():
    a = at.vector("a", dtype="float64")
    b = at.vector("b", dtype="float64")
    lst = make_list([a, b, a])
    f = function([a, b], [length(lst), count(lst, a), getitem(reverse(lst), 0)],
                 mode=py_mode)
    av, bv = np.arange(2.0), np.ones(2)
    n, c, first = f(av, bv)
    assert n == 3 and c == 2
    np.testing.assert_allclose(first, av)


def test_insert_remove_extend():
    t = TypedListType(at.TensorType("float64", (None,)))
    x = t("x")
    y = t("y")
    a = at.vector("a", dtype="float64")
    f = function([x, y], length(extend(x, y)), mode=py_mode)
    assert f([np.ones(1)], [np.ones(1), np.zeros(1)]) == 3
    g = function([x, a], getitem(insert(x, at.constant(0, dtype="int64"), a), 0),
                 mode=py_mode)
    np.testing.assert_allclose(g([np.zeros(2)], np.ones(2)), np.ones(2))
    h = function([x, a], length(remove(x, a)), mode=py_mode)
    assert h([np.ones(2), np.zeros(2)], np.ones(2)) == 1
