"""Differential indexing/extra_ops/slinalg value sweep vs NumPy/SciPy
(reference tests/tensor/test_subtensor.py + test_extra_ops.py +
test_slinalg.py breadth, consolidated)."""

import numpy as np
import pytest
from scipy import linalg as spla

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.slinalg as sl


rng = np.random.default_rng(0)
MV = rng.normal(size=(5, 7)).astype("float64")

IDX_CASES = [
    ("basic", lambda x: x[1:4, ::2], lambda a: a[1:4, ::2]),
    ("negstep", lambda x: x[::-1, ::-2], lambda a: a[::-1, ::-2]),
    ("newaxis", lambda x: x[None, :, None, 2], lambda a: a[None, :, None, 2]),
    ("ellipsis", lambda x: x[..., 1], lambda a: a[..., 1]),
    ("intslice", lambda x: x[2, 1:5], lambda a: a[2, 1:5]),
    ("intvec", lambda x: x[np.array([4, 0, 4])],
     lambda a: a[np.array([4, 0, 4])]),
    ("twovecs", lambda x: x[np.array([1, 2]), np.array([3, 0])],
     lambda a: a[np.array([1, 2]), np.array([3, 0])]),
    ("boolmask", lambda x: x[np.array([True, False, True, False, True])],
     lambda a: a[np.array([True, False, True, False, True])]),
    ("intmat", lambda x: x[np.array([[0, 1], [2, 3]])],
     lambda a: a[np.array([[0, 1], [2, 3]])]),
    ("mixed", lambda x: x[1:, np.array([0, 6, 3])],
     lambda a: a[1:, np.array([0, 6, 3])]),
]


@pytest.mark.parametrize("name,sym,ref", IDX_CASES, ids=[c[0] for c in IDX_CASES])
def test_indexing_matches_numpy(name, sym, ref):
    M = at.matrix("M", dtype="float64")
    exp = ref(MV)
    for mode in ("PY", None):
        f = atp.function([M], sym(M), mode=mode)
        got = np.asarray(f(MV))
        assert got.shape == exp.shape, (name, mode)
        assert np.allclose(got, exp, atol=1e-6), (name, mode)


def test_extra_ops_values():
    v = at.vector("v", dtype="float64")
    vv = rng.normal(size=9)
    f = atp.function(
        [v], at.searchsorted(at.sort(v),
                             at.as_tensor_variable(np.array([0.0, 1.0]))),
        mode="PY")
    assert np.array_equal(f(vv), np.searchsorted(np.sort(vv), [0.0, 1.0]))

    outs = at.unravel_index(at.as_tensor_variable(np.array([7, 13])), (5, 7))
    g = atp.function([], list(outs), mode="PY")
    assert all(np.array_equal(a, b)
               for a, b in zip(g(), np.unravel_index([7, 13], (5, 7))))

    r = at.ravel_multi_index(
        (at.as_tensor_variable(np.array([1, 2])),
         at.as_tensor_variable(np.array([3, 4]))), (5, 7))
    assert np.array_equal(atp.function([], r, mode="PY")(),
                          np.ravel_multi_index(([1, 2], [3, 4]), (5, 7)))

    b = at.bincount(at.as_tensor_variable(np.array([0, 1, 1, 3])))
    assert np.array_equal(atp.function([], b, mode="PY")(),
                          np.bincount([0, 1, 1, 3]))

    M = at.matrix("M", dtype="float64")
    d = atp.function([M], at.diff(M, n=2, axis=1), mode="PY")
    assert np.allclose(d(MV), np.diff(MV, n=2, axis=1))


def test_slinalg_values():
    A = at.matrix("A", dtype="float64")
    Av = rng.normal(size=(4, 4)) * 0.3
    fe = atp.function([A], sl.expm(A), mode="PY")
    assert np.allclose(fe(Av), spla.expm(Av), atol=1e-8)

    Q = at.matrix("Q", dtype="float64")
    Qv = np.eye(4)
    As = -np.eye(4) * 2 + rng.normal(size=(4, 4)) * 0.1
    fl = atp.function([A, Q], sl.solve_continuous_lyapunov(A, Q), mode="PY")
    X = fl(As, Qv)
    assert np.abs(As @ X + X @ As.T - Qv).max() < 1e-8


def test_advanced_inc_set_duplicates():
    M = at.matrix("M", dtype="float64")
    Mv = np.zeros((4, 5))
    idx = np.array([1, 3, 1])
    exp_set = Mv.copy()
    exp_set[idx] = 7.0
    exp_inc = Mv.copy()
    np.add.at(exp_inc, idx, 1.0)
    for mode in ("PY", None):
        fset = atp.function([M], at.set_subtensor(M[idx], 7.0), mode=mode)
        assert np.allclose(np.asarray(fset(Mv)), exp_set)
        finc = atp.function([M], at.inc_subtensor(M[idx], 1.0), mode=mode)
        assert np.allclose(np.asarray(finc(Mv)), exp_inc, atol=1e-6)
