"""set_subtensor / inc_subtensor case matrices (VERDICT r3 #5): every
index kind × set/inc × duplicate-index semantics × broadcast rhs,
differential py-vs-XLA, with gradient checks wrt both the destination
and the replacement — the reference's ``test_inc_subtensor`` matrices
(``/root/reference/tests/tensor/test_subtensor.py``) re-expressed.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker
from tests.unittest_tools import verify_grad

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)
MODES = [(PY, "py"), (JAX, "jax")]

rng = np.random.default_rng(606)


def d(*shape):
    return rng.normal(size=shape)


def _dual(ins, out, feeds, expect, err=""):
    for mode, label in MODES:
        f = function(ins, out, mode=mode)
        r = np.asarray(f(*feeds))
        np.testing.assert_allclose(r, expect, rtol=1e-12,
                                   err_msg=f"{err} backend={label}")


IDX_KINDS = [
    ("basic_slice", lambda x: x[1:3],
     lambda a, y: _np_set(a, np.s_[1:3], y), (2, 4)),
    ("step_slice", lambda x: x[::2],
     lambda a, y: _np_set(a, np.s_[::2], y), (2, 4)),
    ("neg_slice", lambda x: x[-2:],
     lambda a, y: _np_set(a, np.s_[-2:], y), (2, 4)),
    ("scalar_row", lambda x: x[1],
     lambda a, y: _np_set(a, 1, y), (4,)),
    ("scalar_cell", lambda x: x[1, 2],
     lambda a, y: _np_set(a, (1, 2), y), ()),
    ("col_slice", lambda x: x[:, 1:2],
     lambda a, y: _np_set(a, np.s_[:, 1:2], y), (3, 1)),
    ("int_vec", lambda x: x[at.as_tensor_variable(np.array([0, 2]))],
     lambda a, y: _np_set(a, np.array([0, 2]), y), (2, 4)),
    ("bool_mask", lambda x: x[at.as_tensor_variable(
        np.array([True, False, True]))],
     lambda a, y: _np_set(a, np.array([True, False, True]), y), (2, 4)),
    ("two_vecs", lambda x: x[at.as_tensor_variable(np.array([0, 1])),
                             at.as_tensor_variable(np.array([1, 3]))],
     lambda a, y: _np_set(a, (np.array([0, 1]), np.array([1, 3])), y),
     (2,)),
]


def _np_set(a, idx, y):
    out = a.copy()
    out[idx] = y
    return out


def _np_inc(a, idx, y):
    out = a.copy()
    np.add.at(out, idx, y)
    return out


@pytest.mark.parametrize("name,sub_of,np_set,y_shape", IDX_KINDS,
                         ids=[k[0] for k in IDX_KINDS])
def test_set_subtensor_kinds(name, sub_of, np_set, y_shape):
    av = d(3, 4)
    yv = d(*y_shape) if y_shape else np.float64(7.5)
    x = at.matrix("x", dtype="float64")
    out = at.set_subtensor(sub_of(x), at.as_tensor_variable(yv))
    _dual([x], out, [av], _np_set(av, _raw_idx(name), yv), err=name)


@pytest.mark.parametrize("name,sub_of,np_set,y_shape", IDX_KINDS,
                         ids=[k[0] for k in IDX_KINDS])
def test_inc_subtensor_kinds(name, sub_of, np_set, y_shape):
    av = d(3, 4)
    yv = d(*y_shape) if y_shape else np.float64(7.5)
    x = at.matrix("x", dtype="float64")
    out = at.inc_subtensor(sub_of(x), at.as_tensor_variable(yv))
    _dual([x], out, [av], _np_inc(av, _raw_idx(name), yv), err=name)


def _raw_idx(name):
    return {
        "basic_slice": np.s_[1:3],
        "step_slice": np.s_[::2],
        "neg_slice": np.s_[-2:],
        "scalar_row": 1,
        "scalar_cell": (1, 2),
        "col_slice": np.s_[:, 1:2],
        "int_vec": np.array([0, 2]),
        "bool_mask": np.array([True, False, True]),
        "two_vecs": (np.array([0, 1]), np.array([1, 3])),
    }[name]


class TestDuplicateIndices:
    """inc accumulates per occurrence; set resolves to SOME occurrence
    — both backends must agree with numpy's np.add.at for inc."""

    def test_inc_duplicates_accumulate(self):
        av = np.zeros(5)
        idx = np.array([1, 1, 1, 3])
        x = at.vector("x", dtype="float64")
        out = at.inc_subtensor(x[at.as_tensor_variable(idx)], 1.0)
        expect = np.zeros(5)
        np.add.at(expect, idx, 1.0)
        _dual([x], out, [av], expect, err="inc dup")

    def test_inc_duplicates_with_values(self):
        av = d(4)
        idx = np.array([2, 2, 0])
        yv = np.array([1.0, 10.0, 100.0])
        x = at.vector("x", dtype="float64")
        out = at.inc_subtensor(x[at.as_tensor_variable(idx)],
                               at.as_tensor_variable(yv))
        expect = av.copy()
        np.add.at(expect, idx, yv)
        _dual([x], out, [av], expect, err="inc dup vals")


class TestBroadcastRhs:
    def test_scalar_into_slice(self):
        av = d(4, 3)
        x = at.matrix("x", dtype="float64")
        out = at.set_subtensor(x[1:3], 0.0)
        expect = av.copy()
        expect[1:3] = 0.0
        _dual([x], out, [av], expect, err="scalar rhs")

    def test_row_into_rows(self):
        av = d(4, 3)
        yv = d(1, 3)
        x = at.matrix("x", dtype="float64")
        out = at.inc_subtensor(x[::2], at.as_tensor_variable(yv))
        expect = av.copy()
        expect[::2] += yv
        _dual([x], out, [av], expect, err="row rhs")

    def test_vector_into_gathered_rows(self):
        av = d(5, 3)
        yv = d(3)
        idx = np.array([4, 0])
        x = at.matrix("x", dtype="float64")
        out = at.set_subtensor(x[at.as_tensor_variable(idx)],
                               at.as_tensor_variable(yv))
        expect = av.copy()
        expect[idx] = yv
        _dual([x], out, [av], expect, err="vec rhs")


class TestWriteGrads:
    @pytest.mark.parametrize("kind", ["set", "inc"])
    def test_grad_wrt_dest_and_repl_slice(self, kind):
        op = at.set_subtensor if kind == "set" else at.inc_subtensor

        verify_grad(lambda a, y: op(a[1:3], y).sum(), [d(4, 3), d(2, 3)])

    @pytest.mark.parametrize("kind", ["set", "inc"])
    def test_grad_wrt_dest_and_repl_adv(self, kind):
        op = at.set_subtensor if kind == "set" else at.inc_subtensor
        # duplicates only for inc: set+duplicates has last-write-wins
        # value semantics, so its grad wrt y is not well-defined there
        # (same caveat as the reference's AdvancedIncSubtensor grad)
        idx_np = np.array([0, 2, 2]) if kind == "inc" else np.array([0, 2, 3])
        idx = at.as_tensor_variable(idx_np)

        verify_grad(lambda a, y: op(a[idx], y).sum(), [d(4, 3), d(3, 3)])

    def test_grad_set_blocks_dest_path(self):
        """set overwrites: the destination's grad through the written
        region is ZERO; inc keeps it."""
        from aesara_tpu.gradient import grad

        a = at.vector("a", dtype="float64")
        y = at.as_tensor_variable(d(2))
        g_set = grad(at.set_subtensor(a[:2], y).sum(), a)
        g_inc = grad(at.inc_subtensor(a[:2], y).sum(), a)
        f = function([a], [g_set, g_inc], mode=PY)
        gs, gi = f(d(4))
        np.testing.assert_allclose(np.asarray(gs), [0.0, 0.0, 1.0, 1.0])
        np.testing.assert_allclose(np.asarray(gi), [1.0, 1.0, 1.0, 1.0])

    def test_grad_through_nested_writes(self):
        verify_grad(
            lambda a, y: at.set_subtensor(
                at.inc_subtensor(a[1:], y)[0], 2.0).sum(),
            [d(3, 2), d(2, 2)])


class TestChainedAndAliased:
    def test_write_then_read_region(self):
        av = d(4)
        x = at.vector("x", dtype="float64")
        w = at.set_subtensor(x[:2], 9.0)
        out = w[:3].sum()
        expect = 9.0 + 9.0 + av[2]
        for mode, label in MODES:
            r = float(np.asarray(function([x], out, mode=mode)(av)))
            assert abs(r - expect) < 1e-12, label

    def test_self_referential_inc(self):
        """inc_subtensor(x[1:], x[:-1]) — rhs reads the ORIGINAL x."""
        av = np.array([1.0, 2.0, 3.0])
        x = at.vector("x", dtype="float64")
        out = at.inc_subtensor(x[1:], x[:-1])
        _dual([x], out, [av], np.array([1.0, 3.0, 5.0]), err="self inc")

    def test_two_writes_disjoint_regions(self):
        av = d(6)
        x = at.vector("x", dtype="float64")
        out = at.set_subtensor(at.set_subtensor(x[:2], 0.0)[4:], 1.0)
        expect = av.copy()
        expect[:2] = 0.0
        expect[4:] = 1.0
        _dual([x], out, [av], expect, err="two writes")

    def test_int_dtype_write(self):
        av = np.arange(6, dtype="int64")
        x = at.lvector("x")
        out = at.inc_subtensor(x[2:], 10)
        expect = av.copy()
        expect[2:] += 10
        for mode, label in MODES:
            r = np.asarray(function([x], out, mode=mode)(av))
            assert r.dtype == np.int64
            np.testing.assert_array_equal(r, expect, err_msg=label)
