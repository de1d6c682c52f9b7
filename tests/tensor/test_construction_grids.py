"""Construction/structural-op parameter grids (reference
``tests/tensor/test_basic.py`` 4,312 LoC breadth): arange dtype/step
forms, eye/tri offset grids, tril/triu k-sweeps, tile reps, roll
shift×axis, moveaxis/swapaxes permutations, diagonal offsets, flatten
ndim, stack/concatenate axis grids, repeat forms — all against the
numpy oracle on both backends."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function

rng = np.random.default_rng(909)

MODES = ["PY", "FAST_RUN"]


def run(out, inputs=(), arrays=(), mode="PY"):
    f = function(list(inputs), out, mode=mode)
    return np.asarray(f(*arrays))


def both(build, arrays, oracle):
    syms = [at.tensor(dtype=str(a.dtype), shape=(None,) * a.ndim,
                      name=f"i{k}") for k, a in enumerate(arrays)]
    out = build(*syms)
    want = oracle(*arrays)
    for mode in MODES:
        got = run(out, syms, arrays, mode)
        np.testing.assert_allclose(got, want, err_msg=f"mode={mode}")


class TestArangeGrid:
    @pytest.mark.parametrize("args", [
        (7,), (2, 9), (1, 10, 2), (10, 1, -3), (0, 0, 1), (5, 5, 2),
    ])
    def test_constant_forms(self, args):
        for mode in MODES:
            got = run(at.arange(*args), mode=mode)
            np.testing.assert_array_equal(got, np.arange(*args))

    def test_float_step(self):
        got = run(at.arange(0.0, 1.0, 0.25))
        np.testing.assert_allclose(got, np.arange(0.0, 1.0, 0.25))

    def test_dtype_param(self):
        y = at.arange(5, dtype="float32")
        assert y.type.dtype == "float32"
        np.testing.assert_array_equal(run(y), np.arange(5, dtype="float32"))

    def test_symbolic_stop(self):
        n = at.iscalar("n")
        f = function([n], at.arange(n), mode="PY")
        np.testing.assert_array_equal(np.asarray(f(4)), np.arange(4))
        np.testing.assert_array_equal(np.asarray(f(0)), np.arange(0))


class TestEyeTriGrid:
    @pytest.mark.parametrize("k", [-2, -1, 0, 1, 3])
    def test_eye_offsets(self, k):
        for mode in MODES:
            got = run(at.eye(4, 5, k), mode=mode)
            np.testing.assert_array_equal(got, np.eye(4, 5, k))

    @pytest.mark.parametrize("k", [-2, 0, 2])
    def test_tri(self, k):
        got = run(at.tri(4, 6, k))
        np.testing.assert_array_equal(got, np.tri(4, 6, k))

    @pytest.mark.parametrize("k", [-2, -1, 0, 1, 2])
    def test_tril_triu_sweep(self, k):
        x = rng.normal(size=(4, 5))
        both(lambda s: at.tril(s, k), [x], lambda a: np.tril(a, k))
        both(lambda s: at.triu(s, k), [x], lambda a: np.triu(a, k))

    def test_tril_square_default(self):
        x = rng.normal(size=(3, 3))
        both(at.tril, [x], np.tril)


class TestTileGrid:
    @pytest.mark.parametrize("reps", [(2,), (2, 3), (1, 2), (3, 1)])
    def test_matrix_reps(self, reps):
        x = rng.normal(size=(2, 3))
        if len(reps) == 1:
            both(lambda s: at.tile(s, reps), [x],
                 lambda a: np.tile(a, reps))
        else:
            both(lambda s: at.tile(s, reps), [x],
                 lambda a: np.tile(a, reps))

    def test_reps_longer_than_ndim(self):
        x = rng.normal(size=(3,))
        both(lambda s: at.tile(s, (2, 2)), [x], lambda a: np.tile(a, (2, 2)))


class TestRollGrid:
    @pytest.mark.parametrize("shift,axis", [
        (1, 0), (-1, 0), (2, 1), (-3, 1), (7, 0), (0, 1),
    ])
    def test_shift_axis(self, shift, axis):
        x = rng.normal(size=(4, 5))
        both(lambda s: at.roll(s, shift, axis=axis), [x],
             lambda a: np.roll(a, shift, axis=axis))

    def test_flattened_roll_no_axis(self):
        x = rng.normal(size=(3, 4))
        both(lambda s: at.roll(s, 5), [x], lambda a: np.roll(a, 5))


class TestAxisPermutations:
    @pytest.mark.parametrize("src,dst", [
        (0, 2), (2, 0), (1, 1), (-1, 0), (0, -1),
    ])
    def test_moveaxis(self, src, dst):
        x = rng.normal(size=(2, 3, 4))
        both(lambda s: at.moveaxis(s, src, dst), [x],
             lambda a: np.moveaxis(a, src, dst))

    def test_moveaxis_multi(self):
        x = rng.normal(size=(2, 3, 4))
        both(lambda s: at.moveaxis(s, [0, 1], [2, 0]), [x],
             lambda a: np.moveaxis(a, [0, 1], [2, 0]))

    @pytest.mark.parametrize("a1,a2", [(0, 1), (1, 2), (0, 2), (-1, 0)])
    def test_swapaxes(self, a1, a2):
        x = rng.normal(size=(2, 3, 4))
        both(lambda s: at.swapaxes(s, a1, a2), [x],
             lambda a: np.swapaxes(a, a1, a2))


class TestDiagonalGrid:
    @pytest.mark.parametrize("offset", [-2, -1, 0, 1, 2])
    def test_offsets(self, offset):
        x = rng.normal(size=(4, 5))
        both(lambda s: at.diagonal(s, offset), [x],
             lambda a: np.diagonal(a, offset))

    def test_axis_pair_3d(self):
        x = rng.normal(size=(2, 3, 4))
        both(lambda s: at.diagonal(s, 0, axis1=1, axis2=2), [x],
             lambda a: np.diagonal(a, 0, 1, 2))

    def test_diag_builds_matrix_from_vector(self):
        x = rng.normal(size=(4,))
        both(lambda s: at.diag(s), [x], np.diag)

    def test_diag_extracts_from_matrix(self):
        x = rng.normal(size=(4, 4))
        both(lambda s: at.diag(s), [x], np.diag)


class TestFlattenForms:
    def test_full_flatten(self):
        x = rng.normal(size=(2, 3, 4))
        both(lambda s: at.flatten(s), [x], np.ravel)

    @pytest.mark.parametrize("ndim", [1, 2, 3])
    def test_flatten_to_ndim(self, ndim):
        x = rng.normal(size=(2, 3, 4))
        want = x.reshape(x.shape[:ndim - 1] + (-1,))
        both(lambda s: at.flatten(s, ndim=ndim), [x], lambda a: want)

    def test_var_method(self):
        x = at.tensor3("x", dtype="float64")
        assert x.flatten().type.ndim == 1
        assert x.flatten(2).type.ndim == 2


class TestStackConcat:
    @pytest.mark.parametrize("axis", [0, 1, 2, -1])
    def test_stack_axis(self, axis):
        a = rng.normal(size=(2, 3))
        b = rng.normal(size=(2, 3))
        both(lambda s, t: at.stack([s, t], axis=axis), [a, b],
             lambda u, w: np.stack([u, w], axis=axis))

    @pytest.mark.parametrize("axis", [0, 1, -1])
    def test_concatenate_axis(self, axis):
        a = rng.normal(size=(2, 3))
        b = rng.normal(size=(2, 3))
        both(lambda s, t: at.concatenate([s, t], axis=axis), [a, b],
             lambda u, w: np.concatenate([u, w], axis=axis))

    def test_concat_mismatched_other_dim_raises(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        f = function([a, b], at.concatenate([a, b], axis=0), mode="PY")
        with pytest.raises(Exception):
            f(rng.normal(size=(2, 3)), rng.normal(size=(2, 4)))

    def test_stack_scalars_makes_vector(self):
        a = at.scalar("a", dtype="float64")
        b = at.scalar("b", dtype="float64")
        f = function([a, b], at.stack([a, b]), mode="PY")
        np.testing.assert_allclose(np.asarray(f(1.0, 2.0)), [1.0, 2.0])


class TestRepeatForms:
    @pytest.mark.parametrize("repeats,axis", [
        (2, None), (3, 0), (2, 1),
    ])
    def test_scalar_repeats(self, repeats, axis):
        x = rng.normal(size=(2, 3))
        both(lambda s: at.repeat(s, repeats, axis=axis), [x],
             lambda a: np.repeat(a, repeats, axis=axis))

    def test_vector_repeats(self):
        x = rng.normal(size=(3,))
        reps = np.array([1, 0, 2])
        both(lambda s: at.repeat(s, reps, axis=0), [x],
             lambda a: np.repeat(a, reps, axis=0))


class TestChooseWhere:
    def test_choose_basic(self):
        idx = np.array([0, 1, 1, 0])
        a = rng.normal(size=(4,))
        b = rng.normal(size=(4,))
        i = at.lvector("i")
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        f = function([i, x, y], at.choose(i, [x, y]), mode="PY")
        np.testing.assert_allclose(np.asarray(f(idx, a, b)),
                                   np.choose(idx, [a, b]))

    def test_where_three_arg(self):
        c = rng.integers(0, 2, size=6).astype(bool)
        a = rng.normal(size=(6,))
        b = rng.normal(size=(6,))
        both(lambda m, s, t: at.where(m, s, t), [c, a, b], np.where)

    def test_where_broadcasts(self):
        # only statically-1 dims broadcast (the reference contract) —
        # the broadcasting operands must DECLARE their unit dims
        c = rng.integers(0, 2, size=(3, 1)).astype(bool)
        a = rng.normal(size=(3, 4))
        b = rng.normal(size=(1, 4))
        m = at.tensor(dtype="bool", shape=(None, 1), name="m")
        s = at.matrix("s", dtype="float64")
        t = at.tensor(dtype="float64", shape=(1, None), name="t")
        f = function([m, s, t], at.where(m, s, t), mode="PY")
        np.testing.assert_allclose(np.asarray(f(c, a, b)),
                                   np.where(c, a, b))
