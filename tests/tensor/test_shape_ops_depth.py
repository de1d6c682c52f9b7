"""Shape-op behavior depth (reference ``tests/tensor/test_shape.py`` +
``test_extra_ops.py`` breadth): reshape -1 inference and validation,
specify_shape runtime enforcement, pad-left/right/axis grids, squeeze
axis selection, expand_dims, broadcast_to/arrays contracts,
atleast_Nd — numpy-oracle checks on both backends."""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.tensor.shape import (
    reshape, shape_padaxis, shape_padleft, shape_padright, specify_shape)

rng = np.random.default_rng(1212)

MODES = ["PY", "FAST_RUN"]


def both(build, arrays, oracle):
    syms = [at.tensor(dtype=str(a.dtype), shape=(None,) * a.ndim,
                      name=f"i{k}") for k, a in enumerate(arrays)]
    out = build(*syms)
    want = oracle(*arrays)
    for mode in MODES:
        f = function(syms, out, mode=mode)
        np.testing.assert_allclose(np.asarray(f(*arrays)), want,
                                   err_msg=f"mode={mode}")


class TestReshapeForms:
    @pytest.mark.parametrize("newshape", [
        (6, 4), (4, 6), (2, 3, 4), (24,), (2, 12), (1, 24),
    ])
    def test_static_targets(self, newshape):
        x = rng.normal(size=(2, 3, 4))
        both(lambda s: reshape(s, newshape), [x],
             lambda a: a.reshape(newshape))

    @pytest.mark.parametrize("newshape", [(-1,), (2, -1), (-1, 4), (2, -1, 2)])
    def test_minus_one_inference(self, newshape):
        x = rng.normal(size=(2, 3, 4))
        both(lambda s: reshape(s, newshape), [x],
             lambda a: a.reshape(newshape))

    def test_symbolic_target_from_shape(self):
        x = at.matrix("x", dtype="float64")
        out = reshape(x, (x.shape[1], x.shape[0]))
        f = function([x], out, mode="PY")
        xv = rng.normal(size=(2, 5))
        np.testing.assert_allclose(np.asarray(f(xv)), xv.reshape(5, 2))

    def test_wrong_total_raises(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], reshape(x, (5, 5)), mode="PY")
        with pytest.raises(Exception):
            f(rng.normal(size=(2, 3)))

    def test_var_method_matches(self):
        x = at.tensor3("x", dtype="float64")
        assert x.reshape((6, -1)).type.ndim == 2


class TestSpecifyShape:
    def test_passes_matching(self):
        x = at.vector("x", dtype="float64")
        f = function([x], specify_shape(x, (4,)) * 2, mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.ones(4))), [2.0] * 4)

    def test_rejects_mismatch(self):
        x = at.vector("x", dtype="float64")
        f = function([x], specify_shape(x, (4,)) * 2, mode="PY")
        with pytest.raises(Exception):
            f(np.ones(5))

    def test_partial_spec_none_dims(self):
        x = at.matrix("x", dtype="float64")
        y = specify_shape(x, (None, 3))
        f = function([x], y + 0.0, mode="PY")
        np.testing.assert_allclose(
            np.asarray(f(np.ones((2, 3)))), np.ones((2, 3)))
        with pytest.raises(Exception):
            f(np.ones((2, 4)))

    def test_static_type_refined(self):
        x = at.matrix("x", dtype="float64")
        y = specify_shape(x, (2, 3))
        assert y.type.shape == (2, 3)


class TestPadAxes:
    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_padleft(self, n):
        x = rng.normal(size=(3, 4))
        both(lambda s: shape_padleft(s, n), [x],
             lambda a: a.reshape((1,) * n + a.shape))

    @pytest.mark.parametrize("n", [1, 2])
    def test_padright(self, n):
        x = rng.normal(size=(3,))
        both(lambda s: shape_padright(s, n), [x],
             lambda a: a.reshape(a.shape + (1,) * n))

    @pytest.mark.parametrize("axis", [0, 1, 2, -1])
    def test_padaxis(self, axis):
        x = rng.normal(size=(3, 4))
        both(lambda s: shape_padaxis(s, axis), [x],
             lambda a: np.expand_dims(a, axis))

    def test_padaxis_out_of_range_raises(self):
        x = at.matrix("x", dtype="float64")
        with pytest.raises(IndexError, match="out of bounds"):
            shape_padaxis(x, 5)
        with pytest.raises(IndexError, match="out of bounds"):
            shape_padaxis(x, -4)

    def test_expand_dims_out_of_range_raises(self):
        x = at.matrix("x", dtype="float64")
        with pytest.raises(IndexError, match="out of bounds"):
            at.expand_dims(x, 5)


class TestSqueezeExpand:
    def test_squeeze_all_unit_dims(self):
        x = rng.normal(size=(1, 3, 1, 4))
        sym = at.tensor(dtype="float64", shape=(1, None, 1, None),
                        name="x")
        out = at.squeeze(sym)
        f = function([sym], out, mode="PY")
        got = np.asarray(f(x))
        np.testing.assert_allclose(got, x.squeeze())

    @pytest.mark.parametrize("axis", [0, 2])
    def test_squeeze_specific_axis(self, axis):
        x = rng.normal(size=(1, 3, 1, 4))
        sym = at.tensor(dtype="float64", shape=(1, None, 1, None),
                        name="x")
        out = at.squeeze(sym, axis=axis)
        f = function([sym], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f(x)), np.squeeze(x, axis))

    @pytest.mark.parametrize("axis", [0, 1, -1, (0, 2)])
    def test_expand_dims(self, axis):
        x = rng.normal(size=(3, 4))
        both(lambda s: at.expand_dims(s, axis), [x],
             lambda a: np.expand_dims(a, axis))


class TestBroadcastOps:
    def test_broadcast_to_values(self):
        x = rng.normal(size=(1, 4))
        sym = at.tensor(dtype="float64", shape=(1, None), name="x")
        out = at.broadcast_to(sym, (3, 4))
        f = function([sym], out, mode="PY")
        np.testing.assert_allclose(np.asarray(f(x)),
                                   np.broadcast_to(x, (3, 4)))

    def test_broadcast_to_scalar(self):
        s = at.scalar("s", dtype="float64")
        f = function([s], at.broadcast_to(s, (2, 3)), mode="PY")
        np.testing.assert_allclose(np.asarray(f(5.0)), np.full((2, 3), 5.0))

    def test_broadcast_arrays_pair(self):
        a = rng.normal(size=(3, 1))
        b = rng.normal(size=(4,))
        sa = at.tensor(dtype="float64", shape=(None, 1), name="a")
        sb = at.tensor(dtype="float64", shape=(None,), name="b")
        outs = at.broadcast_arrays(sa, sb)
        f = function([sa, sb], list(outs), mode="PY")
        ga, gb = f(a, b)
        wa, wb = np.broadcast_arrays(a, b)
        np.testing.assert_allclose(np.asarray(ga), wa)
        np.testing.assert_allclose(np.asarray(gb), wb)

    def test_grad_through_broadcast_to(self):
        import aesara_tpu as atp
        import aesara_tpu.tensor.math as tm

        sym = at.tensor(dtype="float64", shape=(1, None), name="x")
        out = tm.sum(at.broadcast_to(sym, (3, 4)) ** 2)
        (g,) = atp.grad(out, [sym])
        f = function([sym], g, mode="PY")
        xv = rng.normal(size=(1, 4))
        # d/dx sum((bcast x)^2) = 3 * 2x per column
        np.testing.assert_allclose(np.asarray(f(xv)), 6.0 * xv)


class TestAtleastNd:
    def test_atleast_1d_scalar(self):
        s = at.scalar("s", dtype="float64")
        f = function([s], at.atleast_1d(s), mode="PY")
        got = np.asarray(f(3.0))
        assert got.shape == (1,)

    def test_atleast_2d_vector(self):
        x = rng.normal(size=(4,))
        both(at.atleast_2d, [x], np.atleast_2d)

    def test_atleast_3d_matrix_pads_left(self):
        # the REFERENCE convention (basic.py:3980 atleast_Nd left=True):
        # a (2,3) matrix becomes (1,2,3) — numpy's atleast_3d would give
        # (2,3,1); the framework follows the reference
        x = rng.normal(size=(2, 3))
        both(at.atleast_3d, [x], lambda a: a.reshape((1,) + a.shape))

    def test_already_bigger_untouched(self):
        x = at.tensor3("x", dtype="float64")
        assert at.atleast_2d(x) is x or at.atleast_2d(x).type.ndim == 3
