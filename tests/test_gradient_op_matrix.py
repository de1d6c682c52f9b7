"""Per-op gradient matrices (VERDICT r3 #5): finite-difference
verification (``verify_grad``) across every differentiable op family —
the reference runs verify_grad inside nearly every op test
(``/root/reference/tests/tensor/test_basic.py`` grad= cases); this file
is the consolidated grid: elemwise/transcendental, reductions over axis
grids, indexing (basic/advanced/set/inc), structural, linalg, special,
plus second-order and Rop/Lop consistency spot checks.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
import aesara_tpu.tensor.nlinalg as nl
import aesara_tpu.tensor.slinalg as sl
from aesara_tpu.gradient import Lop, Rop, grad
from aesara_tpu.compile.function import function
from tests.unittest_tools import verify_grad

rng = np.random.default_rng(8128)


def d(*shape):
    return rng.normal(size=shape)


def pos(*shape):
    return np.abs(rng.normal(size=shape)) + 0.4


def unit(*shape):
    return rng.uniform(-0.8, 0.8, size=shape)


def spd(n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


# ---------------------------------------------------------------------------
# elemwise / transcendental grid
# ---------------------------------------------------------------------------

ELEMWISE = [
    ("exp", lambda x: at.exp(x).sum(), d),
    ("log", lambda x: at.log(x).sum(), pos),
    ("sqrt", lambda x: at.sqrt(x).sum(), pos),
    ("sqr", lambda x: tm.sqr(x).sum(), d),
    ("sin_cos_mix", lambda x: (at.sin(x) * at.cos(x)).sum(), d),
    ("tan", lambda x: at.tan(x).sum(), unit),
    ("tanh", lambda x: at.tanh(x).sum(), d),
    ("arcsin", lambda x: at.arcsin(x).sum(), unit),
    ("arctan", lambda x: at.arctan(x).sum(), d),
    ("arcsinh", lambda x: tm.arcsinh(x).sum(), d),
    ("arctanh", lambda x: tm.arctanh(x).sum(), unit),
    ("sigmoid", lambda x: tm.sigmoid(x).sum(), d),
    ("softplus", lambda x: tm.softplus(x).sum(), d),
    ("erf", lambda x: tm.erf(x).sum(), d),
    ("erfc", lambda x: tm.erfc(x).sum(), d),
    ("gammaln", lambda x: tm.gammaln(x).sum(), pos),
    ("psi", lambda x: tm.psi(x).sum(), pos),
    ("expm1", lambda x: tm.expm1(x).sum(), d),
    ("log1p", lambda x: at.log1p(x).sum(), pos),
    ("abs", lambda x: at.abs(x).sum(), lambda *s: d(*s) + 0.5),
    ("reciprocal", lambda x: tm.reciprocal(x).sum(), pos),
    ("clip_interior", lambda x: at.clip(x, -10.0, 10.0).sum(), unit),
    ("maximum_const", lambda x: at.maximum(x, 0.1).sum(),
     lambda *s: pos(*s) + 0.2),
    ("switch", lambda x: at.switch(x > 0, x * 2.0, x * 3.0).sum(),
     lambda *s: d(*s) + 0.01),
    ("xlogx", lambda x: (x * at.log(x)).sum(), pos),
]


@pytest.mark.parametrize("name,fn,dom", ELEMWISE,
                         ids=[e[0] for e in ELEMWISE])
def test_elemwise_grad(name, fn, dom):
    verify_grad(fn, [dom(3, 4)])


BINARY = [
    ("add", lambda a, b: (a + b).sum(), d, d),
    ("mul", lambda a, b: (a * b).sum(), d, d),
    ("div", lambda a, b: (a / b).sum(), d, pos),
    ("pow", lambda a, b: (a ** b).sum(), pos, d),
    ("arctan2", lambda a, b: tm.arctan2(a, b).sum(), d, pos),
    ("maximum", lambda a, b: at.maximum(a, b).sum(), d,
     lambda *s: d(*s) + 3.0),
    ("logaddexp_form", lambda a, b: at.log(at.exp(a) + at.exp(b)).sum(),
     d, d),
]


@pytest.mark.parametrize("name,fn,da,db", BINARY, ids=[b[0] for b in BINARY])
def test_binary_grad(name, fn, da, db):
    verify_grad(fn, [da(3, 3), db(3, 3)])


# ---------------------------------------------------------------------------
# reductions over axes
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("axis", [None, 0, 1, 2, (0, 2)],
                         ids=["all", "ax0", "ax1", "ax2", "ax02"])
@pytest.mark.parametrize("red,dom", [
    (at.sum, d), (at.prod, pos), (at.max, d), (at.min, d), (at.mean, d),
], ids=["sum", "prod", "max", "min", "mean"])
def test_reduce_grad_grid(axis, red, dom):
    verify_grad(lambda x: red(x, axis=axis).sum()
                if axis != (0, 1, 2) else red(x, axis=axis), [dom(2, 3, 2)])


def test_var_std_grad():
    verify_grad(lambda x: tm.var(x, axis=0).sum(), [d(4, 3)])
    verify_grad(lambda x: tm.std(x, axis=1).sum(), [d(4, 3) + 0.1])


def test_logsumexp_grad():
    verify_grad(lambda x: tm.logsumexp(x, axis=1).sum(), [d(3, 5)])


# ---------------------------------------------------------------------------
# indexing family
# ---------------------------------------------------------------------------

IDX = [
    ("slice", lambda x: x[1:3].sum()),
    ("negstep", lambda x: x[::-1].sum()),
    ("strided", lambda x: x[::2, 1::2].sum()),
    ("scalar_idx", lambda x: x[2].sum()),
    ("int_vec", lambda x: x[at.as_tensor_variable(
        np.array([0, 3, 1, 3]))].sum()),
    ("dup_idx", lambda x: x[at.as_tensor_variable(
        np.array([1, 1, 1]))].sum()),
    ("two_vecs", lambda x: x[at.as_tensor_variable(np.array([0, 2])),
                             at.as_tensor_variable(np.array([1, 3]))].sum()),
    ("bool_mask", lambda x: x[at.as_tensor_variable(
        np.array([True, False, True, True]))].sum()),
    ("set_sub", lambda x: at.set_subtensor(x[:2], 0.0).sum()),
    ("inc_sub", lambda x: at.inc_subtensor(x[1:], x[:-1] * 0.5).sum()),
    ("inc_adv", lambda x: at.inc_subtensor(
        x[at.as_tensor_variable(np.array([0, 0, 2]))], 1.5).sum()),
]


@pytest.mark.parametrize("name,fn", IDX, ids=[i[0] for i in IDX])
def test_indexing_grad(name, fn):
    verify_grad(fn, [d(4, 4)])


# ---------------------------------------------------------------------------
# structural family
# ---------------------------------------------------------------------------

STRUCT = [
    ("reshape", lambda x: at.reshape(x, (2, 6)).sum() * 1.0),
    ("flatten", lambda x: at.flatten(x).sum()),
    ("dimshuffle", lambda x: x.dimshuffle(1, 0).sum()),
    ("dimshuffle_bcast", lambda x: x.dimshuffle("x", 0, 1).sum()),
    ("join", lambda x: at.join(0, x, x * 2.0).sum()),
    ("stack", lambda x: at.stack([x, x * 3.0], axis=1).sum()),
    ("split0", lambda x: at.split(x, [1, 2], 2, axis=0)[0].sum()),
    ("split1", lambda x: at.split(x, [1, 2], 2, axis=0)[1].sum()),
    ("tile", lambda x: at.tile(x, (2, 2)).sum()),
    ("repeat", lambda x: at.repeat(x, 3, axis=0).sum()),
    ("roll", lambda x: at.roll(x, 1, axis=0).sum()),
    ("transpose", lambda x: at.transpose(x).sum()),
    ("tril", lambda x: at.tril(x).sum()),
    ("triu_k", lambda x: at.triu(x, 1).sum()),
    ("diag_extract", lambda x: at.diag(x).sum()),
    ("cumsum", lambda x: at.extra_ops.cumsum(x, axis=0).sum()),
    ("cumprod", lambda x: at.extra_ops.cumprod(x + 1.5, axis=1).sum()),
    ("diff", lambda x: at.extra_ops.diff(x, axis=0).sum()),
    ("sort", lambda x: at.sort(x, axis=1).sum()),
    ("broadcast_to", lambda x: at.extra_ops.broadcast_to(
        x[None, :, :], (4, 3, 4)).sum()),
]


@pytest.mark.parametrize("name,fn", STRUCT, ids=[s[0] for s in STRUCT])
def test_structural_grad(name, fn):
    verify_grad(fn, [d(3, 4)])


# ---------------------------------------------------------------------------
# dot / linalg family
# ---------------------------------------------------------------------------

def test_dot_family_grads():
    verify_grad(lambda a, b: at.dot(a, b).sum(), [d(3, 4), d(4, 2)])
    verify_grad(lambda a, b: at.dot(a, b).sum(), [d(4), d(4, 2)])
    verify_grad(lambda a, b: at.dot(a, b), [d(4), d(4)])
    verify_grad(lambda a, b: at.batched_dot(a, b).sum(),
                [d(2, 3, 4), d(2, 4, 2)])
    verify_grad(lambda a, b: at.tensordot(a, b, axes=2).sum(),
                [d(2, 3, 4), d(3, 4, 2)])
    verify_grad(lambda a, b: at.outer(a, b).sum(), [d(3), d(5)])


LINALG = [
    ("det", lambda: (nl.det, [spd(3)])),
    ("logdet_form", lambda: (lambda x: at.log(nl.det(x)), [spd(3)])),
    ("inv", lambda: (lambda x: nl.matrix_inverse(x).sum(), [spd(3)])),
    ("trace", lambda: (lambda x: nl.trace(at.dot(x, x.T)), [d(3, 3)])),
    ("cholesky", lambda: (lambda x: sl.cholesky(x).sum(), [spd(3)])),
    ("solve", lambda: (lambda a, b: sl.solve(a, b).sum(),
                       [spd(3), d(3, 2)])),
    ("solve_tri", lambda: (
        lambda a, b: sl.solve_triangular(a, b, lower=True).sum(),
        [np.linalg.cholesky(spd(3)), d(3, 2)])),
    ("eigh_vals", lambda: (lambda x: nl.eigh((x + x.T) / 2)[0].sum(),
                           [d(3, 3)])),
    ("kron", lambda: (lambda a, b: sl.kron(a, b).sum(),
                      [d(2, 2), d(2, 3)])),
]


@pytest.mark.parametrize("name,case", LINALG, ids=[c[0] for c in LINALG])
def test_linalg_grad(name, case):
    fn, args = case()
    verify_grad(fn, args, rel_tol=1e-5)


# ---------------------------------------------------------------------------
# special / softmax family
# ---------------------------------------------------------------------------

def test_softmax_family_grads():
    from aesara_tpu.tensor.special import log_softmax, softmax

    verify_grad(lambda x: (softmax(x, axis=-1) ** 2).sum(), [d(3, 5)])
    verify_grad(lambda x: (log_softmax(x, axis=-1) * d(3, 5)).sum(),
                [d(3, 5)])


def test_fft_grads():
    from aesara_tpu.tensor import fft

    verify_grad(lambda x: tm.sqr(fft.rfft(x)).sum(), [d(4, 8)],
                rel_tol=1e-4)


# ---------------------------------------------------------------------------
# second order + Rop/Lop consistency
# ---------------------------------------------------------------------------

class TestHigherOrder:
    def test_second_order_elemwise(self):
        x = at.vector("x", dtype="float64")
        c = (at.exp(x) * at.sin(x)).sum()
        g = grad(c, x)
        g2 = grad(g.sum(), x)
        f = function([x], g2, mode="PY")
        v = d(4)
        # d²/dx² e^x sin x = 2 e^x cos x
        np.testing.assert_allclose(np.asarray(f(v)),
                                   2 * np.exp(v) * np.cos(v), rtol=1e-8)

    def test_second_order_through_dot(self):
        x = at.vector("x", dtype="float64")
        A = at.as_tensor_variable(spd(3))
        c = 0.5 * at.dot(x, at.dot(A, x))
        g2 = grad(grad(c, x).sum(), x)
        f = function([x], g2, mode="PY")
        np.testing.assert_allclose(np.asarray(f(d(3))),
                                   np.asarray(A.data).sum(axis=0),
                                   rtol=1e-8)

    def test_rop_matches_jvp_fd(self):
        x = at.vector("x", dtype="float64")
        y = at.tanh(at.dot(at.as_tensor_variable(d(3, 4)), x))
        v = at.vector("v", dtype="float64")
        r = Rop(y, x, v)
        f = function([x, v], r, mode="PY")
        xv, vv = d(4), d(4)
        eps = 1e-7
        yf = function([x], y, mode="PY")
        fd = (np.asarray(yf(xv + eps * vv)) -
              np.asarray(yf(xv - eps * vv))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(f(xv, vv)), fd, rtol=1e-6,
                                   atol=1e-8)

    def test_lop_rop_adjoint_identity(self):
        """⟨w, Rop(f,x,v)⟩ == ⟨Lop(f,x,w), v⟩ — the transpose contract."""
        x = at.vector("x", dtype="float64")
        y = at.sin(at.dot(at.as_tensor_variable(d(3, 4)), x))
        v = at.vector("v", dtype="float64")
        w = at.vector("w", dtype="float64")
        lhs = (w * Rop(y, x, v)).sum()
        rhs = (Lop(y, x, w) * v).sum()
        f = function([x, v, w], [lhs, rhs], mode="PY")
        a, b = f(d(4), d(4), d(3))
        np.testing.assert_allclose(float(np.asarray(a)),
                                   float(np.asarray(b)), rtol=1e-10)

    def test_hessian_diag_of_separable(self):
        from aesara_tpu.gradient import hessian

        x = at.vector("x", dtype="float64")
        h = hessian((x ** 3).sum(), x)
        f = function([x], h, mode="PY")
        v = d(4)
        np.testing.assert_allclose(np.asarray(f(v)), np.diag(6 * v),
                                   rtol=1e-8)
