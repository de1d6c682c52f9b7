"""Dense golden-vs-NumPy op matrix via makeTester — the broad sweep the
reference runs in ``tests/tensor/test_basic.py``/``test_math.py``
(makeTester used hundreds of times).  Every case runs under BOTH
backends (py perform + whole-graph XLA) and float ops get a
finite-difference gradient check.

Dynamic-shape ops (unique, nonzero) are exercised in their own py-mode
tests elsewhere — XLA requires static shapes, so they are excluded from
this dual-backend matrix by design.
"""

import numpy as np
import scipy.linalg as scipy_linalg
import scipy.special as scipy_special

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
import aesara_tpu.tensor.nlinalg as nl
import aesara_tpu.tensor.slinalg as sl
from tests.unittest_tools import makeTester

rng = np.random.default_rng(1234)


def d(*shape):
    return rng.normal(size=shape)


def pos(*shape):
    return np.abs(rng.normal(size=shape)) + 0.3


def unit(*shape):
    return rng.uniform(-0.85, 0.85, size=shape)


def ints(*shape, lo=1, hi=9):
    return rng.integers(lo, hi, size=shape)


def spd(n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


# ---------------------------------------------------------------------------
# unary elemwise: (tensor fn, numpy oracle, domain sampler, differentiable)
# ---------------------------------------------------------------------------

UNARY = {
    "Neg": (at.neg, np.negative, d, True),
    "Abs": (at.abs, np.abs, lambda *s: d(*s) + 0.1, True),
    "Sgn": (at.sgn, np.sign, d, False),
    "Ceil": (at.ceil, np.ceil, d, False),
    "Floor": (at.floor, np.floor, d, False),
    "Trunc": (at.math.trunc, np.trunc, d, False),
    "Round": (at.round, np.round, d, False),
    "Exp": (at.exp, np.exp, d, True),
    "Exp2": (at.math.exp2, np.exp2, d, True),
    "Expm1": (at.math.expm1, np.expm1, d, True),
    "Log": (at.log, np.log, pos, True),
    "Log2": (at.math.log2, np.log2, pos, True),
    "Log10": (at.math.log10, np.log10, pos, True),
    "Log1p": (at.log1p, np.log1p, pos, True),
    "Sqrt": (at.sqrt, np.sqrt, pos, True),
    "Sqr": (at.sqr, np.square, d, True),
    "Sin": (at.sin, np.sin, d, True),
    "Cos": (at.cos, np.cos, d, True),
    "Tan": (at.tan, np.tan, unit, True),
    "ArcSin": (at.arcsin, np.arcsin, unit, True),
    "ArcCos": (at.arccos, np.arccos, unit, True),
    "ArcTan": (at.arctan, np.arctan, d, True),
    "Sinh": (at.sinh, np.sinh, d, True),
    "Cosh": (at.cosh, np.cosh, d, True),
    "Tanh": (at.tanh, np.tanh, d, True),
    "ArcSinh": (at.math.arcsinh, np.arcsinh, d, True),
    "ArcCosh": (at.math.arccosh, np.arccosh, lambda *s: pos(*s) + 1.5, True),
    "ArcTanh": (at.math.arctanh, np.arctanh, unit, True),
    "Deg2Rad": (at.math.deg2rad, np.deg2rad, d, True),
    "Rad2Deg": (at.math.rad2deg, np.rad2deg, d, True),
    "Reciprocal": (at.math.reciprocal, np.reciprocal, pos, True),
    "Sigmoid": (at.math.sigmoid, scipy_special.expit, d, True),
    "Softplus": (at.math.softplus,
                 lambda x: np.logaddexp(0, x), d, True),
    "Erf": (at.math.erf, scipy_special.erf, d, True),
    "Erfc": (at.math.erfc, scipy_special.erfc, d, True),
    "Gamma": (at.math.gamma, scipy_special.gamma, pos, True),
    "GammaLn": (at.math.gammaln, scipy_special.gammaln, pos, True),
    "Psi": (at.math.psi, scipy_special.psi, pos, True),
}

for _name, (_fn, _np_fn, _dom, _diff) in UNARY.items():
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix",
        _fn,
        _np_fn,
        good={"vec": (_dom(7),), "mat": (_dom(3, 4),),
              "scalar": (np.asarray(_dom(1)[0]),)},
        grad={"mat": (_dom(3, 3),)} if _diff else None,
    )


# ---------------------------------------------------------------------------
# binary elemwise
# ---------------------------------------------------------------------------

BINARY = {
    "Add2": (at.add, np.add, d, d, True),
    "Sub": (at.sub, np.subtract, d, d, True),
    "Mul2": (at.mul, np.multiply, d, d, True),
    "TrueDiv": (at.true_div, np.true_divide, d, pos, True),
    "Pow": (at.math.pow, np.power, pos, d, True),
    "Maximum": (at.maximum, np.maximum, d, d, True),
    "Minimum": (at.minimum, np.minimum, d, d, True),
    "ArcTan2": (at.math.arctan2, np.arctan2, d, pos, True),
}

for _name, (_fn, _np_fn, _da, _db, _diff) in BINARY.items():
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix",
        _fn,
        _np_fn,
        good={
            "same_shape": (_da(3, 4), _db(3, 4)),
            "broadcast_row": (_da(3, 4), _db(1, 4)),
            "scalar_rhs": (_da(3, 4), np.asarray(_db(1)[0])),
        },
        grad={"mat": (_da(3, 3), _db(3, 3))} if _diff else None,
    )

INT_BINARY = {
    "IntDiv": (at.math.int_div, np.floor_divide),
    "Mod": (at.math.mod, np.mod),
    "BitwiseAnd": (at.math.bitwise_and, np.bitwise_and),
    "BitwiseOr": (at.math.bitwise_or, np.bitwise_or),
    "BitwiseXor": (at.math.bitwise_xor, np.bitwise_xor),
}

for _name, (_fn, _np_fn) in INT_BINARY.items():
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix",
        _fn,
        _np_fn,
        good={"mat": (ints(3, 4), ints(3, 4)),
              "vec": (ints(6), ints(6))},
    )

CMP = {
    "LT": (at.math.lt, np.less),
    "GT": (at.math.gt, np.greater),
    "LE": (at.math.le, np.less_equal),
    "GE": (at.math.ge, np.greater_equal),
    "EQ2": (at.math.eq, np.equal),
    "NEQ": (at.math.neq, np.not_equal),
}

for _name, (_fn, _np_fn) in CMP.items():
    a = d(3, 4)
    b = a.copy()
    b[::2] = d(2, 4)  # half equal, half random
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix", _fn, _np_fn,
        good={"mixed": (a, b), "ints": (ints(5), ints(5))},
    )

TestSwitchMatrix = makeTester(
    "TestSwitchMatrix",
    at.switch,
    lambda c, a, b: np.where(c != 0, a, b),
    good={"float_cond": ((d(3, 4) > 0).astype("float64"), d(3, 4), d(3, 4)),
          "int_cond": (ints(3, 4, lo=0, hi=2), d(3, 4), d(3, 4))},
)

TestClipMatrix = makeTester(
    "TestClipMatrix",
    at.clip,
    np.clip,
    good={"mat": (d(4, 4), np.asarray(-0.5), np.asarray(0.5))},
)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

REDUCTIONS = {
    "SumAll": (lambda x: at.sum(x), lambda x: np.sum(x), d, True),
    "SumAx0": (lambda x: at.sum(x, axis=0), lambda x: np.sum(x, axis=0), d, True),
    "SumAx1": (lambda x: at.sum(x, axis=1), lambda x: np.sum(x, axis=1), d, True),
    "ProdAll": (lambda x: at.prod(x), lambda x: np.prod(x), d, True),
    "MaxAx": (lambda x: at.max(x, axis=1), lambda x: np.max(x, axis=1), d, True),
    "MinAx": (lambda x: at.min(x, axis=1), lambda x: np.min(x, axis=1), d, True),
    "Mean": (lambda x: at.mean(x, axis=0), lambda x: np.mean(x, axis=0), d, True),
    "Var": (lambda x: at.math.var(x, axis=0), lambda x: np.var(x, axis=0), d, True),
    "Std": (lambda x: at.math.std(x, axis=0), lambda x: np.std(x, axis=0), d, True),
    "Argmax": (lambda x: at.argmax(x, axis=1), lambda x: np.argmax(x, axis=1), d, False),
    "Argmin": (lambda x: at.argmin(x, axis=1), lambda x: np.argmin(x, axis=1), d, False),
}

for _name, (_fn, _np_fn, _dom, _diff) in REDUCTIONS.items():
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix", _fn, _np_fn,
        good={"mat": (_dom(4, 5),), "mat2": (_dom(2, 7),)},
        grad={"mat": (_dom(3, 4),)} if _diff else None,
    )

TestAllMatrix = makeTester(
    "TestAllMatrix",
    lambda x: at.all(x, axis=0),
    lambda x: np.all(x, axis=0),
    good={"bools": (ints(4, 3, lo=0, hi=2).astype(bool),)},
)

TestAnyMatrix = makeTester(
    "TestAnyMatrix",
    lambda x: at.any(x, axis=0),
    lambda x: np.any(x, axis=0),
    good={"bools": (ints(4, 3, lo=0, hi=2).astype(bool),)},
)


# ---------------------------------------------------------------------------
# structural / shape ops
# ---------------------------------------------------------------------------

TestReshapeMatrix = makeTester(
    "TestReshapeMatrix",
    lambda x: at.reshape(x, (2, 6)),
    lambda x: np.reshape(x, (2, 6)),
    good={"mat": (d(3, 4),), "vec": (d(12),)},
    bad_runtime={"wrong_size": (d(5, 5),)},
    grad={"mat": (d(3, 4),)},
)

TestFlattenMatrix = makeTester(
    "TestFlattenMatrix",
    at.flatten,
    np.ravel,
    good={"t3": (d(2, 3, 4),)},
    grad={"t3": (d(2, 2, 2),)},
)

TestTransposeMatrix = makeTester(
    "TestTransposeMatrix",
    lambda x: x.T,
    np.transpose,
    good={"mat": (d(3, 4),)},
    grad={"mat": (d(3, 4),)},
)

TestStackMatrix = makeTester(
    "TestStackMatrix",
    lambda a, b: at.stack([a, b], axis=0),
    lambda a, b: np.stack([a, b], axis=0),
    good={"mats": (d(3, 4), d(3, 4))},
    grad={"mats": (d(2, 3), d(2, 3))},
)

TestJoinAx1Matrix = makeTester(
    "TestJoinAx1Matrix",
    lambda a, b: at.join(1, a, b),
    lambda a, b: np.concatenate([a, b], axis=1),
    good={"mats": (d(3, 2), d(3, 5))},
    bad_runtime={"mismatch": (d(3, 2), d(4, 2))},
    grad={"mats": (d(2, 2), d(2, 3))},
)

TestSplitMatrix = makeTester(
    "TestSplitMatrix",
    lambda x: at.split(x, [2, 3], 2, axis=0),
    lambda x: (x[:2], x[2:]),
    good={"mat": (d(5, 3),)},
    grad={"mat": (d(5, 3),)},
)

TestTrilMatrix = makeTester(
    "TestTrilMatrix", at.tril, np.tril,
    good={"mat": (d(4, 4),), "wide": (d(3, 5),)},
    grad={"mat": (d(3, 3),)},
)

TestTriuMatrix = makeTester(
    "TestTriuMatrix", at.triu, np.triu,
    good={"mat": (d(4, 4),)},
    grad={"mat": (d(3, 3),)},
)

TestDiagVecMatrix = makeTester(
    "TestDiagVecMatrix", at.diag, np.diag,
    good={"vec": (d(4),), "mat": (d(4, 4),)},
    grad={"vec": (d(4),), "mat": (d(3, 3),)},
)

TestOuterMatrix = makeTester(
    "TestOuterMatrix", at.outer, np.outer,
    good={"vecs": (d(3), d(5))},
    grad={"vecs": (d(3), d(4))},
)

TestTensordotMatrix = makeTester(
    "TestTensordotMatrix",
    lambda a, b: at.tensordot(a, b, axes=2),
    lambda a, b: np.tensordot(a, b, axes=2),
    good={"t3": (d(2, 3, 4), d(3, 4, 5))},
    grad={"t3": (d(2, 2, 3), d(2, 3, 2))},
)

TestBatchedDotMatrix = makeTester(
    "TestBatchedDotMatrix",
    at.batched_dot,
    lambda a, b: np.einsum("bij,bjk->bik", a, b),
    good={"t3": (d(4, 2, 3), d(4, 3, 5))},
    bad_runtime={"batch_mismatch": (d(4, 2, 3), d(5, 3, 2))},
    grad={"t3": (d(2, 2, 3), d(2, 3, 2))},
)

TestSortMatrix = makeTester(
    "TestSortMatrix",
    lambda x: at.sort(x, axis=1),
    lambda x: np.sort(x, axis=1),
    good={"mat": (d(4, 6),)},
    grad={"mat": (d(3, 5),)},
)

TestArgsortMatrix = makeTester(
    "TestArgsortMatrix",
    lambda x: at.argsort(x, axis=1),
    lambda x: np.argsort(x, axis=1, kind="stable"),
    good={"mat": (d(4, 6),)},
)


# ---------------------------------------------------------------------------
# extra_ops
# ---------------------------------------------------------------------------

TestCumprodMatrix = makeTester(
    "TestCumprodMatrix",
    lambda x: at.extra_ops.cumprod(x, axis=1),
    lambda x: np.cumprod(x, axis=1),
    good={"mat": (d(3, 4),)},
    grad={"mat": (pos(3, 4),)},
)

TestDiffMatrix = makeTester(
    "TestDiffMatrix",
    lambda x: at.extra_ops.diff(x, axis=0),
    lambda x: np.diff(x, axis=0),
    good={"mat": (d(5, 3),)},
    grad={"mat": (d(4, 3),)},
)

TestRepeatMatrix = makeTester(
    "TestRepeatMatrix",
    lambda x: at.repeat(x, 3, axis=1),
    lambda x: np.repeat(x, 3, axis=1),
    good={"mat": (d(2, 4),)},
    grad={"mat": (d(2, 3),)},
)

TestTileMatrix = makeTester(
    "TestTileMatrix",
    lambda x: at.tile(x, (2, 3)),
    lambda x: np.tile(x, (2, 3)),
    good={"mat": (d(2, 2),)},
    grad={"mat": (d(2, 2),)},
)

TestSearchsortedMatrix = makeTester(
    "TestSearchsortedMatrix",
    at.extra_ops.searchsorted,
    np.searchsorted,
    good={"basic": (np.sort(d(8)), d(5))},
)

# bartlett's output shape depends on the VALUE of n — a py-path op by
# design (XLA needs static shapes); exercised in tests/tensor/ py-mode

TestFillDiagonalMatrix = makeTester(
    "TestFillDiagonalMatrix",
    at.extra_ops.fill_diagonal,
    lambda a, v: np.copyto(a.copy(), a) or (
        lambda b: (np.fill_diagonal(b, v), b)[1]
    )(a.copy()),
    good={"mat": (d(4, 4), np.asarray(0.0))},
)

TestBroadcastToMatrix = makeTester(
    "TestBroadcastToMatrix",
    lambda x: at.extra_ops.broadcast_to(x, (3, 4)),
    lambda x: np.broadcast_to(x, (3, 4)).copy(),
    good={"row": (d(1, 4),), "vec": (d(4),)},
    grad={"row": (d(1, 4),)},
)

TestSqueezeMatrix = makeTester(
    "TestSqueezeMatrix",
    lambda x: at.extra_ops.squeeze(x, axis=1),
    lambda x: np.squeeze(x, axis=1),
    good={"mat": (d(3, 1, 4),)},
    grad={"mat": (d(3, 1, 4),)},
)

TestUnravelIndexMatrix = makeTester(
    "TestUnravelIndexMatrix",
    lambda i: at.extra_ops.unravel_index(i, (3, 4)),
    lambda i: np.unravel_index(i, (3, 4)),
    good={"vec": (ints(5, lo=0, hi=12),)},
)

TestRavelMultiIndexMatrix = makeTester(
    "TestRavelMultiIndexMatrix",
    lambda a, b: at.extra_ops.ravel_multi_index((a, b), (3, 4)),
    lambda a, b: np.ravel_multi_index((a, b), (3, 4)),
    good={"vecs": (ints(5, lo=0, hi=3), ints(5, lo=0, hi=4))},
)


# ---------------------------------------------------------------------------
# linalg (nlinalg + slinalg)
# ---------------------------------------------------------------------------

TestDetMatrix = makeTester(
    "TestDetMatrix", nl.det, np.linalg.det,
    good={"spd": (spd(4),), "rand": (d(3, 3) + 3 * np.eye(3),)},
    grad={"spd": (spd(3),)},
)

TestInvMatrix = makeTester(
    "TestInvMatrix", nl.matrix_inverse, np.linalg.inv,
    good={"spd": (spd(4),)},
    grad={"spd": (spd(3),)},
)

TestPinvMatrix = makeTester(
    "TestPinvMatrix", nl.pinv, np.linalg.pinv,
    good={"tall": (d(5, 3),), "square": (spd(3),)},
)

TestEighMatrix = makeTester(
    "TestEighMatrix",
    lambda x: nl.eigh(x)[0],
    lambda x: np.linalg.eigh(x)[0],
    good={"spd": (spd(4),)},
    grad={"spd": (spd(3),)},
)

TestSVDValsMatrix = makeTester(
    "TestSVDValsMatrix",
    lambda x: nl.svd(x, compute_uv=False),
    lambda x: np.linalg.svd(x, compute_uv=False),
    good={"tall": (d(5, 3),), "square": (d(4, 4),)},
)

TestQRMatrix = makeTester(
    "TestQRMatrix",
    lambda x: nl.qr(x, mode="r"),
    lambda x: np.linalg.qr(x, mode="r"),
    good={"square": (spd(3),)},
)

TestCholeskyMatrix = makeTester(
    "TestCholeskyMatrix", sl.cholesky, np.linalg.cholesky,
    good={"spd": (spd(4),)},
    grad={"spd": (spd(3),)},
)

TestSolveMatrix = makeTester(
    "TestSolveMatrix", sl.solve, np.linalg.solve,
    good={"mat_rhs": (spd(4), d(4, 2)), "vec_rhs": (spd(4), d(4))},
    grad={"mat_rhs": (spd(3), d(3, 2))},
)

TestSolveTriangularMatrix = makeTester(
    "TestSolveTriangularMatrix",
    lambda a, b: sl.solve_triangular(a, b, lower=True),
    lambda a, b: scipy_linalg.solve_triangular(a, b, lower=True),
    good={"lower": (np.linalg.cholesky(spd(4)), d(4, 2))},
    grad={"lower": (np.linalg.cholesky(spd(3)), d(3, 2))},
)

TestExpmMatrix = makeTester(
    "TestExpmMatrix", sl.expm, scipy_linalg.expm,
    good={"small": (d(3, 3) * 0.3,)},
)

TestKronMatrix = makeTester(
    "TestKronMatrix", sl.kron, np.kron,
    good={"mats": (d(2, 3), d(3, 2))},
    grad={"mats": (d(2, 2), d(2, 2))},
)

TestTraceMatrix = makeTester(
    "TestTraceMatrix", nl.trace, np.trace,
    good={"square": (d(4, 4),), "wide": (d(3, 5),)},
    grad={"square": (d(3, 3),)},
)

TestNormMatrix = makeTester(
    "TestNormMatrix",
    lambda x: nl.norm(x, 2),
    lambda x: np.linalg.norm(x, 2),
    good={"vec": (d(6),)},
)


# ---------------------------------------------------------------------------
# special
# ---------------------------------------------------------------------------

TestLogSoftmaxMatrix = makeTester(
    "TestLogSoftmaxMatrix",
    lambda x: at.special.log_softmax(x, axis=-1),
    lambda x: x - x.max(-1, keepdims=True)
    - np.log(np.exp(x - x.max(-1, keepdims=True)).sum(-1, keepdims=True)),
    good={"mat": (d(4, 6),), "big": (100 * d(3, 4),)},
    grad={"mat": (d(3, 4),)},
)

TestXlogxMatrix = makeTester(
    "TestXlogxMatrix",
    lambda x: at.math.xlogx(x) if hasattr(at.math, "xlogx") else
    __import__("aesara_tpu.tensor.xlogx", fromlist=["xlogx"]).xlogx(x),
    lambda x: x * np.log(x),
    good={"pos": (pos(4, 3),)},
    grad={"pos": (pos(3, 3),)},
)
