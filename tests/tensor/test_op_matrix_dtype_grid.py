"""Dtype-corner op matrices (VERDICT r3 #5): every elemwise family,
reduction, and cast exercised across the FULL dtype grid — bool, the
four uints, the four ints, float16/32/64, complex64/128 — with the
declared output dtype pinned, values differentially checked on BOTH
backends (py perform vs whole-graph XLA), and unsupported combos
asserted to fail loudly.

The expected-dtype tables below are the framework's documented policy
(scalar/ops.py: numpy ``promote_types`` for same-kind ops,
``upgrade_to_float``→floatX for discrete→float transcendentals — the
TPU-native divergence from the reference's int64→float64 mapping,
SURVEY §2.4) and were cross-checked against the reference's
scalar dtype rules (``/root/reference/aesara/scalar/basic.py``
upcast_out/upgrade_to_float/same_out families).

Batched for suite speed: ONE compiled function per (dtype, backend)
evaluates every supported op of the family at once.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)
MODES = [(PY, "py"), (JAX, "jax")]

BOOL = ["bool"]
UINTS = ["uint8", "uint16", "uint32", "uint64"]
INTS = ["int8", "int16", "int32", "int64"]
FLOATS = ["float16", "float32", "float64"]
COMPLEX = ["complex64", "complex128"]
DISCRETE = BOOL + UINTS + INTS
ALL = DISCRETE + FLOATS + COMPLEX

rng = np.random.default_rng(20260818)


def sample(dtype, domain="d", shape=(5,)):
    """Domain-respecting sample for one dtype."""
    if dtype == "bool":
        base = ([True] * 5 if domain == "pos"  # nonzero denominators
                else [True, False, True, True, False])
        return np.array(base)[: shape[0] if shape else 5].reshape(shape)
    if dtype in UINTS:
        return rng.integers(1, 6, size=shape).astype(dtype)
    if dtype in INTS:
        lo = 1 if domain in ("pos", "unit") else -3
        v = rng.integers(lo, 6, size=shape).astype(dtype)
        if domain not in ("pos", "unit"):
            v.flat[0] = -2  # always one negative element
        return v
    if dtype in COMPLEX:
        re = rng.uniform(0.2, 0.9, size=shape)
        im = rng.uniform(-0.4, 0.4, size=shape)
        return (re + 1j * im).astype(dtype)
    if domain == "pos":
        return rng.uniform(0.3, 2.5, size=shape).astype(dtype)
    if domain == "unit":
        return rng.uniform(0.05, 0.85, size=shape).astype(dtype)
    v = rng.uniform(-2.0, 2.0, size=shape).astype(dtype)
    v.flat[0] = -1.25
    return v


def _tol(out_dtype):
    if out_dtype == "float16":
        return dict(rtol=2e-2, atol=2e-2)
    if out_dtype in ("float32", "complex64"):
        return dict(rtol=2e-4, atol=1e-5)
    return dict(rtol=1e-8, atol=1e-10)


def _check_family(table, dtype, oracle_dtype="float64"):
    """Compile one function per backend over all ops supported at
    `dtype`; assert declared dtype, py/jax dtype equality, and values
    vs the float64/complex128 numpy oracle."""
    todo = []
    x = at.vector("x", dtype=dtype)
    for name, (fn, np_fn, domain, want_of) in table.items():
        want = want_of(dtype)
        if want is None:
            # unsupported: graph build must raise (loud failure, not
            # silent wrong dtype)
            with pytest.raises(Exception):
                out = fn(x)
                # some combos only fail when the impl runs
                function([x], out, mode=PY)(sample(dtype, domain))
            continue
        todo.append((name, fn, np_fn, domain, want))
    if not todo:
        return
    vals = [sample(dtype, domain) for (_, _, _, domain, _) in todo]
    results = {}
    for mode, label in MODES:
        outs = [fn(at.as_tensor_variable(v))
                for (_, fn, _, _, _), v in zip(todo, vals)]
        f = function([], outs, mode=mode)
        results[label] = f()
    for i, (name, fn, np_fn, domain, want) in enumerate(todo):
        v = vals[i]
        for label in ("py", "jax"):
            r = np.asarray(results[label][i])
            assert str(r.dtype) == want, (
                f"{name}[{dtype}] backend={label}: dtype {r.dtype} != {want}"
            )
        if want in DISCRETE:
            # same-dtype discrete algebra: exact, computed in the output
            # dtype itself (unsigned neg wraps modulo 2**bits — correct)
            expect = np_fn(v.astype(want))
            for label in ("py", "jax"):
                np.testing.assert_array_equal(
                    np.asarray(results[label][i]), expect,
                    err_msg=f"{name}[{dtype}] backend={label}",
                )
        else:
            hi = v.astype("complex128" if "complex" in dtype else "float64")
            expect = np_fn(hi)
            for label in ("py", "jax"):
                r = np.asarray(results[label][i])
                np.testing.assert_allclose(
                    np.asarray(r, dtype=expect.dtype), expect,
                    **_tol(want), err_msg=f"{name}[{dtype}] backend={label}",
                )


# --- expected-dtype rules ---------------------------------------------------

def same_out(dt):
    return dt


def same_out_nocomplex(dt):
    return None if dt in COMPLEX else dt


def same_out_nobool(dt):
    return None if dt == "bool" else dt


def upf(dt):
    """upgrade_to_float: discrete→floatX (float32), floats/complex keep."""
    return "float32" if dt in DISCRETE else dt


def upf_nocomplex(dt):
    return None if dt in COMPLEX else upf(dt)


def complex_to_real(dt):
    return {"complex64": "float32", "complex128": "float64"}.get(dt, dt)


def real_only(dt):
    return complex_to_real(dt)


def bool_out(dt):
    return "bool"


# --- the unary family -------------------------------------------------------

UNARY = {
    # same-dtype algebra
    "neg": (at.neg, np.negative, "d", same_out_nobool),
    "abs": (at.abs, np.abs, "d", complex_to_real),   # complex modulus is REAL
    "sqr": (at.sqr, np.square, "d", same_out),
    "sgn": (at.sgn, np.sign, "d",
            lambda dt: None if dt in COMPLEX + BOOL else dt),
    "ceil": (at.ceil, np.ceil, "d", same_out_nocomplex),
    "floor": (at.floor, np.floor, "d", same_out_nocomplex),
    "trunc": (tm.trunc, np.trunc, "d", same_out_nocomplex),
    "round": (at.round, np.round, "d", same_out_nocomplex),
    # discrete→floatX transcendentals
    "exp": (at.exp, np.exp, "d", upf),
    "exp2": (tm.exp2, np.exp2, "d", upf),
    "expm1": (tm.expm1, np.expm1, "d", upf),
    "log": (at.log, np.log, "pos", upf),
    "log2": (tm.log2, np.log2, "pos", upf),
    "log10": (tm.log10, np.log10, "pos", upf),
    "log1p": (at.log1p, np.log1p, "pos", upf),
    "sqrt": (at.sqrt, np.sqrt, "pos", upf),
    "sin": (at.sin, np.sin, "d", upf),
    "cos": (at.cos, np.cos, "d", upf),
    "tan": (at.tan, np.tan, "unit", upf),
    "arcsin": (at.arcsin, np.arcsin, "unit", upf),
    "arccos": (at.arccos, np.arccos, "unit", upf),
    "arctan": (at.arctan, np.arctan, "d", upf),
    "sinh": (at.sinh, np.sinh, "d", upf),
    "cosh": (at.cosh, np.cosh, "d", upf),
    "tanh": (at.tanh, np.tanh, "d", upf),
    "arcsinh": (tm.arcsinh, np.arcsinh, "d", upf),
    "arctanh": (tm.arctanh, np.arctanh, "unit", upf),
    "reciprocal": (tm.reciprocal, lambda v: 1.0 / v, "pos", upf),
    # float-only special functions (no complex on either backend)
    "sigmoid": (tm.sigmoid, lambda v: 1.0 / (1.0 + np.exp(-v)), "d",
                upf_nocomplex),
    "softplus": (tm.softplus, lambda v: np.logaddexp(0.0, v), "d",
                 upf_nocomplex),
    "erf": (tm.erf, None, "d", upf_nocomplex),        # oracle set below
    "erfc": (tm.erfc, None, "d", upf_nocomplex),
    "gammaln": (tm.gammaln, None, "pos", upf_nocomplex),
    # complex components: complex→real, real passthrough
    "real": (tm.real, np.real, "d", complex_to_real),
    "imag": (tm.imag, np.imag, "d", complex_to_real),
    "conj": (tm.conj, np.conj, "d", same_out),
    # predicates
    "isnan": (tm.isnan, np.isnan, "d", bool_out),
    "isinf": (tm.isinf, np.isinf, "d", bool_out),
}

import scipy.special as _sps  # noqa: E402

UNARY["erf"] = (tm.erf, _sps.erf, "d", upf_nocomplex)
UNARY["erfc"] = (tm.erfc, _sps.erfc, "d", upf_nocomplex)
UNARY["gammaln"] = (tm.gammaln, _sps.gammaln, "pos", upf_nocomplex)


@pytest.mark.parametrize("dtype", ALL)
def test_unary_grid(dtype):
    _check_family(UNARY, dtype)


def test_abs_complex_is_real_modulus():
    """Regression: Abs on complex returns the REAL modulus dtype
    (complex64→float32), reference scalar/basic.py:2544."""
    for dt, want in [("complex64", "float32"), ("complex128", "float64")]:
        x = at.vector("x", dtype=dt)
        o = at.abs(x)
        assert o.type.dtype == want
        v = np.array([3 + 4j, 1 - 1j], dtype=dt)
        for mode, label in MODES:
            r = np.asarray(function([x], o, mode=mode)(v))
            assert str(r.dtype) == want, label
            np.testing.assert_allclose(r, np.abs(v), rtol=1e-5)


def test_abs_complex_grad_is_cr_derivative():
    """grad of |z| is z/|z| in the CR sense (reference :2568)."""
    from aesara_tpu.gradient import grad

    x = at.vector("x", dtype="complex128")
    g = grad(at.abs(x).sum(), x)
    v = np.array([3 + 4j, 1 + 0j], dtype="complex128")
    r = function([x], g, mode=PY)(v)
    np.testing.assert_allclose(np.asarray(r), v / np.abs(v), rtol=1e-10)


def test_reciprocal_dtype_policy():
    """Regression: reciprocal is the Reciprocal elemwise with
    upgrade_to_float — f16 stays f16, every int width goes to floatX,
    NOT value-promoted through a float constant."""
    for dt, want in [("float16", "float16"), ("int8", "float32"),
                     ("int32", "float32"), ("uint64", "float32"),
                     ("float64", "float64"), ("complex64", "complex64")]:
        assert tm.reciprocal(at.vector(dtype=dt)).type.dtype == want, dt


def test_intdiv_mod_reject_complex_at_build():
    """Regression: complex_error ops raise at graph construction
    (reference IntDiv/Mod complex_error), not deep inside the backend."""
    c = at.vector("c", dtype="complex64")
    for fn in (tm.int_div, tm.mod):
        with pytest.raises(TypeError):
            fn(c, c)
        with pytest.raises(TypeError):
            fn(at.vector(dtype="float32"), c)


# --- the binary family ------------------------------------------------------

# (lhs dtype, rhs dtype) pairs spanning every promotion class:
# same-kind, cross-signedness, uint64+int (→float64!), int+float16,
# float+complex, bool mixes
PAIRS = [
    ("bool", "bool"), ("bool", "int8"), ("bool", "float32"),
    ("uint8", "uint8"), ("uint8", "int8"), ("uint8", "uint16"),
    ("uint16", "int16"), ("uint32", "int32"), ("uint64", "int64"),
    ("uint64", "uint64"),
    ("int8", "int8"), ("int8", "int32"), ("int64", "int64"),
    ("int64", "float16"), ("int32", "float32"),
    ("float16", "float16"), ("float16", "float32"),
    ("float32", "float64"), ("float64", "float64"),
    ("float64", "complex64"), ("complex64", "complex64"),
    ("complex64", "complex128"),
]


def promote(da, db):
    return np.promote_types(da, db).name


def promote_div(da, db):
    p = promote(da, db)
    if p in DISCRETE:
        return "float32" if np.promote_types(p, "int16").name != "float64" else p
    return p


def _div_expect(da, db):
    """true_div: promote, then discrete results upgrade to floatX unless
    the numpy promotion itself already went float (int+float16 cases)."""
    p = promote(da, db)
    if p in DISCRETE:
        # uint64+int64 promotes to float64 in numpy already
        return "float32"
    return p


BINARY = {
    "add": (at.add, np.add, False),
    "sub": (at.sub, np.subtract, False),
    "mul": (at.mul, np.multiply, False),
    "maximum": (at.maximum, np.maximum, False),
    "minimum": (at.minimum, np.minimum, False),
    "pow": (tm.pow, np.power, False),
    "true_div": (at.true_div, np.true_divide, True),
}


@pytest.mark.parametrize("da,db", PAIRS, ids=[f"{a}-{b}" for a, b in PAIRS])
def test_binary_grid(da, db):
    todo = []
    for name, (fn, np_fn, is_div) in BINARY.items():
        if name == "sub" and (da == "bool" and db == "bool"):
            continue  # numpy forbids bool subtract; build may or may not
        want = _div_expect(da, db) if is_div else promote(da, db)
        va = sample(da, "pos")
        vb = sample(db, "pos")
        todo.append((name, fn, np_fn, want, va, vb))
    results = {}
    for mode, label in MODES:
        outs = [fn(at.as_tensor_variable(va), at.as_tensor_variable(vb))
                for (_, fn, _, _, va, vb) in todo]
        results[label] = function([], outs, mode=mode)()
    for i, (name, fn, np_fn, want, va, vb) in enumerate(todo):
        for label in ("py", "jax"):
            r = np.asarray(results[label][i])
            assert str(r.dtype) == want, (
                f"{name}[{da},{db}] backend={label}: {r.dtype} != {want}"
            )
        if want in DISCRETE:
            # integer results must be EXACT: oracle computed in the
            # promoted dtype itself (bool add = logical OR, etc.)
            expect = np_fn(va.astype(want), vb.astype(want))
            for label in ("py", "jax"):
                np.testing.assert_array_equal(
                    np.asarray(results[label][i]), expect,
                    err_msg=f"{name}[{da},{db}] backend={label}",
                )
        else:
            iscplx = "complex" in va.dtype.name or "complex" in vb.dtype.name
            hi = "complex128" if iscplx else "float64"
            expect = np_fn(va.astype(hi), vb.astype(hi))
            for label in ("py", "jax"):
                np.testing.assert_allclose(
                    np.asarray(results[label][i]).astype(expect.dtype),
                    expect, **_tol(want),
                    err_msg=f"{name}[{da},{db}] backend={label}",
                )


@pytest.mark.parametrize("da,db", [("int8", "int8"), ("uint8", "int32"),
                                   ("int64", "int64"), ("bool", "int16")])
def test_int_binary_grid(da, db):
    """int_div / mod / bitwise family on integer pairs: promote_types
    dtype, exact values, both backends."""
    table = [("int_div", tm.int_div, np.floor_divide),
             ("mod", tm.mod, np.mod),
             ("bitwise_and", tm.bitwise_and, np.bitwise_and),
             ("bitwise_or", tm.bitwise_or, np.bitwise_or),
             ("bitwise_xor", tm.bitwise_xor, np.bitwise_xor)]
    va, vb = sample(da, "pos"), sample(db, "pos")
    want = promote(da, db)
    outs = [fn(at.as_tensor_variable(va), at.as_tensor_variable(vb))
            for _, fn, _ in table]
    for mode, label in MODES:
        res = function([], outs, mode=mode)()
        for (name, _, np_fn), r in zip(table, res):
            r = np.asarray(r)
            assert str(r.dtype) == want, f"{name}[{da},{db}] {label}"
            np.testing.assert_array_equal(
                r, np_fn(va.astype(want), vb.astype(want)),
                err_msg=f"{name}[{da},{db}] backend={label}",
            )


@pytest.mark.parametrize("da,db", [("int32", "int32"), ("float16", "float64"),
                                   ("uint8", "int8"),
                                   ("complex64", "complex64")])
def test_comparison_grid(da, db):
    """lt/gt/le/ge/eq/neq always emit bool on every operand mix
    (complex included for eq/neq only, reference forbids ordering
    complex)."""
    ordered = [("lt", tm.lt, np.less), ("gt", tm.gt, np.greater),
               ("le", tm.le, np.less_equal), ("ge", tm.ge, np.greater_equal)]
    anyk = [("eq", tm.eq, np.equal), ("neq", tm.neq, np.not_equal)]
    va, vb = sample(da), sample(db)
    table = anyk if "complex" in (da, db) or "complex" in da else ordered + anyk
    if "complex" in da or "complex" in db:
        table = anyk
    outs = [fn(at.as_tensor_variable(va), at.as_tensor_variable(vb))
            for _, fn, _ in table]
    for mode, label in MODES:
        res = function([], outs, mode=mode)()
        for (name, _, np_fn), r in zip(table, res):
            r = np.asarray(r)
            assert str(r.dtype) == "bool", f"{name}[{da},{db}] {label}"
            np.testing.assert_array_equal(
                r, np_fn(va, vb), err_msg=f"{name}[{da},{db}] {label}"
            )


# --- reductions -------------------------------------------------------------

REDUCE = {
    # acc-widening: sum/prod of narrow ints accumulate in the widest kind
    # (reference CAReduce acc_dtype: bool/int→int64, uint→uint64)
    "sum": (at.sum, np.sum,
            lambda dt: "uint64" if dt in UINTS else
            ("int64" if dt in BOOL + INTS else dt)),
    "prod": (at.prod, np.prod,
             lambda dt: "uint64" if dt in UINTS else
             ("int64" if dt in BOOL + INTS else dt)),
    "max": (lambda x: at.max(x, axis=0), lambda v: np.max(v, axis=0), same_out),
    "min": (lambda x: at.min(x, axis=0), lambda v: np.min(v, axis=0), same_out),
    "mean": (at.mean, np.mean, upf),
    "argmax": (lambda x: at.argmax(x, axis=0),
               lambda v: np.argmax(v, axis=0), lambda dt: "int64"),
    "any": (at.any, np.any, bool_out),
    "all": (at.all, np.all, bool_out),
}


@pytest.mark.parametrize("dtype", DISCRETE + FLOATS + ["complex64"])
def test_reduce_grid(dtype):
    todo = []
    for name, (fn, np_fn, want_of) in REDUCE.items():
        if name in ("max", "min", "argmax") and dtype == "complex64":
            continue  # ordering reductions are not defined for complex
        todo.append((name, fn, np_fn, want_of(dtype), sample(dtype, "pos")))
    for mode, label in MODES:
        outs = [fn(at.as_tensor_variable(v)) for (_, fn, _, _, v) in todo]
        res = function([], outs, mode=mode)()
        for (name, _, np_fn, want, v), r in zip(todo, res):
            r = np.asarray(r)
            assert str(r.dtype) == want, (
                f"{name}[{dtype}] backend={label}: {r.dtype} != {want}"
            )
            hi = v.astype("complex128" if "complex" in dtype else "float64")
            np.testing.assert_allclose(
                np.asarray(r, np_fn(hi).dtype if hasattr(np_fn(hi), 'dtype')
                           else "float64"),
                np_fn(hi), **_tol(want if want not in DISCRETE else "float64"),
                err_msg=f"{name}[{dtype}] backend={label}",
            )


@pytest.mark.parametrize("dtype", ["int8", "uint8", "float16"])
def test_sum_acc_dtype_override(dtype):
    """Explicit acc_dtype/dtype kwargs respected through both backends."""
    v = sample(dtype, "pos")
    x = at.as_tensor_variable(v)
    out = at.sum(x, dtype="float64")
    for mode, label in MODES:
        r = np.asarray(function([], out, mode=mode)())
        assert str(r.dtype) == "float64", label
        np.testing.assert_allclose(r, v.astype("float64").sum(), rtol=1e-10)


# --- casts ------------------------------------------------------------------

CAST_TARGETS = ["bool", "uint8", "int16", "int64", "float16", "float32",
                "float64", "complex64", "complex128"]


@pytest.mark.parametrize("src", ["bool", "uint8", "int32", "float16",
                                 "float64", "complex64"])
def test_cast_grid(src):
    """cast(src→target) for every target: exact numpy astype semantics
    on both backends (complex→real discards imag with numpy's rule)."""
    v = sample(src, "pos")
    x = at.as_tensor_variable(v)
    todo = [t for t in CAST_TARGETS
            if not ("complex" in src and "complex" not in t)]
    outs = [at.cast(x, t) for t in todo]
    for mode, label in MODES:
        res = function([], outs, mode=mode)()
        for t, r in zip(todo, res):
            r = np.asarray(r)
            assert str(r.dtype) == t, f"cast {src}->{t} backend={label}"
            np.testing.assert_array_equal(
                r, v.astype(t), err_msg=f"cast {src}->{t} backend={label}"
            )


def test_cast_complex_to_real_requires_explicit_real():
    """complex→float casts go through real()/imag(), never silently."""
    c = at.vector("c", dtype="complex64")
    v = np.array([1 + 2j, 3 - 1j], dtype="complex64")
    out = at.cast(tm.real(c), "float64")
    r = function([c], out, mode=PY)(v)
    np.testing.assert_allclose(np.asarray(r), [1.0, 3.0])


# --- empty and 0-d operands -------------------------------------------------

@pytest.mark.parametrize("dtype", ["float32", "int32", "complex64"])
@pytest.mark.parametrize("shape", [(0,), (0, 3), (3, 0)])
def test_unary_empty(dtype, shape):
    """Zero-size operands flow through the elemwise families on both
    backends with the same dtype rules and produce zero-size results."""
    fns = [at.exp, at.neg, at.sqr, at.abs]
    if dtype != "complex64":
        fns.append(at.floor)
    v = np.zeros(shape, dtype=dtype)
    x = at.as_tensor_variable(v)
    outs = [fn(x) for fn in fns]
    for mode, label in MODES:
        res = function([], outs, mode=mode)()
        for fn, r in zip(fns, res):
            r = np.asarray(r)
            assert r.shape == shape, f"{fn}[{dtype}{shape}] {label}"


@pytest.mark.parametrize("dtype", ["float64", "int16", "complex128"])
def test_unary_zero_d(dtype):
    """0-d tensors: scalars-as-tensors keep the grid's dtype rules."""
    v = sample(dtype, "pos", shape=())
    x = at.as_tensor_variable(np.asarray(v))
    for mode, label in MODES:
        r = np.asarray(function([], at.exp(x), mode=mode)())
        assert r.shape == ()
        want = "float32" if dtype in DISCRETE else dtype
        assert str(r.dtype) == want, label
        hi = np.asarray(v).astype(
            "complex128" if "complex" in dtype else "float64")
        np.testing.assert_allclose(
            np.asarray(r, hi.dtype), np.exp(hi), **_tol(str(r.dtype)))


@pytest.mark.parametrize("dtype", ["float32", "int64"])
def test_reduce_empty(dtype):
    """Reductions over zero-size arrays: sum=0, prod=1 (identity
    elements), any=False, all=True — on both backends."""
    v = np.zeros((0,), dtype=dtype)
    x = at.as_tensor_variable(v)
    outs = [at.sum(x), at.prod(x), at.any(x), at.all(x)]
    for mode, label in MODES:
        s, p, a, al = [np.asarray(r) for r in function([], outs, mode=mode)()]
        assert s == 0 and p == 1, label
        assert a == np.False_ and al == np.True_, label
