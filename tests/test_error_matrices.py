"""Error-path matrices for sparse / scan / compile (VERDICT r4 item 4).

The reference's makeTester corpus pins ``bad_build`` (graph
construction must raise, cheaply) and ``bad_runtime`` (execution must
raise, with a useful message) per op family; round 4 covered the §2.5
tensor families — this module extends the axis to the sparse pack, the
scan machinery, and the compile driver, on BOTH backends where runtime
semantics allow (XLA cannot raise data-dependent errors; divergences
are pinned explicitly, never silently).
"""

import numpy as np
import pytest
import scipy.sparse as sps

import aesara_tpu as atp
import aesara_tpu.tensor as at
import aesara_tpu.tensor.math as tm
from aesara_tpu.compile.function import In, Out, function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.scan import scan
from aesara_tpu.sparse import basic as sb

PY = Mode(PerformLinker(), OPT_NONE)

rng = np.random.default_rng(99)


def _csr(n=6, d=8, density=0.3, dtype="float64", seed=0):
    return sps.random(n, d, density=density, format="csr", dtype=dtype,
                      random_state=np.random.RandomState(seed))


# ---------------------------------------------------------------------------
# sparse: build-time rejects
# ---------------------------------------------------------------------------

SPARSE_BAD_BUILD = {
    "structured_dot_dense_both": lambda: sb.structured_dot(
        at.matrix("a", dtype="float64"), at.matrix("b", dtype="float64")),
    "structured_dot_3d_rhs": lambda: sb.structured_dot(
        sb.SparseTensorType("csr", "float64", (None, None))("s"),
        at.tensor3("t", dtype="float64")),
    "csm_bad_format": lambda: sb.SparseTensorType("bogus", "float64",
                                                  (None, None)),
    "as_sparse_dense_var": lambda: sb.as_sparse_variable(
        at.matrix("m", dtype="float64")),
    "sp_sum_bad_axis": lambda: sb.sp_sum(
        sb.SparseTensorType("csr", "float64", (None, None))("s"), axis=3),
    "transpose_dense": lambda: sb.transpose(at.matrix("m", dtype="float64")),
    "dot_both_dense": lambda: sb.true_dot(
        at.matrix("a", dtype="float64"), at.matrix("b", dtype="float64")),
}


@pytest.mark.parametrize("case", sorted(SPARSE_BAD_BUILD))
def test_sparse_bad_build(case):
    with pytest.raises((TypeError, ValueError, NotImplementedError)):
        SPARSE_BAD_BUILD[case]()


# ---------------------------------------------------------------------------
# sparse: runtime failures (PY oracle path raises; shapes checked at feed)
# ---------------------------------------------------------------------------

class TestSparseBadRuntime:
    def test_structured_dot_shape_mismatch(self):
        s = sb.SparseTensorType("csr", "float64", (None, None))("s")
        b = at.vector("b", dtype="float64")
        out = sb.structured_dot(s, at.shape_padright(b)).flatten()
        f = function([s, b], out, mode=PY)
        with pytest.raises(Exception):
            f(_csr(6, 8), np.ones(5))  # inner dim 8 != 5

    def test_feed_dense_accepted_like_reference(self):
        # reference filter (sparse/type.py): non-strict accepts dense
        # and format conversions — only dtype loss is rejected
        s = sb.SparseTensorType("csr", "float64", (None, None))("s")
        f = function([s], sb.sp_sum(s), mode=PY)
        assert np.isclose(float(f(np.ones((3, 3)))), 9.0)

    def test_feed_wrong_format_converts(self):
        s = sb.SparseTensorType("csr", "float64", (None, None))("s")
        f = function([s], sb.sp_sum(s), mode=PY)
        m = _csr()
        assert np.isclose(float(f(m.tocsc())), m.sum())

    def test_feed_precision_losing_dtype_rejected(self):
        # float64 data into a float32 sparse input: reference raises
        # unless allow_downcast
        s = sb.SparseTensorType("csr", "float32", (None, None))("s")
        f = function([s], sb.sp_sum(s), mode=PY)
        with pytest.raises((TypeError, ValueError)):
            f(_csr(dtype="float64"))
        # the upcast direction is always fine
        s64 = sb.SparseTensorType("csr", "float64", (None, None))("t")
        f2 = function([s64], sb.sp_sum(s64), mode=PY)
        m32 = _csr(dtype="float32")
        assert np.isclose(float(f2(m32)), float(m32.sum()))

    def test_add_shape_mismatch(self):
        a = sb.SparseTensorType("csr", "float64", (None, None))("a")
        b = sb.SparseTensorType("csr", "float64", (None, None))("b")
        f = function([a, b], sb.add(a, b), mode=PY)
        with pytest.raises(Exception):
            f(_csr(6, 8), _csr(5, 8, seed=1))

    def test_usmm_z_shape_mismatch(self):
        a = sb.SparseTensorType("csr", "float64", (None, None))("a")
        y = at.matrix("y", dtype="float64")
        z = at.matrix("z", dtype="float64")
        out = sb.usmm(np.float64(1.0), a, y, z)
        f = function([a, y, z], out, mode=PY)
        f(_csr(6, 8), np.ones((8, 2)), np.zeros((6, 2)))  # sanity
        with pytest.raises(Exception):
            f(_csr(6, 8), np.ones((8, 2)), np.zeros((5, 2)))


# ---------------------------------------------------------------------------
# scan: build-time rejects
# ---------------------------------------------------------------------------

class TestScanBadBuild:
    def test_step_returns_wrong_count(self):
        x0 = at.scalar("x0", dtype="float64")
        with pytest.raises(Exception):
            scan(fn=lambda a: (a + 1.0, a + 2.0), outputs_info=[x0],
                 n_steps=4)

    def test_bad_taps_structure(self):
        x0 = at.vector("x0", dtype="float64")
        with pytest.raises(Exception):
            scan(fn=lambda a, b: a + b,
                 outputs_info=[{"initial": x0, "taps": [0]}], n_steps=4)

    def test_missing_outputs_info_for_recurrence(self):
        # fn expects a carry but none is declared
        with pytest.raises(Exception):
            scan(fn=lambda a: a + 1.0, outputs_info=[], n_steps=4)

    def test_dtype_changing_carry_rejected(self):
        x0 = at.scalar("x0", dtype="float64")
        with pytest.raises(Exception):
            # carry silently flips to complex: must be rejected at build
            scan(fn=lambda a: at.cast(a, "complex64"), outputs_info=[x0],
                 n_steps=4)

    def test_shape_changing_carry_rejected(self):
        x0 = at.vector("x0", dtype="float64")
        f = None
        try:
            ys, _ = scan(fn=lambda a: at.concatenate([a, a]),
                         outputs_info=[x0], n_steps=4)
            f = function([x0], ys, mode=PY)
        except Exception:
            return  # rejected at build: fine
        with pytest.raises(Exception):
            f(np.ones(3))  # else must fail at run, never silently wrong

    def test_negative_n_steps(self):
        x0 = at.scalar("x0", dtype="float64")
        with pytest.raises(ValueError, match="non-negative"):
            scan(fn=lambda a: a + 1.0, outputs_info=[x0], n_steps=-3)

    def test_sequence_shorter_than_n_steps(self):
        s = at.vector("s", dtype="float64")
        outs, _ = scan(fn=lambda a: a * 2.0, sequences=[s],
                       outputs_info=[None], n_steps=10)
        f = function([s], outs, mode=PY)
        with pytest.raises(Exception):
            f(np.ones(3))


# ---------------------------------------------------------------------------
# scan: runtime failures on both backends
# ---------------------------------------------------------------------------

class TestScanBadRuntimeBothBackends:
    def test_inner_assert_fires_py(self):
        from aesara_tpu.raise_op import assert_op

        s = at.vector("s", dtype="float64")
        outs, _ = scan(
            fn=lambda a: assert_op(a * 2.0, tm.all(tm.ge(a, 0.0))),
            sequences=[s], outputs_info=[None])
        f = function([s], outs, mode="PY")
        np.testing.assert_allclose(f(np.ones(3)), 2 * np.ones(3))
        with pytest.raises(Exception):
            f(np.array([1.0, -1.0, 2.0]))

    def test_inner_assert_divergence_pinned_xla(self):
        """PINNED divergence: XLA cannot raise data-dependent host
        exceptions (the policy pinned in tests/tensor/test_op_matrix_bad
        for gathers/cholesky) — a scan-inner Assert with a traced
        condition passes values through.  If this ever changes (e.g. a
        checkify integration), update the divergence table."""
        from aesara_tpu.raise_op import assert_op

        s = at.vector("s", dtype="float64")
        outs, _ = scan(
            fn=lambda a: assert_op(a * 2.0, tm.all(tm.ge(a, 0.0))),
            sequences=[s], outputs_info=[None])
        f = function([s], outs, mode="FAST_RUN")
        got = np.asarray(f(np.array([1.0, -1.0, 2.0])))
        np.testing.assert_allclose(got, [2.0, -2.0, 4.0])

    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_feed_bad_init_shape(self, mode):
        x0 = at.vector("x0", dtype="float64")
        s = at.matrix("s", dtype="float64")
        ys, _ = scan(fn=lambda sv, a: a + sv, sequences=[s],
                     outputs_info=[x0])
        f = function([s, x0], ys, mode=mode)
        with pytest.raises(Exception):
            r = f(np.ones((4, 3)), np.ones(5))
            np.asarray(r)


# ---------------------------------------------------------------------------
# compile driver: bad specs and feeds
# ---------------------------------------------------------------------------

class TestCompileBadBuild:
    def test_shared_in_inputs_rejected(self):
        w = atp.shared(np.ones(3), name="w")
        with pytest.raises(TypeError, match="shared"):
            function([w], w * 2)

    def test_constant_in_inputs_rejected(self):
        with pytest.raises(TypeError):
            function([at.constant(1.0)], at.constant(2.0))

    def test_update_target_not_shared(self):
        x = at.vector("x", dtype="float64")
        with pytest.raises(TypeError, match="update target"):
            function([x], x.sum(), updates={x * 2: x})

    def test_update_dtype_mismatch_rejected(self):
        w = atp.shared(np.ones(3, dtype="float32"), name="w")
        with pytest.raises((TypeError, ValueError)):
            function([], [], updates={w: at.cast(w, "complex64")})

    def test_duplicate_update_in_and_dict(self):
        x = at.scalar("x", dtype="float64")
        with pytest.raises(ValueError, match="both"):
            function([In(x, value=0.0, update=x + 1)], x,
                     updates={x: x + 2})

    def test_unknown_input_object(self):
        with pytest.raises(TypeError):
            function([3.14], None)

    def test_givens_cycle_detected(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        # a given that re-introduces the replaced variable is a cycle
        with pytest.raises(Exception):
            f = function([y], x * 2, givens={x: x + y})
            f(np.ones(3))

    def test_on_unused_input_raise(self):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        with pytest.raises(Exception):
            function([x, y], x.sum(), on_unused_input="raise")


class TestCompileBadFeeds:
    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_wrong_arity(self, mode):
        x = at.vector("x", dtype="float64")
        y = at.vector("y", dtype="float64")
        f = function([x, y], x + y, mode=mode)
        with pytest.raises(Exception):
            f(np.ones(3))
        with pytest.raises(Exception):
            f(np.ones(3), np.ones(3), np.ones(3))

    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_wrong_ndim(self, mode):
        x = at.vector("x", dtype="float64")
        f = function([x], x.sum(), mode=mode)
        with pytest.raises((TypeError, ValueError)):
            f(np.ones((3, 3)))

    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_static_shape_violation(self, mode):
        xt = at.TensorType("float64", (None, 4))("x")
        f = function([xt], xt.sum(), mode=mode)
        assert float(f(np.ones((2, 4)))) == 8.0
        with pytest.raises((TypeError, ValueError)):
            f(np.ones((2, 5)))

    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_precision_losing_downcast_rejected(self, mode):
        x = at.vector("x", dtype="float32")
        f = function([x], x.sum(), mode=mode)
        with pytest.raises((TypeError, ValueError)):
            f(np.ones(3, dtype="float64") * np.pi)

    def test_allow_downcast_accepts(self):
        x = at.vector("x", dtype="float32")
        f = function([In(x, allow_downcast=True)], x.sum(), mode="PY")
        assert np.isclose(float(f(np.ones(3, dtype="float64"))), 3.0)

    @pytest.mark.parametrize("mode", ["PY", "FAST_RUN"])
    def test_none_feed_rejected(self, mode):
        x = at.vector("x", dtype="float64")
        f = function([x], x * 2, mode=mode)
        with pytest.raises((TypeError, ValueError)):
            f(None)
