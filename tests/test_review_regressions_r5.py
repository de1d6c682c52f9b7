"""Regression tests for the round-5 depth-wave review findings — each
reproduces a confirmed wrong-result or type-lie from the adversarial
self-review of 2d97988..67cde7a."""

import numpy as np
import pytest
import scipy.sparse as sp

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.config import config


class TestMakeSliceIndexing:
    """_unwrap_slice must pad TRAILING Nones like MakeSlice.perform:
    make_slice(2) is slice(start=2), not slice(stop=2)."""

    def test_one_arg_is_start(self):
        from aesara_tpu.tensor.type_other import make_slice

        v = at.vector("v")
        i = at.iscalar("i")
        f = function([v, i], v[make_slice(i)], mode="PY")
        np.testing.assert_allclose(
            f(np.arange(5, dtype=config.floatX), 2), [2.0, 3.0, 4.0])

    def test_two_arg_is_start_stop(self):
        from aesara_tpu.tensor.type_other import make_slice

        v = at.vector("v")
        i = at.iscalar("i")
        j = at.iscalar("j")
        f = function([v, i, j], v[make_slice(i, j)], mode="PY")
        np.testing.assert_allclose(f(np.arange(5, dtype=config.floatX), 1, 4), [1.0, 2.0, 3.0])

    def test_explicit_none_stop(self):
        from aesara_tpu.tensor.type_other import make_slice

        v = at.vector("v")
        i = at.iscalar("i")
        f = function([v, i], v[make_slice(None, i)], mode="PY")
        np.testing.assert_allclose(f(np.arange(5, dtype=config.floatX), 2), [0.0, 1.0])

    def test_matches_perform_semantics(self):
        # the indexing unwrap and the op's own perform must agree
        from aesara_tpu.tensor.type_other import make_slice

        i = at.iscalar("i")
        slc = make_slice(i)
        f = function([i], slc, mode="PY")
        assert f(2) == slice(2, None, None)


class TestSparseDiagRectangularGrad:
    """Diag.grad must return a gradient of the INPUT's shape, also for
    rectangular sparse matrices (square_diagonal(gz) was (k,k))."""

    @pytest.mark.parametrize("shape", [(2, 3), (3, 2), (3, 3)])
    def test_grad_shape_and_values(self, shape):
        from aesara_tpu.sparse import basic as sb

        x = sb.SparseTensorType("csr", "float64")()
        c = at.sum(sb.diag(x) ** 2)
        (g,) = atp.grad(c, [x])
        f = function([x], g, mode="PY")
        m, n = shape
        xv = sp.random(m, n, density=0.9, format="csr", dtype=np.float64,
                       random_state=np.random.default_rng(0))
        gv = f(xv)
        assert gv.shape == shape
        dense = np.zeros(shape)
        k = min(m, n)
        d = xv.toarray().diagonal()
        dense[np.arange(k), np.arange(k)] = 2.0 * d
        np.testing.assert_allclose(gv.toarray(), dense)


class TestScanMitSotTestValueSeeding:
    """mit-sot inner placeholders seed from buffer row depth+tap (the
    runtime convention), not the tap's list position."""

    def test_noncontiguous_taps(self):
        from aesara_tpu.scan.basic import scan

        old = config.compute_test_value
        config.compute_test_value = "raise"
        try:
            h0 = at.vector("h0")
            h0.tag.test_value = np.array([10.0, 20.0, 30.0],
                                         dtype=config.floatX)
            seen = {}

            def body(hm3, hm1):
                seen["hm3"] = float(hm3.tag.test_value)
                seen["hm1"] = float(hm1.tag.test_value)
                return hm3 + hm1

            ys, _ = scan(body, outputs_info=[{"initial": h0,
                                              "taps": [-3, -1]}],
                         n_steps=4)
        finally:
            config.compute_test_value = old
        # at step 0: h[t-3] reads row 0 (10.0), h[t-1] reads row 2 (30.0)
        assert seen == {"hm3": 10.0, "hm1": 30.0}


class TestCumOpZeroDim:
    """0-d input admits no explicit axis (reference raises for
    axis >= ndim); axis=None flatten still yields shape (1,)."""

    def test_axis_on_scalar_raises(self):
        x = at.scalar("x")
        with pytest.raises(ValueError, match="out of range"):
            at.cumsum(x, axis=0)
        with pytest.raises(ValueError, match="out of range"):
            at.cumprod(x, axis=0)

    def test_flatten_scalar_ok(self):
        x = at.scalar("x")
        y = at.cumsum(x)
        assert y.type.ndim == 1
        f = function([x], y, mode="PY")
        np.testing.assert_allclose(f(3.0), [3.0])


class TestRopPolicyPaths:
    """Both Rop paths share one disconnected-outputs policy
    implementation; behavior must be identical."""

    @pytest.mark.parametrize("use_op_rop", [False, True])
    def test_raise_and_zeros(self, use_op_rop):
        x = at.vector("x")
        v = at.vector("v")
        const_out = at.alloc(np.float64(7.0), 3)
        with pytest.raises(Exception):
            atp.gradient.Rop([const_out], [x], [v],
                             disconnected_outputs="raise",
                             use_op_rop=use_op_rop)
        r = atp.gradient.Rop([const_out], [x], [v],
                             disconnected_outputs="ignore",
                             use_op_rop=use_op_rop)
        f = function([], r, mode="PY", on_unused_input="ignore")
        np.testing.assert_allclose(np.asarray(f()[0]), np.zeros(3))


class TestDuplicateUpdatesBothPaths:
    """The duplicate-update-target guard covers the steps_per_call
    early-return path too."""

    def test_ksteps_path_raises(self):
        s = atp.shared(np.float64(0.0))
        with pytest.raises(ValueError, match="duplicate update targets"):
            function([], [], updates=[(s, s + 1), (s, s + 2)],
                     steps_per_call=4)


class TestCSMPropertiesUnsortedIndices:
    """Session-3 review: the XLA CSMProperties lowering lexsorted by
    (major, minor), silently canonicalizing inputs whose within-row
    indices are unsorted — py-oracle passes them through verbatim
    (reference CSMProperties.perform returns csm.data/indices as-is)."""

    def _unsorted_csr(self):
        # legal scipy state with has_sorted_indices=False
        m = sp.csr_matrix(
            (np.array([1.0, 2.0, 3.0]),
             np.array([3, 0, 2]),
             np.array([0, 2, 3])),
            shape=(2, 4))
        assert not m.has_sorted_indices
        return m

    def test_fast_run_matches_py(self):
        from aesara_tpu.sparse.basic import SparseTensorType, csm_properties

        m = self._unsorted_csr()
        s = SparseTensorType("csr", "float64")("s")
        outs = list(csm_properties(s))
        f_py = function([s], outs, mode="PY")
        f_x = function([s], outs, mode="FAST_RUN")
        got_py, got_x = f_py(m), f_x(m)
        for a, b in zip(got_py, got_x):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(got_x[0]), m.data)
        np.testing.assert_array_equal(np.asarray(got_x[1]), m.indices)

    def test_unsorted_csc_matches_py(self):
        from aesara_tpu.sparse.basic import SparseTensorType, csm_properties

        m = sp.csc_matrix(
            (np.array([5.0, 4.0, 6.0]),
             np.array([2, 0, 1]),
             np.array([0, 2, 2, 3])),
            shape=(3, 3))
        assert not m.has_sorted_indices
        s = SparseTensorType("csc", "float64")("s")
        outs = list(csm_properties(s))
        f_py = function([s], outs, mode="PY")
        f_x = function([s], outs, mode="FAST_RUN")
        for a, b in zip(f_py(m), f_x(m)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestExpandDimsRepeatedAxis:
    """Session-3 review: duplicate axes crashed with a bare
    StopIteration; numpy raises ValueError('repeated axis ...')."""

    def test_plain_duplicate(self):
        x = at.matrix("x")
        with pytest.raises(ValueError, match="repeated axis"):
            at.expand_dims(x, (0, 0))

    def test_pos_neg_alias(self):
        v = at.vector("v")
        # out_ndim=3: axis -3 aliases axis 0
        with pytest.raises(ValueError, match="repeated axis"):
            at.expand_dims(v, (0, -3))

    def test_distinct_axes_still_work(self):
        v = at.vector("v")
        y = at.expand_dims(v, (0, 2))
        assert y.type.ndim == 3


class TestEagerLinkerDynamicNSteps:
    """Session-3 review: the funcify-time data-dependent-n_steps check
    fired even for use_jit=False, demoting the WHOLE graph to the py
    path in a configuration where n_steps is concrete at call time."""

    def test_eager_jax_runs_without_py_fallback(self):
        import warnings

        from aesara_tpu.compile.mode import OPT_FAST_RUN, Mode
        from aesara_tpu.link.jax.linker import JAXNoJitLinker
        from aesara_tpu.scan.basic import scan

        n = at.iscalar("n")
        ys, _ = scan(lambda h: h * 2.0,
                     outputs_info=[at.constant(np.float64(1.0))],
                     n_steps=n)
        mode = Mode(JAXNoJitLinker(), OPT_FAST_RUN)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            f = function([n], ys[-1], mode=mode)
            assert float(np.asarray(f(5))) == 32.0
            assert float(np.asarray(f(3))) == 8.0
        assert not [w for w in rec if "py path" in str(w.message)]

    def test_jit_path_still_falls_back(self):
        import warnings

        from aesara_tpu.scan.basic import scan

        n = at.iscalar("n")
        ys, _ = scan(lambda h: h * 2.0,
                     outputs_info=[at.constant(np.float64(1.0))],
                     n_steps=n)
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            f = function([n], ys[-1], mode="FAST_RUN")
            assert float(np.asarray(f(4))) == 16.0
        assert [w for w in rec if "py path" in str(w.message)]
