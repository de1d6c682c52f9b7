"""Bucketing v2 (VERDICT r3 item 3): (a) the batch-axis safety analysis
turning the silent-wrongness edge into an error, (b) the second bucketed
dim — sequence length, zero-padded per In(seq_bucketed=axis).

The reference needs neither: its C thunks run ANY concrete shape exactly
(``/root/reference/aesara/tensor/type.py:57``); under XLA's static-shape
model bucketing bounds recompiles, and this analysis bounds its blast
radius.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.bucketing import BucketingError, batch_axis_safety
from aesara_tpu.compile.function import function
from aesara_tpu.compile.io import In
from aesara_tpu.config import config

rng = np.random.default_rng(7)


def _fg(f):
    return f.fgraph


class TestSafetyAnalysis:
    """Direct verdicts of batch_axis_safety on compiled graphs."""

    def _verdict(self, build, n_in=1):
        ins = [at.matrix(f"x{i}") for i in range(n_in)]
        f = function(ins, build(*ins), mode="FAST_RUN")
        return batch_axis_safety(f.fgraph, f.fgraph.inputs[:n_in])

    def test_rowwise_elemwise_safe(self):
        assert self._verdict(lambda x: at.tanh(x) * 2.0 + 1.0) is None

    def test_rowwise_reduce_safe(self):
        # reduction over the FEATURE axis keeps rows independent
        assert self._verdict(lambda x: x.sum(axis=1)) is None

    def test_batch_mean_unsafe(self):
        r = self._verdict(lambda x: x.mean(axis=0))
        assert r is not None and "batch" in r

    def test_batch_sum_all_axes_unsafe(self):
        r = self._verdict(lambda x: x.sum())
        assert r is not None

    def test_rowwise_dot_safe(self):
        # x @ W: batch rides axis 0 of x, contraction over features
        w = atp.shared(rng.normal(size=(4, 3)), name="w")
        x = at.matrix("x", dtype="float64")
        f = function([x], at.dot(x, w), mode="FAST_RUN")
        assert batch_axis_safety(f.fgraph, f.fgraph.inputs[:1]) is None

    def test_gram_matrix_unsafe(self):
        # x.T @ x contracts over the batch
        x = at.matrix("x", dtype="float64")
        f = function([x], at.dot(x.T, x), mode="FAST_RUN")
        r = batch_axis_safety(f.fgraph, f.fgraph.inputs[:1])
        assert r is not None and "contracts" in r

    def test_softmax_feature_axis_safe(self):
        from aesara_tpu.tensor.special import softmax

        assert self._verdict(lambda x: softmax(x, axis=-1)) is None

    def test_softmax_batch_axis_unsafe(self):
        from aesara_tpu.tensor.special import softmax

        r = self._verdict(lambda x: softmax(x, axis=0))
        assert r is not None

    def test_batch_shape_read_unsafe(self):
        # mean via sum/shape: reading the padded length poisons the math
        r = self._verdict(lambda x: x.sum(axis=1) / x.shape[0])
        assert r is not None

    def test_scalar_index_safe(self):
        # x[0] / x[-1] read true rows under replicate padding
        assert self._verdict(lambda x: x[0] + x[-1]) is None

    def test_batch_slice_unsafe(self):
        r = self._verdict(lambda x: x[1:3].sum(axis=1))
        assert r is not None

    def test_scan_consumer_unsafe(self):
        from aesara_tpu.scan import scan

        x = at.matrix("x", dtype="float64")
        outs, _ = scan(fn=lambda row: row * 2.0, sequences=[x],
                       outputs_info=[None], n_steps=4)
        f = function([x], outs, mode="FAST_RUN")
        r = batch_axis_safety(f.fgraph, f.fgraph.inputs[:1])
        assert r is not None

    def test_embedding_gather_safe(self):
        table = atp.shared(rng.normal(size=(16, 4)), name="tab")
        idx = at.lvector("idx")
        f = function([idx], at.tanh(table[idx]), mode="FAST_RUN")
        assert batch_axis_safety(f.fgraph, f.fgraph.inputs[:1]) is None


class TestSafetyEnforcement:
    def test_unsafe_graph_raises_when_padding(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], x.mean(axis=0), mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            with pytest.raises(BucketingError, match="batch"):
                f(rng.normal(size=(3, 4)))

    def test_unsafe_graph_fine_when_no_padding_needed(self):
        # exact bucket size: no padding, no error — numbers are exact
        x = at.matrix("x", dtype="float64")
        f = function([x], x.mean(axis=0), mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            xv = rng.normal(size=(4, 4))
            np.testing.assert_allclose(
                np.asarray(f(xv)), xv.mean(axis=0), rtol=1e-6)

    def test_warn_mode_runs_unbucketed_and_exact(self):
        x = at.matrix("x", dtype="float64")
        f = function([x], x.mean(axis=0), mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2",
                                 shape_buckets_check="warn"):
            xv = rng.normal(size=(3, 4))
            with pytest.warns(UserWarning, match="unbucketed"):
                res = np.asarray(f(xv))
        # f32 jit vs f64 numpy: 1e-5 is the right tolerance
        np.testing.assert_allclose(res, xv.mean(axis=0), rtol=1e-5)

    def test_off_mode_trusts_user(self):
        # the documented-footgun behavior survives behind an explicit flag
        x = at.matrix("x", dtype="float64")
        f = function([x], x.sum(axis=0), mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2",
                                 shape_buckets_check="off"):
            xv = np.ones((3, 2))
            res = np.asarray(f(xv))
        # padded to 4 rows by replication: sum sees 4 rows
        np.testing.assert_allclose(res, np.full(2, 4.0))

    def test_safe_graph_buckets_and_is_exact(self):
        w = atp.shared(rng.normal(size=(5, 3)).astype("float64"), name="w")
        x = at.matrix("x", dtype="float64")
        f = function([x], at.tanh(at.dot(x, w)), mode="FAST_RUN")
        f_py = function([x], at.tanh(at.dot(x, w)), mode="PY")
        with config.change_flags(shape_buckets="pow2"):
            for n in (1, 3, 5, 6, 9):
                xv = rng.normal(size=(n, 5))
                np.testing.assert_allclose(
                    np.asarray(f(xv)), np.asarray(f_py(xv)), rtol=1e-6)
        assert f.xla_compile_count <= 4  # buckets 1,4,8,16 at most

    def test_batch_reducing_update_raises(self):
        # accumulating batch statistics into a shared is the documented
        # footgun: it must now raise, not silently grow the state
        s = atp.shared(np.zeros(4), name="s")
        x = at.matrix("x", dtype="float64")
        f = function([x], [], updates=[(s, s + x.sum(axis=0))],
                     mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            with pytest.raises(BucketingError):
                f(rng.normal(size=(3, 4)))


class TestSeqBucketing:
    def test_seq_axis_pads_and_slices_back(self):
        # axis-1 sequence dim, rowwise op: exact after slice-back
        x = at.matrix("x", dtype="float64")  # (B fixed 2 at runtime, T dynamic)
        f = function([In(x, seq_bucketed=1)], at.tanh(x) * 2.0,
                     mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            for t in (3, 5, 9):
                xv = rng.normal(size=(2, t))
                res = np.asarray(f(xv))
                assert res.shape == (2, t)
                np.testing.assert_allclose(res, np.tanh(xv) * 2.0,
                                           rtol=1e-6)
        assert f.xla_compile_count <= 3  # buckets 4, 8, 16

    def test_seq_bucket_bounds_compiles_olog(self):
        # a varying-length loop compiles O(log T) programs, not O(T)
        prompt = at.lvector("prompt")
        table = atp.shared(rng.normal(size=(32, 4)), name="tab")
        f = function([In(prompt, seq_bucketed=0)], table[prompt].sum(axis=0),
                     mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            for t in range(1, 33):
                pv = rng.integers(1, 32, size=t).astype("int64")
                f(pv)
        # lengths 1..32 → buckets {1,2,4,8,16,32} = 6 programs
        assert f.xla_compile_count <= 6

    def test_seq_zero_pad_with_length_mask_exact(self):
        # the masked-semantics contract: the graph consumes an explicit
        # length and masks pad positions, so zero-padding is exact
        x = at.matrix("x", dtype="float64")      # (B, T) scores
        tlen = at.lscalar("tlen")
        ar = at.arange(x.shape[1])
        mask = at.lt(ar, tlen).astype("float64")
        out = (x * mask[None, :]).sum(axis=1)
        f = function([In(x, seq_bucketed=1), tlen], out, mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            for t in (3, 6, 11):
                xv = rng.normal(size=(4, t))
                res = np.asarray(f(xv, t))
                np.testing.assert_allclose(res, xv.sum(axis=1), rtol=1e-6)

    def test_seq_inputs_disagreeing_lengths_fall_back(self):
        a = at.matrix("a", dtype="float64")
        b = at.matrix("b", dtype="float64")
        f = function([In(a, seq_bucketed=1), In(b, seq_bucketed=1)],
                     a.sum(axis=1) + b.sum(axis=1), mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            av = rng.normal(size=(2, 3))
            bv = rng.normal(size=(2, 5))
            res = np.asarray(f(av, bv))
        np.testing.assert_allclose(res, av.sum(1) + bv.sum(1), rtol=1e-6)

    def test_seq_declared_input_excluded_from_batch_heuristic(self):
        # a seq-declared input must not ALSO be replicate-padded on axis 0
        x = at.matrix("x", dtype="float64")
        f = function([In(x, seq_bucketed=1)], at.exp(x), mode="FAST_RUN")
        assert f._bucket_positions == []
        assert f._bucket_seq_positions == [(0, 1)]
