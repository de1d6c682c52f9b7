"""Dynamic-shape bucketing (compile/bucketing.py, VERDICT r2 item 3).

The reference runs any concrete shape for a None dim with zero
recompilation (reference ``tensor/type.py:57``); under XLA the driver
pads None-leading-dim inputs up to a bucket so a varying-batch loop
compiles O(log) programs instead of one per batch size.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.bucketing import bucket_for, pad_leading, parse_buckets
from aesara_tpu.compile.function import function
from aesara_tpu.config import config

rng = np.random.default_rng(7)


class TestPolicyHelpers:
    def test_parse(self):
        assert parse_buckets("off") is None
        assert parse_buckets("") is None
        assert parse_buckets("pow2") == "pow2"
        assert parse_buckets("64,8,256,8") == (8, 64, 256)
        with pytest.raises(ValueError):
            parse_buckets("8,frog")
        with pytest.raises(ValueError):
            parse_buckets("0,8")

    def test_bucket_for(self):
        assert bucket_for(1, "pow2") == 1
        assert bucket_for(3, "pow2") == 4
        assert bucket_for(8, "pow2") == 8
        assert bucket_for(9, "pow2") == 16
        assert bucket_for(0, "pow2") == 0
        assert bucket_for(5, (8, 64)) == 8
        assert bucket_for(8, (8, 64)) == 8
        assert bucket_for(65, (8, 64)) == 65  # above the ladder: own shape

    def test_pad_leading_replicates_last_row(self):
        a = np.arange(6.0).reshape(3, 2)
        p = pad_leading(a, 5)
        assert p.shape == (5, 2)
        np.testing.assert_array_equal(p[:3], a)
        np.testing.assert_array_equal(p[3], a[-1])
        np.testing.assert_array_equal(p[4], a[-1])
        assert pad_leading(a, 3) is a


class TestBucketedExecution:
    def _model(self):
        x = at.matrix("x", dtype="float64")
        w = atp.shared(
            rng.normal(size=(4, 3)).astype("float32"), name="w")
        return x, at.tanh(at.dot(x, w)), w

    def test_compile_count_log_not_linear(self):
        x, out, w = self._model()
        f = function([x], out, mode="FAST_RUN")
        base = f.xla_compile_count or 0
        with config.change_flags(shape_buckets="pow2"):
            for n in [3, 5, 6, 7, 9, 12, 17]:
                res = np.asarray(f(rng.normal(size=(n, 4)).astype("float32")))
                assert res.shape == (n, 3)
        # 7 distinct batch sizes → buckets {4, 8, 16, 32}
        assert (f.xla_compile_count - base) <= 4

    def test_differential_vs_py(self):
        from aesara_tpu.compile.io import In

        x = at.matrix("x", dtype="float64")
        b = at.vector("b", dtype="float64")
        out = at.log1p(at.exp(x)) + b.dimshuffle("x", 0)  # rowwise
        # b's leading dim is None but it is NOT the batch — mark it so
        ins = [In(x, batched=True), In(b, batched=False)]
        fj = function(ins, out, mode="FAST_RUN")
        fp = function([x, b], out, mode="PY")
        bv = rng.normal(size=3)
        with config.change_flags(shape_buckets="pow2"):
            for n in [1, 2, 3, 5, 11]:
                xv = rng.normal(size=(n, 3))
                np.testing.assert_allclose(
                    np.asarray(fj(xv, bv)), np.asarray(fp(xv, bv)),
                    rtol=1e-5, atol=1e-6,
                )

    def test_batched_true_selects_only_marked(self):
        from aesara_tpu.compile.io import In

        x = at.matrix("x", dtype="float64")
        b = at.vector("b", dtype="float64")
        out = at.tanh(x) * b.dimshuffle("x", 0)
        f = function([In(x, batched=True), In(b)], out, mode="FAST_RUN")
        assert f._bucket_positions == [0]
        with config.change_flags(shape_buckets="pow2"):
            xv = rng.normal(size=(3, 4))
            bv = rng.normal(size=4)
            np.testing.assert_allclose(
                np.asarray(f(xv, bv)), np.tanh(xv) * bv, rtol=1e-5, atol=1e-6)

    def test_explicit_ladder(self):
        x, out, w = self._model()
        f = function([x], out, mode="FAST_RUN")
        base = f.xla_compile_count or 0
        with config.change_flags(shape_buckets="8,32"):
            for n in [2, 5, 8, 9, 20, 31]:
                res = np.asarray(f(rng.normal(size=(n, 4)).astype("float32")))
                assert res.shape == (n, 3)
        assert (f.xla_compile_count - base) <= 2

    def test_integer_index_input_stays_in_range(self):
        # edge-replication keeps padded indices valid for gathers
        table = atp.shared(np.arange(20.0).reshape(10, 2), name="table")
        idx = at.lvector("idx")
        f = function([idx], table[idx], mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            iv = np.array([9, 0, 3], dtype="int64")
            res = np.asarray(f(iv))
        np.testing.assert_array_equal(res, np.arange(20.0).reshape(10, 2)[iv])

    def test_mismatched_lengths_fall_back(self):
        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        out = at.dot(x, y)  # x is (n,k), y is (k,m): lengths differ
        f = function([x, y], out, mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            xv = rng.normal(size=(3, 5))
            yv = rng.normal(size=(5, 2))
            res = np.asarray(f(xv, yv))
        assert res.shape == (3, 2)
        np.testing.assert_allclose(res, xv @ yv, rtol=1e-5, atol=1e-6)

    def test_static_shapes_untouched(self):
        x = at.tensor("x", dtype="float64", shape=(3, 2))
        f = function([x], x * 2.0, mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            res = np.asarray(f(np.ones((3, 2))))
        assert res.shape == (3, 2)

    def test_updates_ride_through(self):
        # shared counter update unaffected by batch padding
        x = at.matrix("x", dtype="float64")
        c = atp.shared(np.int64(0), name="c")
        f = function([x], (x * 2.0), updates={c: c + 1}, mode="FAST_RUN")
        with config.change_flags(shape_buckets="pow2"):
            r = np.asarray(f(np.ones((3, 4))))
        assert r.shape == (3, 4)
        assert int(c.get_value()) == 1

    def test_scalar_output_not_sliced(self):
        # outputs without a dynamic leading dim are returned as computed
        x = at.matrix("x", dtype="float64")
        out = at.diag(at.dot(x.T, x)).sum()  # scalar; batch-reduced
        f = function([x], [out, x * 1.0], mode="FAST_RUN")
        with config.change_flags(shape_buckets="off"):
            a0, b0 = f(np.ones((3, 2)))
        assert np.asarray(a0).shape == ()
        assert np.asarray(b0).shape == (3, 2)
