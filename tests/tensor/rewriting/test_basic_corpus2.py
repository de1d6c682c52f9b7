"""Basic rewrite corpus, part 2: operand-pattern breadth for the
construction/structural rule pack (alloc, fill, join/split, slices,
scalar<->tensor roundtrips, cast grids) — extending
``test_basic_corpus.py`` toward the reference's
``tests/tensor/rewriting/test_basic.py`` (1,892 LoC) breadth.
Rules: ``aesara_tpu/tensor/rewriting/basic.py``.
"""

import numpy as np
import pytest

import aesara_tpu.tensor as at
from aesara_tpu.graph.ir import Constant
from tests.rewrite_corpus import count_label, op_labels, rewrite_and_check, rewrite_only

rng = np.random.default_rng(20260822)

CANON = ("canonicalize",)
SPEC = ("canonicalize", "stabilize", "specialize")
USELESS = ("useless",)


def mat(shape=(3, 4), dtype="float32"):
    return rng.normal(size=shape).astype(dtype)


class TestUselessSlice:
    @pytest.mark.parametrize("ndim,build", [
        (1, lambda x: x[:]),
        (2, lambda x: x[:, :]),
        (2, lambda x: x[:]),
        (3, lambda x: x[:, :, :]),
        (3, lambda x: x[:]),
    ])
    def test_full_slices_removed(self, ndim, build):
        x = at.tensor(dtype="float32", shape=(None,) * ndim, name="x")
        out = build(x)
        shape = (3, 4, 5)[:ndim]
        res = rewrite_and_check([x], out, [mat(shape)], include=CANON)
        assert "Subtensor" not in op_labels(res)

    @pytest.mark.parametrize("build", [
        lambda x: x[::1],          # explicit unit step — still full
        lambda x: x[0:, :],        # start 0 — still full
    ])
    def test_equivalent_full_slices(self, build):
        x = at.matrix("x", dtype="float32")
        out = build(x)
        res = rewrite_and_check([x], out, [mat()], include=SPEC)
        assert "Subtensor" not in op_labels(res)

    @pytest.mark.parametrize("build", [
        lambda x: x[::2],
        lambda x: x[1:],
        lambda x: x[:, ::-1],
        lambda x: x[:-1],
    ])
    def test_real_slices_stay(self, build):
        x = at.matrix("x", dtype="float32")
        out = build(x)
        res = rewrite_and_check([x], out, [mat()], include=SPEC)
        assert "Subtensor" in op_labels(res) or "DynamicSlice" in op_labels(res)


class TestScalarTensorRoundtrips:
    def test_tensor_scalar_tensor(self):
        from aesara_tpu.tensor.basic import ScalarFromTensor, TensorFromScalar

        x = at.scalar("x", dtype="float64")
        out = TensorFromScalar()(ScalarFromTensor()(x))
        res = rewrite_only(out, include=CANON)
        assert res is x

    def test_scalar_tensor_scalar(self):
        from aesara_tpu.tensor.basic import ScalarFromTensor, TensorFromScalar

        x = at.scalar("x", dtype="float64")
        s = ScalarFromTensor()(x)
        out = ScalarFromTensor()(TensorFromScalar()(s))
        res = rewrite_only(out, include=CANON)
        assert res is s

    def test_shape_element_roundtrip_in_arithmetic(self):
        # the pattern arises from shape graphs: shape[i] used in algebra
        x = at.matrix("x", dtype="float32")
        out = (x.shape[0] * 2 + 1).astype("int64")
        rewrite_and_check([x], out, [mat()], include=SPEC)


class TestJoinSplitBreadth:
    @pytest.mark.parametrize("axis", [0, 1])
    def test_join_single_operand(self, axis):
        x = at.matrix("x", dtype="float32")
        out = at.concatenate([x], axis=axis)
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Join" not in op_labels(res)

    @pytest.mark.parametrize("axis,shapes", [
        (0, [(2, 4), (0, 4), (3, 4)]),
        (1, [(3, 2), (3, 0), (3, 1)]),
        (0, [(0, 4), (0, 4), (2, 4)]),
    ])
    def test_join_statically_empty_operands_dropped(self, axis, shapes):
        xs = [
            at.tensor(dtype="float32", shape=s, name=f"x{i}")
            for i, s in enumerate(shapes)
        ]
        out = at.concatenate(xs, axis=axis)
        vals = [mat(s) for s in shapes]
        res = rewrite_and_check(xs, out, vals, include=CANON)
        live = sum(1 for s in shapes if s[axis] != 0)
        join_ops = count_label(res, "Join")
        assert join_ops == (1 if live > 1 else 0)

    def test_join_all_empty(self):
        xs = [at.tensor(dtype="float32", shape=(0, 4), name=f"x{i}")
              for i in range(2)]
        out = at.concatenate(xs, axis=0)
        rewrite_and_check(xs, out, [mat((0, 4)), mat((0, 4))], include=CANON)

    @pytest.mark.parametrize("nsplit", [1, 2, 3])
    def test_split_pieces(self, nsplit):
        from aesara_tpu.tensor.basic import Split

        x = at.vector("x", dtype="float32")
        sizes = at.constant(np.asarray([2] * nsplit, dtype="int64"))
        outs = Split(nsplit)(x, at.constant(np.int64(0)), sizes)
        outs = [outs] if nsplit == 1 else list(outs)
        res = rewrite_and_check(
            [x], outs, [mat((2 * nsplit,))], include=CANON,
        )
        if nsplit == 1:
            assert "Split" not in op_labels(res)

    def test_join_of_makevectors_flattens(self):
        a, b, c = (at.scalar(n, dtype="int64") for n in "abc")
        from aesara_tpu.tensor.basic import MakeVector

        mv = MakeVector("int64")
        out = at.concatenate([mv(a, b), mv(c)], axis=0)
        res = rewrite_only(out, include=CANON)
        assert count_label(res, "Join") == 0
        assert count_label(res, "MakeVector") == 1


class TestCastGrid:
    LOSSLESS = [
        ("int8", "int32", "int64"),
        ("int16", "int64", "int64"),
        ("uint8", "int32", "float64"),
        ("float32", "float64", "float64"),
        ("int32", "float64", "float64"),
    ]
    LOSSY = [
        ("float64", "int32", "float64"),   # trunc then back: info lost
        ("float64", "float32", "float64"),
        ("int64", "int8", "int64"),
    ]

    @pytest.mark.parametrize("src,mid,dst", LOSSLESS)
    def test_lossless_cast_chain_merges(self, src, mid, dst):
        x = at.vector("x", dtype=src)
        out = at.cast(at.cast(x, mid), dst)
        res = rewrite_only(out, include=CANON)
        assert count_label(res, "Cast") <= 1

    @pytest.mark.parametrize("src,mid,dst", LOSSY)
    def test_lossy_cast_chain_kept(self, src, mid, dst):
        x = at.vector("x", dtype=src)
        out = at.cast(at.cast(x, mid), dst)
        v = (rng.normal(size=5) * 3).astype(src)
        rewrite_and_check([x], out, [v], include=CANON)
        res = rewrite_only(at.cast(at.cast(x, mid), dst), include=CANON)
        assert count_label(res, "Cast") == 2

    @pytest.mark.parametrize("dt", ["int32", "float32", "float64", "uint8"])
    def test_cast_to_same_dtype_removed(self, dt):
        x = at.vector("x", dtype=dt)
        out = at.cast(x, dt)
        res = rewrite_only(out, include=CANON)
        assert res is x


class TestAllocBreadth:
    def test_alloc_of_alloc_merges(self):
        s = at.scalar("s", dtype="float32")
        inner = at.alloc(s, 1, 4)
        out = at.alloc(inner, 3, 4)
        res = rewrite_and_check([s], out, [np.float32(2.0)], include=CANON)
        assert count_label(res, "Alloc") == 1

    def test_alloc_same_static_shape_removed(self):
        x = at.tensor(dtype="float32", shape=(3, 4), name="x")
        out = at.alloc(x, 3, 4)
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Alloc" not in op_labels(res)

    def test_alloc_broadcasting_kept(self):
        x = at.tensor(dtype="float32", shape=(1, 4), name="x")
        out = at.alloc(x, 3, 4)
        res = rewrite_and_check([x], out, [mat((1, 4))], include=CANON)
        # the value genuinely broadcasts: some materializer must remain
        assert ("Alloc" in op_labels(res)) or ("Second" in op_labels(res))

    @pytest.mark.parametrize("f", [at.exp, at.tanh, at.math.neg])
    def test_unary_elemwise_of_scalar_alloc_lifts(self, f):
        s = at.scalar("s", dtype="float32")
        out = f(at.alloc(s, 5, 6))
        res = rewrite_only(out, include=SPEC)
        # compute on the scalar, broadcast after — count the elemwise
        # op's operand rank via the surviving Alloc
        assert "Alloc" in op_labels(res)

    def test_sum_of_scalar_alloc_folds_to_mul(self):
        s = at.scalar("s", dtype="float32")
        out = at.sum(at.alloc(s, 4, 6))
        res = rewrite_and_check([s], out, [np.float32(1.5)], include=SPEC)
        assert "Alloc" not in op_labels(res)


class TestElemwiseIdentity:
    @pytest.mark.parametrize("build,label", [
        (lambda x: x + at.zeros_like(x), "Add"),
        (lambda x: x * at.ones_like(x), "Mul"),
        (lambda x: at.maximum(x, x), "Maximum"),
        (lambda x: at.minimum(x, x), "Minimum"),
    ])
    def test_identity_with_like_operands(self, build, label):
        x = at.matrix("x", dtype="float32")
        out = build(x)
        res = rewrite_and_check([x], out, [mat()], include=SPEC)
        assert label not in op_labels(res)

    def test_comparison_same_arg(self):
        x = at.matrix("x", dtype="float32")
        for build, expect in [
            (lambda v: at.math.eq(v, v), 1),
            (lambda v: at.math.neq(v, v), 0),
            (lambda v: at.math.le(v, v), 1),
            (lambda v: at.math.lt(v, v), 0),
            (lambda v: at.math.ge(v, v), 1),
            (lambda v: at.math.gt(v, v), 0),
        ]:
            out = build(x)
            res = rewrite_only(out, include=CANON)
            # folds to a constant fill of 0/1
            labels = op_labels(res)
            assert all(
                lbl not in labels
                for lbl in ("EQ", "NEQ", "LE", "LT", "GE", "GT")
            ), (labels, expect)


class TestViewOpAndAssert:
    def test_view_op_removed(self):
        from aesara_tpu.compile.ops import ViewOp

        x = at.matrix("x", dtype="float32")
        out = ViewOp()(x) * 2.0
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "ViewOp" not in op_labels(res)

    def test_assert_true_condition_removed(self):
        from aesara_tpu.raise_op import Assert

        x = at.matrix("x", dtype="float32")
        out = Assert("never fires")(x, at.constant(np.int8(1))) + 1.0
        res = rewrite_and_check([x], out, [mat()], include=CANON)
        assert "Assert" not in op_labels(res) and "CheckAndRaise" not in op_labels(res)

    def test_assert_symbolic_condition_kept(self):
        from aesara_tpu.raise_op import Assert

        x = at.matrix("x", dtype="float32")
        c = at.scalar("c", dtype="int8")
        out = Assert("may fire")(x, c) + 1.0
        res = rewrite_only(out, include=CANON)
        labels = op_labels(res)
        assert "Assert" in labels or "CheckAndRaise" in labels


class TestSplitSizeAssert:
    def test_split1_wrong_symbolic_size_still_raises(self):
        # review finding: eliding Split{1} must keep the runtime check
        # (the check survives in the graph; the py oracle raises — the
        # jitted XLA path cannot raise host exceptions on traced
        # conditions, the documented CheckAndRaise boundary)
        from aesara_tpu.compile.function import function
        from aesara_tpu.tensor.basic import Split
        from tests.rewrite_corpus import py_mode

        x = at.vector("x", dtype="float32")
        s = at.vector("s", dtype="int64")
        out = Split(1)(x, at.constant(np.int64(0)), s)
        res = rewrite_only(out, include=SPEC)
        assert "CheckAndRaise" in op_labels(res) or "Assert" in op_labels(res)
        f = function([x, s], out, mode=py_mode)
        v = mat((5,), "float32")
        np.testing.assert_allclose(
            np.asarray(f(v, np.asarray([5], "int64"))), v
        )
        with pytest.raises(Exception):
            f(v, np.asarray([2], "int64"))

    def test_split1_static_consistent_no_assert(self):
        from aesara_tpu.tensor.basic import Split

        x = at.tensor(dtype="float32", shape=(4,), name="x")
        out = Split(1)(x, at.constant(np.int64(0)),
                       at.constant(np.asarray([4], "int64")))
        res = rewrite_only(out, include=SPEC)
        labels = op_labels(res)
        assert "Split" not in labels
        assert "Assert" not in labels and "CheckAndRaise" not in labels
