"""Golden-vs-NumPy op tests via the makeTester factory + infer_shape
contract checks (reference tests/tensor/test_basic.py strategy)."""

import numpy as np
import scipy.special as sp

import aesara_tpu.tensor as at
from tests.unittest_tools import InferShapeTester, OpContractTestMixin, makeTester

rng = np.random.default_rng(2024)


def d(*shape):
    return rng.normal(size=shape)


TestAddTester = makeTester(
    "TestAddTester",
    at.add,
    lambda a, b: a + b,
    good={
        "same_shape": (d(3, 4), d(3, 4)),
        "scalar_rhs": (d(3, 4), np.asarray(2.5)),
        "int": (np.arange(6).reshape(2, 3), np.ones((2, 3), dtype="int64")),
    },
    grad={"basic": (d(3, 4), d(3, 4))},
)

TestExpTester = makeTester(
    "TestExpTester",
    at.exp,
    np.exp,
    good={"vec": (d(7),), "mat": (d(3, 4),), "scalar": (np.asarray(0.3),)},
    grad={"mat": (d(3, 3),)},
)

TestSqrtTester = makeTester(
    "TestSqrtTester",
    at.sqrt,
    np.sqrt,
    good={"pos": (np.abs(d(4, 4)) + 0.1,)},
    grad={"pos": (np.abs(d(3, 3)) + 0.1,)},
)

TestErfinvTester = makeTester(
    "TestErfinvTester",
    at.math.erfinv,
    sp.erfinv,
    good={"in_range": (rng.uniform(-0.9, 0.9, (3, 3)),)},
    grad={"in_range": (rng.uniform(-0.8, 0.8, (3, 3)),)},
)

TestGammaincTester = makeTester(
    "TestGammaincTester",
    at.math.gammainc,
    sp.gammainc,
    good={"pos": (np.abs(d(4)) + 0.5, np.abs(d(4)) + 0.5)},
)

TestBetaincTester = makeTester(
    "TestBetaincTester",
    at.math.betainc,
    sp.betainc,
    good={"pos": (np.abs(d(4)) + 0.5, np.abs(d(4)) + 0.5,
                  rng.uniform(0.1, 0.9, 4))},
)

TestDotTester = makeTester(
    "TestDotTester",
    at.dot,
    np.dot,
    good={
        "mat_mat": (d(3, 4), d(4, 5)),
        "mat_vec": (d(3, 4), d(4)),
        "vec_vec": (d(5), d(5)),
    },
    bad_runtime={"inner_mismatch": (d(3, 4), d(5, 2))},
    grad={"mat_mat": (d(3, 4), d(4, 2))},
)

TestConcatTester = makeTester(
    "TestConcatTester",
    lambda a, b: at.concatenate([a, b], axis=0),
    lambda a, b: np.concatenate([a, b], axis=0),
    good={"mats": (d(2, 3), d(4, 3))},
    grad={"mats": (d(2, 3), d(4, 3))},
)

TestSoftmaxTester = makeTester(
    "TestSoftmaxTester",
    lambda x: at.special.softmax(x, axis=-1),
    lambda x: np.exp(x - x.max(-1, keepdims=True))
    / np.exp(x - x.max(-1, keepdims=True)).sum(-1, keepdims=True),
    good={"mat": (d(4, 6),)},
    grad={"mat": (d(3, 4),)},
)

TestCumsumTester = makeTester(
    "TestCumsumTester",
    lambda x: at.extra_ops.cumsum(x, axis=0),
    lambda x: np.cumsum(x, axis=0),
    good={"mat": (d(4, 3),)},
    grad={"mat": (d(4, 3),)},
)


class TestInferShapes(InferShapeTester):
    def test_elemwise(self):
        from aesara_tpu.tensor.elemwise import Elemwise

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        self._compile_and_check([x, y], [x + y], [d(3, 4), d(3, 4)], Elemwise)

    def test_dot(self):
        from aesara_tpu.tensor.math import Dot

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        self._compile_and_check([x, y], [at.dot(x, y)], [d(3, 4), d(4, 5)], Dot)

    def test_subtensor(self):
        from aesara_tpu.tensor.subtensor import Subtensor

        x = at.matrix("x", dtype="float64")
        self._compile_and_check([x], [x[1:, ::2]], [d(5, 7)], Subtensor)
        self._compile_and_check([x], [x[::-1]], [d(5, 7)], Subtensor)
        self._compile_and_check([x], [x[2:-1, 1:5]], [d(8, 9)], Subtensor)

    def test_reductions(self):
        from aesara_tpu.tensor.math import Sum

        x = at.tensor3("x", dtype="float64")
        self._compile_and_check([x], [x.sum(axis=1)], [d(2, 3, 4)], Sum)
        self._compile_and_check([x], [x.sum()], [d(2, 3, 4)], Sum)

    def test_join_split(self):
        from aesara_tpu.tensor.basic import Join

        x = at.matrix("x", dtype="float64")
        y = at.matrix("y", dtype="float64")
        self._compile_and_check(
            [x, y], [at.join(0, x, y)], [d(2, 3), d(4, 3)], Join
        )

    def test_alloc_eye_arange(self):
        from aesara_tpu.tensor.basic import Alloc, ARange, Eye

        v = at.scalar("v", dtype="float64")
        self._compile_and_check(
            [v], [at.alloc(v, 3, 4)], [np.asarray(0.5)], Alloc
        )
        n = at.lscalar("n")
        self._compile_and_check([n], [at.eye(n, n, 0)], [np.int64(4)], Eye)
        self._compile_and_check(
            [n], [at.arange(n)], [np.int64(7)], ARange
        )

    def test_conv_pool(self):
        from aesara_tpu.tensor.nnet.abstract_conv import AbstractConv2d
        from aesara_tpu.tensor.nnet import conv2d, pool_2d
        from aesara_tpu.tensor.nnet.pool import Pool

        x = at.tensor4("x", dtype="float64")
        k = at.tensor4("k", dtype="float64")
        self._compile_and_check(
            [x, k], [conv2d(x, k, border_mode="half", subsample=(2, 2))],
            [d(1, 2, 7, 7), d(3, 2, 3, 3)], AbstractConv2d,
        )
        self._compile_and_check(
            [x], [pool_2d(x, (2, 2))], [d(1, 1, 6, 8)], Pool
        )

    def test_scan(self):
        from aesara_tpu.scan.basic import scan
        from aesara_tpu.scan.op import Scan

        x = at.vector("x", dtype="float64")
        h, _ = scan(lambda xt, acc: acc + xt, sequences=[x],
                    outputs_info=[at.constant(np.float64(0.0))])
        self._compile_and_check([x], [h], [d(6)], Scan)


class TestOpContracts(OpContractTestMixin):
    def test_contracts(self):
        from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
        from aesara_tpu.tensor.math import Sum
        from aesara_tpu.tensor.subtensor import Subtensor
        from aesara_tpu import scalar as aes

        self.check_contract(lambda: Elemwise(aes.ops.add))
        self.check_contract(lambda: DimShuffle(2, (1, 0)))
        self.check_contract(lambda: Sum(axis=(0,)))
        self.check_contract(lambda: Subtensor((slice(1, None, None),)))
