"""Test machinery mirroring the reference's ``tests/unittest_tools.py``
and ``tests/tensor/utils.py``: the makeTester golden-vs-NumPy factory
(:329), InferShapeTester (:178), OpContractTestMixin (:133), fetch_seed.
"""

from __future__ import annotations

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import Mode, OPT_NONE
from aesara_tpu.gradient import verify_grad as _verify_grad
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker
from aesara_tpu.tensor.type import TensorType


def fetch_seed(default=42):
    """(reference ``unittest_tools.py:21``)"""
    import os

    seed = os.environ.get("AESARA_TPU_UNITTEST_SEED", default)
    return int(seed)


def verify_grad(op_or_fn, pt, *args, **kwargs):
    """(reference ``unittest_tools.py:56``): seeded verify_grad wrapper."""
    rng = np.random.default_rng(fetch_seed())
    kwargs.setdefault("rng", rng)
    return _verify_grad(op_or_fn, pt, *args, **kwargs)


def _var_for(value):
    arr = np.asarray(value)
    # size-1 dims must be declared static 1: this framework enforces
    # static-only broadcasting (a runtime-1 dim with static None may
    # not broadcast, by design — see tests/test_fuzz.py)
    shape = tuple(1 if s == 1 else None for s in arr.shape)
    return TensorType(str(arr.dtype), shape)()


def makeTester(
    name: str,
    op,
    expected,
    good: dict,
    bad_build: dict = None,
    bad_runtime: dict = None,
    grad: dict = None,
    mode=None,
    eps: float = 1e-10,
):
    """Generate a test class per op from dicts of cases
    (reference ``tests/tensor/utils.py:329``).

    good: {case_name: (input arrays...)} — op(*inputs) must match
          expected(*inputs) under BOTH backends.
    bad_build: cases where graph construction must raise.
    bad_runtime: cases where execution must raise.
    grad: cases to pass through verify_grad.
    """
    good = good or {}
    bad_build = bad_build or {}
    bad_runtime = bad_runtime or {}
    grad_cases = grad or {}

    # methods are only generated for NON-EMPTY case dicts so empty
    # parameter sets never render as skipped tests
    class Tester:
        pass

    if good:
        @pytest.mark.parametrize("case", sorted(good), ids=sorted(good))
        def test_good(self, case):
            inputs = [np.asarray(v) for v in good[case]]
            in_vars = [_var_for(v) for v in inputs]
            out = op(*in_vars)
            outs = out if isinstance(out, (list, tuple)) else [out]
            want = expected(*inputs)
            wants = want if isinstance(want, (list, tuple)) else [want]
            for m, lname in ((Mode(PerformLinker(), OPT_NONE), "py"),
                             (Mode(JAXLinker(), OPT_NONE), "jax")):
                f = function(in_vars, list(outs), mode=m, on_unused_input="ignore")
                res = f(*inputs)
                if not isinstance(res, (list, tuple)):
                    res = [res]
                for r, w in zip(res, wants):
                    np.testing.assert_allclose(
                        np.asarray(r, dtype=np.float64),
                        np.asarray(w, dtype=np.float64),
                        rtol=1e-4, atol=1e-6,
                        err_msg=f"{name}[{case}] backend={lname}",
                    )

        Tester.test_good = test_good

    if bad_build:
        @pytest.mark.parametrize("case", sorted(bad_build), ids=sorted(bad_build))
        def test_bad_build(self, case):
            inputs = [np.asarray(v) for v in bad_build[case]]
            in_vars = [_var_for(v) for v in inputs]
            with pytest.raises(Exception):
                op(*in_vars)

        Tester.test_bad_build = test_bad_build

    if bad_runtime:
        @pytest.mark.parametrize("case", sorted(bad_runtime), ids=sorted(bad_runtime))
        def test_bad_runtime(self, case):
            inputs = [np.asarray(v) for v in bad_runtime[case]]
            in_vars = [_var_for(v) for v in inputs]
            out = op(*in_vars)
            outs = out if isinstance(out, (list, tuple)) else [out]
            f = function(in_vars, list(outs),
                         mode=Mode(PerformLinker(), OPT_NONE))
            with pytest.raises(Exception):
                f(*inputs)

        Tester.test_bad_runtime = test_bad_runtime

    if grad_cases:
        @pytest.mark.parametrize("case", sorted(grad_cases), ids=sorted(grad_cases))
        def test_grad(self, case):
            inputs = [np.asarray(v, dtype="float64") for v in grad_cases[case]]

            def fn(*vs):
                res = op(*vs)
                if isinstance(res, (list, tuple)):
                    res = res[0]
                return res.sum() if res.type.ndim else res

            verify_grad(fn, inputs)

        Tester.test_grad = test_grad

    Tester.__name__ = name
    Tester.__qualname__ = name
    return Tester


class InferShapeTester:
    """Assert ``op.infer_shape`` matches actual output shapes
    (reference ``unittest_tools.py:178``)."""

    def _compile_and_check(self, inputs, outputs, input_values, op_cls,
                           mode="PY"):
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.tensor.shape import shape as tshape

        # run the actual graph
        f = function(inputs, list(outputs), mode=mode,
                     on_unused_input="ignore")
        actual = f(*input_values)
        if not isinstance(actual, list):
            actual = [actual]

        # evaluate the op's infer_shape symbolically
        for out, act in zip(outputs, actual):
            node = out.owner
            if node is None or not isinstance(node.op, op_cls):
                continue
            fg = FunctionGraph(outputs=list(node.outputs), clone=False)
            try:
                inferred = node.op.infer_shape(
                    fg, node,
                    [tuple(tshape(i)[d] for d in range(i.type.ndim))
                     for i in node.inputs],
                )
            except NotImplementedError:
                pytest.skip(f"{node.op} has no infer_shape")
            shp = inferred[out.index if len(node.outputs) > 1 else 0]
            shp_f = function(
                inputs, [at.cast(at.as_tensor_variable(s), "int64") for s in shp],
                mode=mode, on_unused_input="ignore",
            )
            inferred_shape = tuple(int(np.asarray(s)) for s in shp_f(*input_values))
            assert inferred_shape == np.asarray(act).shape, (
                f"{node.op}: infer_shape {inferred_shape} != actual "
                f"{np.asarray(act).shape}"
            )


class OpContractTestMixin:
    """Op equality/hash/str contract (reference ``unittest_tools.py:133``)."""

    def check_contract(self, op_factory):
        a, b = op_factory(), op_factory()
        assert a == b
        assert hash(a) == hash(b)
        assert str(a) == str(b)
