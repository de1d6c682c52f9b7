"""DebugMode view/destroy-map validation + preallocated-output checks
(reference debugmode.py:738,151,233 — the donation-safety net of
SURVEY §7(c)).  Each check is proven by an op that deliberately lies."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.debugmode import (
    BadDestroyMap,
    BadThunkOutput,
    BadViewMap,
    DebugMode,
)
from aesara_tpu.compile.function import function
from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable

rng = np.random.default_rng(5)


class _LyingDestroyer(Op):
    """Writes into its input without declaring destroy_map."""

    def make_node(self, x):
        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        x += 1.0  # undeclared in-place write
        output_storage[0][0] = x.copy()


class _LyingViewer(Op):
    """Returns a view of its input without declaring view_map."""

    def make_node(self, x):
        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0][:]  # undeclared view


class _HonestViewer(Op):
    """Same view, but declared."""

    view_map = {0: [0]}

    def make_node(self, x):
        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0][:]


class _Accumulator(Op):
    """Accumulates into existing output storage instead of overwriting —
    caught by the preallocated-output re-run."""

    def make_node(self, x):
        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        if (
            output_storage[0][0] is not None
            and np.asarray(output_storage[0][0]).shape == inputs[0].shape
        ):
            out = output_storage[0][0]
            np.add(out, inputs[0], out=out, where=~np.isnan(out))
            bad = np.isnan(out) if out.dtype.kind == "f" else (out == 1234567)
            out[bad] = inputs[0][bad] if bad.any() else out[bad]
            output_storage[0][0] = out + inputs[0] * 0  # keep garbage mix
        else:
            output_storage[0][0] = inputs[0] * 2.0


def _compile(op, check_aliasing=True, check_preallocated=True):
    x = at.vector("x", dtype="float64")
    mode = DebugMode(
        optimizer=None,
        check_aliasing=check_aliasing,
        check_preallocated=check_preallocated,
        stability_patience=1,
    )
    return function([x], op(x), mode=mode)


def test_bad_destroy_map_fires():
    f = _compile(_LyingDestroyer())
    with pytest.raises(BadDestroyMap):
        f(rng.normal(size=4))


def test_bad_view_map_fires():
    f = _compile(_LyingViewer(), check_preallocated=False)
    with pytest.raises(BadViewMap):
        f(rng.normal(size=4))


def test_declared_view_passes():
    f = _compile(_HonestViewer(), check_preallocated=False)
    v = rng.normal(size=4)
    np.testing.assert_allclose(np.asarray(f(v)), v)


def test_preallocated_output_catches_accumulator():
    f = _compile(_Accumulator(), check_aliasing=False)
    with pytest.raises(BadThunkOutput):
        f(rng.normal(size=4))


def test_honest_graph_passes_all_checks():
    x = at.matrix("x", dtype="float64")
    out = at.exp(x)[1:] + x.sum()
    f = function([x], out, mode=DebugMode(stability_patience=1))
    v = rng.normal(size=(4, 3))
    np.testing.assert_allclose(
        np.asarray(f(v)), np.exp(v)[1:] + v.sum(), rtol=1e-6
    )
