"""Shared test helpers: the backend differential harness.

Mirrors the reference's ``compare_jax_and_py``
(``tests/link/jax/test_basic.py:38-60``): compile the same graph under the
XLA linker and the py (NumPy oracle) linker and assert the results agree.
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.function import function
from aesara_tpu.compile.mode import FAST_RUN, PY, Mode, OPT_NONE
from aesara_tpu.graph.ir import Variable
from aesara_tpu.link.basic import PerformLinker
from aesara_tpu.link.jax.linker import JAXLinker

jax_mode = Mode(JAXLinker(), OPT_NONE)
py_mode = Mode(PerformLinker(), OPT_NONE)
jax_opt_mode = FAST_RUN


def compare_jax_and_py(
    inputs,
    outputs,
    test_values,
    assert_fn=None,
    must_be_device_array: bool = True,
    with_rewrites: bool = False,
):
    """Run a graph under both backends and compare."""
    if assert_fn is None:
        def assert_fn(a, b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    single = isinstance(outputs, Variable)
    jmode = jax_opt_mode if with_rewrites else jax_mode
    fn_jax = function(inputs, outputs, mode=jmode, on_unused_input="ignore")
    fn_py = function(inputs, outputs, mode=py_mode, on_unused_input="ignore")
    res_jax = fn_jax(*test_values)
    res_py = fn_py(*test_values)
    if single:
        res_jax, res_py = [res_jax], [res_py]
    for a, b in zip(res_jax, res_py):
        assert np.asarray(a).dtype == np.asarray(b).dtype, (
            f"dtype mismatch: jax={np.asarray(a).dtype} py={np.asarray(b).dtype}"
        )
        assert np.asarray(a).shape == np.asarray(b).shape, (
            f"shape mismatch: jax={np.asarray(a).shape} py={np.asarray(b).shape}"
        )
        assert_fn(a, b)
    return res_jax
