"""NanGuardMode: per-node nan/inf/huge-value detection
(reference ``aesara/compile/nanguardmode.py:140``)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.mode import Mode, OPT_FAST_COMPILE
from aesara_tpu.config import config
from aesara_tpu.link.basic import Container, LocalLinker, map_storage, raise_with_op


__all__ = ["NanGuardMode", "NanGuardError", "flatten_values"]


class NanGuardError(AssertionError):
    pass


def _contains_bad(arr, nan_is_error, inf_is_error, big_is_error):
    a = np.asarray(arr)
    if not np.issubdtype(a.dtype, np.floating) and not np.issubdtype(a.dtype, np.complexfloating):
        return None
    if nan_is_error and np.isnan(a).any():
        return "NaN"
    if inf_is_error and np.isinf(a).any():
        return "Inf"
    if big_is_error and a.size:
        finite = a[np.isfinite(a)]
        if finite.size and np.max(np.abs(finite)) > 1e10:
            return "big value (>1e10)"
    return None


class NanGuardLinker(LocalLinker):
    def __init__(self, nan_is_error, inf_is_error, big_is_error):
        super().__init__(allow_gc=False)
        self.nan_is_error = nan_is_error
        self.inf_is_error = inf_is_error
        self.big_is_error = big_is_error

    def make_all(self, input_storage=None, output_storage=None, storage_map=None):
        fgraph = self.fgraph
        order = fgraph.toposort()
        input_storage, output_storage, storage_map = map_storage(
            fgraph, order, input_storage, output_storage, storage_map
        )
        compute_map = {v: [False] for v in storage_map}
        thunks = [
            (node, node.op.make_py_thunk(node, storage_map, compute_map, []))
            for node in order
        ]
        input_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.inputs, input_storage)
        ]
        output_containers = [
            Container(v.type, s, name=v.name)
            for v, s in zip(fgraph.outputs, output_storage)
        ]
        args = (self.nan_is_error, self.inf_is_error, self.big_is_error)

        def check(node, role, var, val):
            if val is None:
                return
            bad = _contains_bad(val, *args)
            if bad:
                raise NanGuardError(
                    f"NanGuardMode found {bad} in {role} of node {node}\n"
                    f"variable: {var}\nvalue: {np.asarray(val)!r}"
                )

        def run():
            for node, thunk in thunks:
                for var in node.inputs:
                    check(node, "an input", var, storage_map[var][0])
                try:
                    thunk()
                except Exception:
                    raise_with_op(fgraph, node, thunk)
                for var in node.outputs:
                    check(node, "an output", var, storage_map[var][0])

        return run, input_containers, output_containers, thunks, order


class NanGuardMode(Mode):
    """NaN/Inf/big-value guarding (reference ``nanguardmode.py:140``).

    ``linker="jax"`` (default) checks every node boundary INSIDE the
    single rewritten+fused+donated XLA program users actually ship —
    the check is traced into the program as two extra outputs (violation
    code + first offending node) and inspected on the host after each
    call (SURVEY §7 stage 8).  ``linker="py"`` keeps the reference's
    behavior: eager per-node execution with host-side checks between
    thunks (pre-rewrite values visible, but it never sees what fusion,
    reassociation or donation did).
    """

    def __init__(self, nan_is_error=None, inf_is_error=None, big_is_error=None,
                 optimizer="fast_run", linker="jax"):
        if nan_is_error is None:
            nan_is_error = config.nan_is_error
        if inf_is_error is None:
            inf_is_error = config.inf_is_error
        if big_is_error is None:
            big_is_error = config.big_is_error
        flags = (nan_is_error, inf_is_error, big_is_error)
        if linker == "jax":
            from aesara_tpu.link.jax.linker import JAXLinker

            super().__init__(JAXLinker(nan_guard=flags), optimizer)
        elif linker == "py":
            super().__init__(NanGuardLinker(*flags), optimizer)
        else:
            raise ValueError(f"NanGuardMode linker must be 'jax' or 'py', got {linker!r}")


def flatten_values(x):
    """Parity helper from the reference."""
    return np.asarray(x).ravel()


def flatten(l):
    """Flatten nested lists/tuples (reference ``nanguardmode.flatten``)."""
    if isinstance(l, (list, tuple)):
        out = []
        for e in l:
            out.extend(flatten(e))
        return out
    return [l]


def contains_nan(arr, node=None, var=None) -> bool:
    """(reference ``contains_nan``)"""
    import numpy as np

    a = np.asarray(arr)
    if a.dtype.kind not in "fc":
        return False
    return bool(np.isnan(a).any())


def contains_inf(arr, node=None, var=None) -> bool:
    import numpy as np

    a = np.asarray(arr)
    if a.dtype.kind not in "fc":
        return False
    return bool(np.isinf(a).any())
