"""XLA lowerings for IfElse, CheckAndRaise, OpFromGraph, Print."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from aesara_tpu.compile.builders import OpFromGraph
from aesara_tpu.ifelse import IfElse
from aesara_tpu.link.jax.dispatch import jax_funcify
from aesara_tpu.printing import Print
from aesara_tpu.raise_op import CheckAndRaise


@jax_funcify.register(IfElse)
def _jx_ifelse(op, node=None, **kwargs):
    n = op.n_outs

    def ifelse(cond, *args):
        trues = args[:n]
        falses = args[n:]
        try:
            # concrete condition: pick the branch at trace time
            return trues if bool(cond) else falses
        except jax.errors.TracerBoolConversionError:
            pass
        res = lax.cond(
            jnp.asarray(cond).astype(bool),
            lambda: tuple(jnp.asarray(t) for t in trues),
            lambda: tuple(jnp.asarray(f) for f in falses),
        )
        return res

    return ifelse


@jax_funcify.register(CheckAndRaise)
def _jx_check_and_raise(op, node=None, **kwargs):
    def check_and_raise(value, *conds):
        # concrete conditions (trace-time constants) can still raise
        for c in conds:
            try:
                ok = bool(np.all(np.asarray(c)))
            except Exception:
                continue  # traced: XLA cannot raise host exceptions
            if not ok:
                raise op.exc_type(op.msg)
        return value

    return check_and_raise


@jax_funcify.register(OpFromGraph)
def _jx_op_from_graph(op, node=None, **kwargs):
    from aesara_tpu.link.jax.linker import fgraph_to_jax

    # snapshot: op instances (and so op.fgraph) are shared between every
    # compiled function that references this OpFromGraph; cloning fences
    # the captured closure from any later in-place change to the shared
    # inner graph (jit traces lazily, so the closure may run long after
    # other compiles have touched the op)
    inner = fgraph_to_jax(op.fgraph.clone())

    def op_from_graph(*args):
        return inner(*args)

    return op_from_graph


from aesara_tpu.link.jax.dispatch import (
    backend_supports_host_callbacks as _backend_supports_callbacks,
)


@jax_funcify.register(Print)
def _jx_print(op, node=None, **kwargs):
    message = op.message

    if not _backend_supports_callbacks():
        import warnings

        warnings.warn(
            f"Print({op.message!r}): this backend does not support host "
            "callbacks; the op passes values through unprinted (use "
            'mode="PY" or a CPU run to see them)'
        )

        def print_op_passthrough(x):
            return x

        return print_op_passthrough

    def print_op(x):
        jax.debug.print(message + " {}", x)
        return x

    return print_op


from aesara_tpu.compile.builders import RematBarrier


@jax_funcify.register(RematBarrier)
def _jx_remat_barrier(op, node=None, **kwargs):
    import jax

    def remat_barrier(x):
        return jax.lax.optimization_barrier(x)

    return remat_barrier
