"""Pipeline parallelism (SURVEY §7 item 10: "PP via multi-program +
ppermute schedule").  The reference has no model parallelism of any
kind; this is the GPipe schedule expressed entirely in the framework's
own collective ops, so the whole pipeline is still ONE graph → one XLA
program per device, with the stage exchanges riding ICI.

The SPMD formulation (one program, S devices = S stages):
  tick t:  stage 0 injects microbatch t (or zeros after the last one),
           every stage applies its local weights to the activation it
           holds, the result ppermutes one hop down the ring, and the
           last stage's finished microbatch is psum-broadcast into the
           collected output.
A microbatch entering at tick m leaves the last of S stages at tick
m + S - 1, so M microbatches drain in M + S - 1 ticks (the M·S work is
pipelined over the bubble-inclusive schedule, as in GPipe).
"""

from __future__ import annotations

from typing import Callable, Sequence

from aesara_tpu.parallel.ops import axis_index, ppermute, psum
from aesara_tpu.tensor.basic import as_tensor_variable, zeros_like
from aesara_tpu.tensor.math import eq as teq
from aesara_tpu.tensor.basic import switch

__all__ = ["gpipe"]


def gpipe(
    microbatches,
    stage_fn: Callable,
    axis_name: str,
    n_stages: int,
    n_microbatches: int,
):
    """Build the symbolic GPipe schedule.

    Parameters
    ----------
    microbatches
        Symbolic (M, ...) tensor of inputs, REPLICATED across the pipe
        axis (every stage sees all microbatches; only stage 0 reads them).
    stage_fn
        ``stage_fn(x) -> y`` applied by every device; its weights should
        be pp-sharded inputs/shareds so each device computes its own stage.
        Must map activations to activations of the same type.
    axis_name, n_stages, n_microbatches
        The mesh axis the stages live on, its size, and M.

    Returns the (M, ...) stacked outputs, replicated on every device.
    """
    microbatches = as_tensor_variable(microbatches)
    rank = axis_index(axis_name)
    fwd = tuple((i, (i + 1) % n_stages) for i in range(n_stages))

    carry = zeros_like(microbatches[0])
    collected = []
    for t in range(n_microbatches + n_stages - 1):
        inject = (
            microbatches[t] if t < n_microbatches else zeros_like(microbatches[0])
        )
        cur = switch(teq(rank, 0), inject, carry)
        y = stage_fn(cur)
        if t >= n_stages - 1:
            # the microbatch finishing on the last stage this tick,
            # broadcast to every device so the result is replicated
            done = switch(teq(rank, n_stages - 1), y, zeros_like(y))
            collected.append(psum(done, axis_name))
        carry = ppermute(y, axis_name, fwd)

    from aesara_tpu.tensor.basic import stack

    return stack(collected, axis=0)
