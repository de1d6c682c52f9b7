"""Expert parallelism (SURVEY §2.12: the EP axis of the parallelism
story).  Top-1 switch routing with capacity, experts sharded over a mesh
axis: every device computes the shared dispatch plan, applies ONLY its
own expert to that expert's token slots, and a psum combine scatters the
expert outputs back to token positions.  One graph → one XLA program;
the combine is the only cross-device traffic.
"""

from __future__ import annotations

from typing import Callable

from aesara_tpu.parallel.ops import axis_index, psum
from aesara_tpu.tensor.basic import arange, as_tensor_variable, switch
from aesara_tpu.tensor.extra_ops import cumsum
from aesara_tpu.tensor.math import argmax, eq as teq, le as tle, tensordot
from aesara_tpu.tensor.special import softmax

__all__ = ["switch_moe"]


def switch_moe(
    x,
    router_logits,
    expert_fn: Callable,
    axis_name: str,
    n_experts: int,
    capacity: int,
):
    """Build a symbolic top-1 switch-MoE layer.

    Parameters
    ----------
    x
        (B, D) tokens, replicated over the expert axis.
    router_logits
        (B, E) routing scores (usually x @ W_router).
    expert_fn
        ``expert_fn(tokens) -> tokens`` over (capacity, D); its weights
        should be ep-sharded so each device IS one expert.
    axis_name, n_experts, capacity
        Mesh axis carrying the experts, E (= axis size), and the max
        tokens an expert accepts (overflow tokens drop to zero, the
        standard switch-transformer behavior).

    Returns (B, D): routed tokens weighted by their router probability.
    """
    x = as_tensor_variable(x)
    probs = softmax(router_logits, axis=-1)                       # (B, E)
    chosen = argmax(probs, axis=-1)                               # (B,)
    onehot = teq(chosen[:, None], arange(n_experts)[None, :]).astype(x.dtype)
    gate = (probs * onehot).sum(axis=-1)                          # (B,)

    # position of each token inside its expert's buffer (1-based), with
    # capacity overflow masked out
    pos = cumsum(onehot, axis=0) * onehot                         # (B, E)
    keep = tle(pos, float(capacity)).astype(x.dtype) * onehot
    slot = teq(pos[:, :, None],
               (arange(capacity) + 1)[None, None, :]).astype(x.dtype)
    dispatch = slot * keep[:, :, None]                            # (B, E, C)

    # (E, C, D) expert inputs; each device computes only its own expert
    expert_in = tensordot(dispatch, x, axes=[[0], [0]])           # (E, C, D)
    rank = axis_index(axis_name)
    my_in = expert_in[rank]                                       # (C, D)
    my_out = expert_fn(my_in)                                     # (C, D)

    # scatter back: tokens routed to THIS expert read their slot's output;
    # psum over the axis merges the disjoint expert contributions
    my_dispatch = dispatch[:, rank, :]                            # (B, C)
    partial = tensordot(my_dispatch, my_out, axes=[[1], [0]])     # (B, D)
    combined = psum(partial, axis_name)
    return combined * gate[:, None]
