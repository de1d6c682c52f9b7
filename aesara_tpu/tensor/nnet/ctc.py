"""Connectionist Temporal Classification loss (reference
``aesara/tensor/nnet/ctc.py`` binds warp-ctc C code; SURVEY §2.11 item 5
calls for a pure-jax CTC).  This is a dynamic-programming forward pass
in log space implemented over lax.scan — one implementation for both the
oracle and the XLA path."""

from __future__ import annotations

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable, cast
from aesara_tpu.tensor.type import TensorType


def _ctc_loss_jax(log_probs, labels, input_lengths, label_lengths, blank=0):
    """log_probs: (T, B, C) log-softmax activations; labels: (B, L)."""
    import jax
    import jax.numpy as jnp

    T, B, C = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    # extended label sequence: blank, l1, blank, l2, ..., blank
    ext = jnp.full((B, S), blank, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    neg_inf = jnp.asarray(-1e30, log_probs.dtype)

    # alpha_0
    p0 = log_probs[0]  # (B, C)
    alpha0 = jnp.full((B, S), neg_inf)
    alpha0 = alpha0.at[:, 0].set(jnp.take_along_axis(p0, ext[:, 0:1], 1)[:, 0])
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(label_lengths > 0,
                  jnp.take_along_axis(p0, ext[:, 1:2], 1)[:, 0], neg_inf)
    )

    same_as_prev2 = jnp.concatenate(
        [jnp.ones((B, 2), bool), ext[:, 2:] == ext[:, :-2]], axis=1
    )

    def lse(a, b):
        m = jnp.maximum(a, b)
        safe = jnp.where(jnp.isfinite(m), m, 0.0)
        return jnp.where(
            jnp.isfinite(m),
            safe + jnp.log(jnp.exp(a - safe) + jnp.exp(b - safe)),
            m,
        )

    def step(alpha, t):
        p = log_probs[t]  # (B, C)
        shifted1 = jnp.concatenate(
            [jnp.full((B, 1), neg_inf), alpha[:, :-1]], axis=1
        )
        shifted2 = jnp.concatenate(
            [jnp.full((B, 2), neg_inf), alpha[:, :-2]], axis=1
        )
        shifted2 = jnp.where(same_as_prev2, neg_inf, shifted2)
        acc = lse(alpha, lse(shifted1, shifted2))
        emit = jnp.take_along_axis(p, ext, axis=1)
        new_alpha = acc + emit
        # freeze past each sequence's input length
        active = (t < input_lengths)[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.arange(1, T))
    idx_last = 2 * label_lengths  # blank after last label
    idx_prev = jnp.maximum(2 * label_lengths - 1, 0)
    a_last = jnp.take_along_axis(alpha, idx_last[:, None], 1)[:, 0]
    a_prev = jnp.take_along_axis(alpha, idx_prev[:, None], 1)[:, 0]
    total = lse(a_last, jnp.where(label_lengths > 0, a_prev, neg_inf))
    return -total


class CTCLoss(Op):
    """ctc(log_probs(T,B,C), labels(B,L), input_lengths(B),
    label_lengths(B)) → per-sequence negative log likelihood (B,).
    Gradient via jax.vjp of the same DP."""

    __props__ = ("blank",)

    def __init__(self, blank: int = 0):
        self.blank = int(blank)

    def make_node(self, log_probs, labels, input_lengths, label_lengths):
        log_probs = as_tensor_variable(log_probs)
        labels = cast(as_tensor_variable(labels), "int64")
        input_lengths = cast(as_tensor_variable(input_lengths), "int64")
        label_lengths = cast(as_tensor_variable(label_lengths), "int64")
        if log_probs.type.ndim != 3:
            raise TypeError("log_probs must be (T, B, C)")
        return Apply(
            self, [log_probs, labels, input_lengths, label_lengths],
            [TensorType(log_probs.type.dtype, (log_probs.type.shape[1],))()],
        )

    def perform(self, node, inputs, output_storage):
        import jax.numpy as jnp

        log_probs, labels, ilen, llen = inputs
        res = _ctc_loss_jax(
            jnp.asarray(log_probs), jnp.asarray(labels),
            jnp.asarray(ilen), jnp.asarray(llen), self.blank,
        )
        output_storage[0][0] = np.asarray(res, dtype=log_probs.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [(input_shapes[0][1],)]

    def L_op(self, inputs, outputs, output_grads):
        return [CTCGrad(self.blank)(*inputs, output_grads[0])] + [
            g for g in _ctc_disconnected(self, inputs[1:])
        ]


def _ctc_disconnected(op, rest):
    from aesara_tpu.gradient import DisconnectedType

    return [DisconnectedType()() for _ in rest]


class CTCGrad(Op):
    __props__ = ("blank",)

    def __init__(self, blank: int = 0):
        self.blank = int(blank)

    def make_node(self, log_probs, labels, ilen, llen, gz):
        return Apply(
            self, [log_probs, labels, ilen, llen, gz], [log_probs.type()]
        )

    def perform(self, node, inputs, output_storage):
        import jax
        import jax.numpy as jnp

        log_probs, labels, ilen, llen, gz = inputs
        _, vjp = jax.vjp(
            lambda lp: _ctc_loss_jax(
                lp, jnp.asarray(labels), jnp.asarray(ilen),
                jnp.asarray(llen), self.blank,
            ),
            jnp.asarray(log_probs),
        )
        (g,) = vjp(jnp.asarray(gz, dtype=log_probs.dtype))
        output_storage[0][0] = np.asarray(g, dtype=log_probs.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]


def ctc(activations, labels, input_lengths, label_lengths=None, blank=0):
    """CTC loss on (T, B, C) activations (pre-softmax; log-softmax applied
    internally, matching warp-ctc's convention in the reference)."""
    from aesara_tpu.tensor.special import log_softmax

    activations = as_tensor_variable(activations)
    log_probs = log_softmax(activations, axis=-1)
    labels = as_tensor_variable(labels)
    if label_lengths is None:
        from aesara_tpu.tensor.math import sum as tsum, ge as tge

        label_lengths = cast(
            tsum(cast(tge(labels, 0), "int64"), axis=1), "int64"
        )
    return CTCLoss(blank)(log_probs, labels, input_lengths, label_lengths)
