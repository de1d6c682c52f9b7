"""Lowerings for conv3d / images2neibs / ctc."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from aesara_tpu.link.jax.dispatch import jax_funcify
from aesara_tpu.tensor.nnet.abstract_conv import AbstractConv3d
from aesara_tpu.tensor.nnet.ctc import CTCGrad, CTCLoss, _ctc_loss_jax
from aesara_tpu.tensor.nnet.neighbours import Images2Neibs


# AbstractConv3d inherits AbstractConv2d whose lowering uses op._jax_forward;
# the singledispatch on the subclass resolves to the parent registration.


@jax_funcify.register(Images2Neibs)
def _jx_images2neibs(op, node=None, **kw):
    def images2neibs(x, neib_shape, neib_step):
        hh, ww = int(neib_shape[0]), int(neib_shape[1])
        sh, sw = int(neib_step[0]), int(neib_step[1])
        b, c, H, W = x.shape
        nH = (H - hh) // sh + 1
        nW = (W - ww) // sw + 1
        rows = []
        for i in range(nH):
            for j in range(nW):
                rows.append(x[:, :, i * sh: i * sh + hh, j * sw: j * sw + ww])
        patches = jnp.stack(rows, axis=2)
        return patches.reshape(b * c * nH * nW, hh * ww)

    return images2neibs


@jax_funcify.register(CTCLoss)
def _jx_ctc(op, node=None, **kw):
    def ctc_loss(log_probs, labels, ilen, llen):
        return _ctc_loss_jax(log_probs, labels, ilen, llen, op.blank)

    return ctc_loss


@jax_funcify.register(CTCGrad)
def _jx_ctc_grad(op, node=None, **kw):
    def ctc_grad(log_probs, labels, ilen, llen, gz):
        _, vjp = jax.vjp(
            lambda lp: _ctc_loss_jax(lp, labels, ilen, llen, op.blank),
            jnp.asarray(log_probs),
        )
        (g,) = vjp(jnp.asarray(gz, dtype=log_probs.dtype))
        return g

    return ctc_grad
