"""XLA lowerings for nlinalg/slinalg/extra_ops/sort/special/fft/xlogx ops."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import aesara_tpu.tensor.extra_ops as xo
import aesara_tpu.tensor.fft as tfft
import aesara_tpu.tensor.nlinalg as nl
import aesara_tpu.tensor.slinalg as sl
# NOTE: `import a.b as x` resolves via getattr and would pick up the
# sort() FUNCTION exported at the tensor namespace root — import the
# module explicitly (same submodule-shadowing trap as tensor.shape)
import importlib
tsort = importlib.import_module("aesara_tpu.tensor.sort")
import aesara_tpu.tensor.special as sp
from aesara_tpu.link.jax.dispatch import _SCALAR_IMPLS, jax_funcify
from aesara_tpu.tensor.xlogx import XlogX, XlogY0


# --- nlinalg -----------------------------------------------------------------

@jax_funcify.register(nl.MatrixInverse)
def _jx_inv(op, node=None, **kw):
    return jnp.linalg.inv


@jax_funcify.register(nl.MatrixPinv)
def _jx_pinv(op, node=None, **kw):
    return jnp.linalg.pinv


@jax_funcify.register(nl.Det)
def _jx_det(op, node=None, **kw):
    return jnp.linalg.det


@jax_funcify.register(nl.SLogDet)
def _jx_slogdet(op, node=None, **kw):
    def slogdet(x):
        s, l = jnp.linalg.slogdet(x)
        return s, l

    return slogdet


@jax_funcify.register(nl.Eig)
def _jx_eig(op, node=None, **kw):
    def eig(x):
        # XLA supports general eig only on CPU
        return jnp.linalg.eig(x)

    return eig


@jax_funcify.register(nl.Eigh)
def _jx_eigh(op, node=None, **kw):
    uplo = op.UPLO

    def eigh(x):
        return jnp.linalg.eigh(x, UPLO=uplo)

    return eigh


@jax_funcify.register(nl.QRFull)
def _jx_qr(op, node=None, **kw):
    mode = op.mode

    def qr(x):
        return jnp.linalg.qr(x, mode=mode)

    return qr


@jax_funcify.register(nl.SVD)
def _jx_svd(op, node=None, **kw):
    full, uv = op.full_matrices, op.compute_uv

    def svd(x):
        return jnp.linalg.svd(x, full_matrices=full, compute_uv=uv)

    return svd


@jax_funcify.register(nl.Lstsq)
def _jx_lstsq(op, node=None, **kw):
    def lstsq(x, y, rcond):
        sol, res, rank, sv = jnp.linalg.lstsq(x, y, rcond=float(rcond))
        return sol, res, rank.astype(jnp.int64), sv

    return lstsq


@jax_funcify.register(nl.TensorInv)
def _jx_tensorinv(op, node=None, **kw):
    ind = op.ind
    return lambda a: jnp.linalg.tensorinv(a, ind)


@jax_funcify.register(nl.TensorSolve)
def _jx_tensorsolve(op, node=None, **kw):
    axes = op.axes
    return lambda a, b: jnp.linalg.tensorsolve(a, b, axes=axes)


# --- slinalg -----------------------------------------------------------------

@jax_funcify.register(sl.Cholesky)
def _jx_chol(op, node=None, **kw):
    lower = op.lower
    on_error = op.on_error

    def chol(x):
        res = jax.scipy.linalg.cholesky(x, lower=lower)
        if on_error == "nan":
            return res  # jax already yields nan on failure
        return res

    return chol


@jax_funcify.register(sl.Solve)
def _jx_solve(op, node=None, **kw):
    assume_a = op.assume_a
    lower = getattr(op, "lower", False)

    def solve(a, b):
        if assume_a in ("sym", "pos", "her"):
            # jax.scipy.linalg.solve has no lower kwarg: symmetrize from
            # the declared triangle so only that triangle is read
            at_ = jnp.tril(a) if lower else jnp.triu(a)
            sym = at_ + jnp.swapaxes(at_, -1, -2) - (
                at_ * jnp.eye(a.shape[-1], dtype=a.dtype)
            )
            if assume_a == "her":
                sym = jnp.conj(jnp.swapaxes(at_, -1, -2)) + at_ - (
                    at_ * jnp.eye(a.shape[-1], dtype=a.dtype)
                )
            return jax.scipy.linalg.solve(sym, b, assume_a=assume_a)
        return jnp.linalg.solve(a, b)

    return solve


@jax_funcify.register(sl.SolveTriangular)
def _jx_solve_tri(op, node=None, **kw):
    lower, trans, unit = op.lower, op.trans, op.unit_diagonal

    def solve_triangular(a, b):
        return jax.scipy.linalg.solve_triangular(
            a, b, lower=lower, trans=trans, unit_diagonal=unit
        )

    return solve_triangular


@jax_funcify.register(sl.CholeskySolve)
def _jx_cho_solve(op, node=None, **kw):
    lower = op.lower

    def cho_solve(c, b):
        return jax.scipy.linalg.cho_solve((c, lower), b)

    return cho_solve


@jax_funcify.register(sl.Eigvalsh)
def _jx_eigvalsh(op, node=None, **kw):
    def eigvalsh(*args):
        if len(args) > 1:
            raise NotImplementedError("generalized eigvalsh not lowered")
        return jnp.linalg.eigvalsh(args[0], UPLO="L" if op.lower else "U")

    return eigvalsh


@jax_funcify.register(sl.Expm)
def _jx_expm(op, node=None, **kw):
    return jax.scipy.linalg.expm


@jax_funcify.register(sl.SolveContinuousLyapunov)
def _jx_lyap_cont(op, node=None, **kw):
    def solve_lyap(a, q):
        raise NotImplementedError(
            "continuous Lyapunov solve has no XLA kernel; run in py mode"
        )

    return solve_lyap


@jax_funcify.register(sl.SolveDiscreteLyapunov)
def _jx_lyap_disc(op, node=None, **kw):
    def solve_lyap(a, q):
        # direct method: vec(X) = (I - A⊗A)^-1 vec(Q)
        n = a.shape[0]
        eye = jnp.eye(n * n, dtype=a.dtype)
        kron = jnp.kron(a, a.conj())
        x = jnp.linalg.solve(eye - kron, q.reshape(-1))
        return x.reshape(n, n)

    return solve_lyap


# --- extra_ops ------------------------------------------------------------------

@jax_funcify.register(xo.CumOp)
def _jx_cum(op, node=None, **kw):
    fn = jnp.cumsum if op.mode == "add" else jnp.cumprod
    axis = op.axis
    return lambda x: fn(x, axis=axis)


@jax_funcify.register(xo.Repeat)
def _jx_repeat(op, node=None, **kw):
    axis = op.axis

    def repeat(x, repeats):
        r = np.asarray(repeats)
        if r.ndim > 0:
            total = int(r.sum())
            return jnp.repeat(x, r, axis=axis, total_repeat_length=total)
        return jnp.repeat(x, int(r), axis=axis)

    return repeat


@jax_funcify.register(xo.Unique)
def _jx_unique(op, node=None, **kw):
    def unique(x):
        raise NotImplementedError(
            "Unique has a data-dependent output shape; run in py mode or "
            "use jnp.unique with a static size upstream"
        )

    return unique


@jax_funcify.register(xo.SearchsortedOp)
def _jx_searchsorted(op, node=None, **kw):
    side = op.side

    def searchsorted(x, v, *rest):
        if rest:
            x = jnp.take(x, rest[0])
        return jnp.searchsorted(x, v, side=side).astype(jnp.int64)

    return searchsorted


@jax_funcify.register(xo.UnravelIndex)
def _jx_unravel(op, node=None, **kw):
    def unravel_index(indices, dims):
        return tuple(
            r.astype(jnp.int64)
            for r in jnp.unravel_index(indices, tuple(int(d) for d in np.asarray(dims)))
        )

    return unravel_index


@jax_funcify.register(xo.RavelMultiIndex)
def _jx_ravel(op, node=None, **kw):
    mode = op.mode

    def ravel_multi_index(*inp):
        *multi, dims = inp
        return jnp.ravel_multi_index(
            tuple(multi), tuple(int(d) for d in np.asarray(dims)),
            mode="clip" if mode == "raise" else mode,
        ).astype(jnp.int64)

    return ravel_multi_index


@jax_funcify.register(xo.FillDiagonal)
def _jx_fill_diag(op, node=None, **kw):
    def fill_diagonal(a, val):
        a = jnp.asarray(a)
        n = min(a.shape[0], a.shape[1])
        i = jnp.arange(n)
        return a.at[i, i].set(val)

    return fill_diagonal


@jax_funcify.register(xo.FillDiagonalOffset)
def _jx_fill_diag_off(op, node=None, **kw):
    k = op.offset

    def fill_diagonal_offset(a, val):
        a = jnp.asarray(a)
        if k >= 0:
            n = min(a.shape[0], a.shape[1] - k)
            i = jnp.arange(max(n, 0))
            return a.at[i, i + k].set(val)
        n = min(a.shape[0] + k, a.shape[1])
        i = jnp.arange(max(n, 0))
        return a.at[i - k, i].set(val)

    return fill_diagonal_offset


@jax_funcify.register(xo.BroadcastTo)
def _jx_broadcast_to(op, node=None, **kw):
    def broadcast_to(x, *shape):
        return jnp.broadcast_to(x, tuple(int(s) for s in shape))

    return broadcast_to


@jax_funcify.register(xo.Bartlett)
def _jx_bartlett(op, node=None, **kw):
    return lambda m: jnp.bartlett(int(m)).astype(jnp.float64)


@jax_funcify.register(xo.CpuContiguous)
def _jx_contig(op, node=None, **kw):
    return lambda x: x


# --- sort --------------------------------------------------------------------------

@jax_funcify.register(tsort.SortOp)
def _jx_sort(op, node=None, **kw):
    return lambda x, axis: jnp.sort(x, axis=int(axis))


@jax_funcify.register(tsort.ArgSortOp)
def _jx_argsort(op, node=None, **kw):
    return lambda x, axis: jnp.argsort(x, axis=int(axis)).astype(jnp.int64)


@jax_funcify.register(tsort.TopKOp)
def _jx_topk(op, node=None, **kw):
    axis = op.axis

    def topk(x, k):
        k = int(k)
        ax = axis % x.ndim
        xs = jnp.moveaxis(x, ax, -1)
        if k < 0:
            # bottom-|k|: reverse the ordering dtype-safely
            xs_key = jnp.invert(xs) if xs.dtype.kind in "bui" else -xs
            _, idx = lax.top_k(xs_key, -k)
            vals = jnp.take_along_axis(xs, idx, axis=-1)
        else:
            if xs.dtype.kind in "bui":
                # lax.top_k handles ints correctly incl. unsigned
                vals, idx = lax.top_k(xs, k)
            else:
                vals, idx = lax.top_k(xs, k)
        vals = jnp.moveaxis(vals, -1, ax)
        idx = jnp.moveaxis(idx, -1, ax)
        outs = []
        if op.return_values:
            outs.append(vals)
        if op.return_indices:
            outs.append(idx.astype(np.dtype(op.idx_dtype)))
        return tuple(outs) if len(outs) > 1 else outs[0]

    return topk


# --- special -----------------------------------------------------------------------

@jax_funcify.register(sp.Softmax)
def _jx_softmax(op, node=None, **kw):
    axis = op.axis

    def softmax(x):
        ax = axis if axis is not None else tuple(range(x.ndim))
        return jax.nn.softmax(x, axis=ax)

    return softmax


@jax_funcify.register(sp.LogSoftmax)
def _jx_log_softmax(op, node=None, **kw):
    axis = op.axis
    return lambda x: jax.nn.log_softmax(x, axis=axis)


@jax_funcify.register(sp.SoftmaxGrad)
def _jx_softmax_grad(op, node=None, **kw):
    axis = op.axis

    def softmax_grad(dy, sm):
        inner = jnp.sum(dy * sm, axis=axis, keepdims=axis is not None)
        return sm * (dy - inner)

    return softmax_grad


# --- fft --------------------------------------------------------------------------

@jax_funcify.register(tfft.RFFTOp)
def _jx_rfft(op, node=None, **kw):
    def rfft(a, *rest):
        s = tuple(int(x) for x in np.asarray(rest[0])) if rest else None
        res = jnp.fft.rfftn(a, s=s, axes=range(1, a.ndim))
        return jnp.stack([res.real, res.imag], axis=-1)

    return rfft


@jax_funcify.register(tfft.IRFFTOp)
def _jx_irfft(op, node=None, **kw):
    def irfft(a, *rest):
        s = tuple(int(x) for x in np.asarray(rest[0])) if rest else None
        comp = a[..., 0] + 1j * a[..., 1]
        return jnp.fft.irfftn(comp, s=s, axes=range(1, comp.ndim))

    return irfft


# --- xlogx scalar ops into the elemwise table ---------------------------------------

def _xlogx(x):
    return jnp.where(x == 0.0, jnp.zeros_like(x), x * jnp.log(x))


def _xlogy0(x, y):
    return jnp.where(x == 0.0, jnp.zeros_like(x), x * jnp.log(y))


_SCALAR_IMPLS[XlogX] = _xlogx
_SCALAR_IMPLS[XlogY0] = _xlogy0


from aesara_tpu.tensor.fft import IRFFTGradOp, RFFTGradOp  # noqa: E402


@jax_funcify.register(RFFTGradOp)
def _jx_rfft_grad(op, node=None, **kw):
    def rfft_grad(a, gz):
        def packed_rfft(x):
            res = jnp.fft.rfftn(x, axes=range(1, x.ndim))
            return jnp.stack([res.real, res.imag], axis=-1)

        a = jnp.asarray(a)
        _, vjp = jax.vjp(packed_rfft, a)
        (g,) = vjp(jnp.asarray(gz, dtype=a.dtype))
        return g

    return rfft_grad


@jax_funcify.register(IRFFTGradOp)
def _jx_irfft_grad(op, node=None, **kw):
    def irfft_grad(a, gz):
        def unpacked_irfft(packed):
            comp = packed[..., 0] + 1j * packed[..., 1]
            return jnp.fft.irfftn(comp, axes=range(1, comp.ndim))

        a = jnp.asarray(a)
        _, vjp = jax.vjp(unpacked_irfft, a)
        (g,) = vjp(jnp.asarray(gz, dtype=jnp.asarray(gz).dtype))
        return g

    return irfft_grad
