"""Dense linear algebra, numpy.linalg flavor.

Re-design of the reference's ``aesara/tensor/nlinalg.py`` (MatrixInverse
:100, MatrixPinv:16, Det:196, Eig:234, Eigh:262, QRFull:403, SVD:496,
Lstsq:581, TensorInv:689, TensorSolve:747).  perform is LAPACK via
NumPy (the oracle); the XLA path lowers to jnp.linalg on the MXU.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.scalar.ops import _np_dtype
from aesara_tpu.tensor.basic import as_tensor_variable, cast, diagonal
from aesara_tpu.tensor.type import TensorType


__all__ = [
    "MatrixInverse", "matrix_inverse", "inv",
    "MatrixPinv", "pinv", "Det", "det", "SLogDet", "slogdet",
    "Eig", "eig", "Eigh", "eigh", "QRFull", "qr", "SVD", "svd",
    "Lstsq", "lstsq", "TensorInv", "tensorinv", "TensorSolve", "tensorsolve",
    "trace", "matrix_dot", "matrix_power", "norm",
]


class _MatrixUnaryOp(Op):
    """Base: one square-matrix input, outputs declared by subclass."""

    __props__ = ()

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim != 2:
            raise TypeError(f"{type(self).__name__} requires a matrix")
        return Apply(self, [x], self._out_types(x))

    def _out_types(self, x):
        raise NotImplementedError


class MatrixInverse(_MatrixUnaryOp):
    """(reference ``nlinalg.py:100``)"""

    def _out_types(self, x):
        return [x.type()]

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = np.linalg.inv(x).astype(x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        # d(inv X) = -inv(X) dX inv(X) → gX = -X^-T gz X^-T
        (x,) = inputs
        (gz,) = output_grads
        xi = matrix_inverse(x)
        from aesara_tpu.tensor.math import dot, neg

        return [neg(dot(dot(xi.T, gz), xi.T))]

    def R_op(self, inputs, eval_points):
        (x,) = inputs
        (ev,) = eval_points
        if ev is None:
            return [None]
        xi = matrix_inverse(x)
        from aesara_tpu.tensor.math import dot, neg

        return [neg(dot(dot(xi, ev), xi))]


matrix_inverse = MatrixInverse()
inv = matrix_inverse


class MatrixPinv(_MatrixUnaryOp):
    """(reference ``nlinalg.py:16``)"""

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim != 2:
            raise TypeError("pinv requires a matrix")
        return Apply(self, [x], [TensorType(x.type.dtype, (x.type.shape[1], x.type.shape[0]))()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = np.linalg.pinv(x).astype(x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        (xs,) = input_shapes
        return [(xs[1], xs[0])]

    def grad(self, inputs, output_grads):
        # Golub & Pereyra pinv VJP (reference MatrixPinv.L_op): with
        # x (m,n), z = pinv(x) (n,m), gz (n,m):
        #   (-z gzT z + z zT gz (I_m - x z) + (I_n - z x) gz zT z).T
        # (review finding: the old operand order was shape-incompatible
        # for rectangular x and wrong-valued for square x)
        (x,) = inputs
        (gz,) = output_grads
        from aesara_tpu.tensor.math import dot

        z = pinv(x)
        I_m = _eye_like(x, 0)
        I_n = _eye_like(x, 1)
        term1 = -dot(dot(z, gz.T), z)
        term2 = dot(dot(dot(z, z.T), gz), I_m - dot(x, z))
        term3 = dot(dot(dot(I_n - dot(z, x), gz), z.T), z)
        return [(term1 + term2 + term3).T]


def _eye_like(x, which):
    from aesara_tpu.tensor.basic import eye
    from aesara_tpu.tensor.shape import shape as tshape

    n = tshape(x)[0] if which == 0 else tshape(x)[1]
    return eye(n, n, 0, dtype=x.type.dtype)


pinv_op = MatrixPinv()


def pinv(x):
    return pinv_op(x)


class Det(_MatrixUnaryOp):
    """(reference ``nlinalg.py:196``)"""

    def _out_types(self, x):
        return [TensorType(x.type.dtype, ())()]

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = np.asarray(np.linalg.det(x), dtype=x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [()]

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        from aesara_tpu.tensor.math import mul

        return [mul(gz, det(x), matrix_inverse(x).T)]

    def R_op(self, inputs, eval_points):
        # Jacobi's formula forward rule: d det(A)[V] = det(A)·tr(A⁻¹ V)
        (x,) = inputs
        (v,) = eval_points
        if v is None:
            return [None]
        from aesara_tpu.tensor.math import dot, mul

        return [mul(det(x), trace(dot(matrix_inverse(x), v)))]


det = Det()


class SLogDet(_MatrixUnaryOp):
    """sign and log|det| (jax-friendly stable determinant)."""

    def _out_types(self, x):
        return [TensorType(x.type.dtype, ())(), TensorType(x.type.dtype, ())()]

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        sign, logdet = np.linalg.slogdet(x)
        output_storage[0][0] = np.asarray(sign, dtype=x.dtype)
        output_storage[1][0] = np.asarray(logdet, dtype=x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [(), ()]

    def grad(self, inputs, output_grads):
        (x,) = inputs
        _, g_logdet = output_grads
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.math import mul

        return [mul(g_logdet, matrix_inverse(x).T)]


slogdet = SLogDet()


class Eig(_MatrixUnaryOp):
    """general eigendecomposition (reference ``nlinalg.py:234``)."""

    def _out_types(self, x):
        n = x.type.shape[0]
        return [
            TensorType("complex128" if x.type.dtype == "float64" else "complex64", (n,))(),
            TensorType("complex128" if x.type.dtype == "float64" else "complex64", (n, n))(),
        ]

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        w, v = np.linalg.eig(x)
        output_storage[0][0] = w.astype(_np_dtype(node.outputs[0].type.dtype))
        output_storage[1][0] = v.astype(_np_dtype(node.outputs[1].type.dtype))

    def infer_shape(self, fgraph, node, input_shapes):
        (xs,) = input_shapes
        return [(xs[0],), xs]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0])]


eig = Eig()


class Eigh(_MatrixUnaryOp):
    """symmetric eigendecomposition (reference ``nlinalg.py:262`` + grad :333)."""

    __props__ = ("UPLO",)

    def __init__(self, UPLO="L"):
        self.UPLO = UPLO

    def _out_types(self, x):
        n = x.type.shape[0]
        # Hermitian eigenvalues are REAL even for complex input
        # (numpy/LAPACK contract: complex128 → float64 w)
        w_dtype = str(np.zeros(0, dtype=x.type.dtype).real.dtype)
        return [TensorType(w_dtype, (n,))(), TensorType(x.type.dtype, (n, n))()]

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        w, v = np.linalg.eigh(x, UPLO=self.UPLO)
        output_storage[0][0] = w.astype(_np_dtype(node.outputs[0].type.dtype))
        output_storage[1][0] = v.astype(x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        (xs,) = input_shapes
        return [(xs[0],), xs]

    def grad(self, inputs, output_grads):
        (x,) = inputs
        gw, gv = output_grads
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.basic import switch
        from aesara_tpu.tensor.math import dot, eq
        from aesara_tpu.tensor.shape import shape_padleft, shape_padright

        w, v = eigh_op_cached(self.UPLO)(x)
        # standard eigh backward: gX = V (I∘gw + F∘(Vᵀ gv)) Vᵀ with
        # F_ij = 1/(w_j - w_i) off-diagonal
        gw_is_zero = isinstance(gw.type, DisconnectedType)
        gv_is_zero = isinstance(gv.type, DisconnectedType)
        terms = None
        from aesara_tpu.tensor.basic import AllocDiag, zeros_like

        if not gw_is_zero:
            terms = dot(dot(v, AllocDiag(0)(gw)), v.T)
        if not gv_is_zero:
            wdiff = shape_padleft(w, 1) - shape_padright(w, 1)
            F = switch(eq(wdiff, 0.0), 0.0 * wdiff, 1.0 / wdiff)
            inner = F * dot(v.T, gv)
            t2 = dot(dot(v, inner), v.T)
            terms = t2 if terms is None else terms + t2
        if terms is None:
            return [zeros_like(x)]
        # eigh reads only ONE triangle of x (UPLO): fold the symmetric
        # sensitivity into that triangle — the other triangle's true
        # derivative is exactly zero (review finding; reference EighGrad)
        from aesara_tpu.tensor.basic import tril, triu
        from aesara_tpu.tensor.basic import AllocDiag as _AD
        from aesara_tpu.tensor.basic import ExtractDiag as _ED

        diag_part = _AD(0)(_ED(0, 0, 1)(terms))
        if self.UPLO == "L":
            folded = tril(terms + terms.T) - diag_part
        else:
            folded = triu(terms + terms.T) - diag_part
        return [folded]


_eigh_cache = {}


def eigh_op_cached(UPLO):
    if UPLO not in _eigh_cache:
        _eigh_cache[UPLO] = Eigh(UPLO)
    return _eigh_cache[UPLO]


def eigh(a, UPLO="L"):
    return eigh_op_cached(UPLO)(a)


class QRFull(Op):
    """qr decomposition (reference ``nlinalg.py:403``)."""

    __props__ = ("mode",)

    def __init__(self, mode="reduced"):
        self.mode = mode

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim != 2:
            raise TypeError("qr requires a matrix")
        m, n = x.type.shape
        if self.mode == "reduced":
            k = None if (m is None or n is None) else min(m, n)
            outs = [TensorType(x.type.dtype, (m, k))(), TensorType(x.type.dtype, (k, n))()]
        elif self.mode == "complete":
            outs = [TensorType(x.type.dtype, (m, m))(), TensorType(x.type.dtype, (m, n))()]
        elif self.mode == "r":
            k = None if (m is None or n is None) else min(m, n)
            outs = [TensorType(x.type.dtype, (k, n))()]
        else:
            raise ValueError(f"bad qr mode {self.mode}")
        return Apply(self, [x], outs)

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        res = np.linalg.qr(x, mode=self.mode)
        if self.mode == "r":
            output_storage[0][0] = np.asarray(res, dtype=x.dtype)
        else:
            output_storage[0][0] = res[0].astype(x.dtype)
            output_storage[1][0] = res[1].astype(x.dtype)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0])]


def qr(a, mode="reduced"):
    return QRFull(mode)(a)


class SVD(Op):
    """(reference ``nlinalg.py:496``)"""

    __props__ = ("full_matrices", "compute_uv")

    def __init__(self, full_matrices=True, compute_uv=True):
        self.full_matrices = bool(full_matrices)
        self.compute_uv = bool(compute_uv)

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim != 2:
            raise TypeError("svd requires a matrix")
        m, n = x.type.shape
        k = None if (m is None or n is None) else min(m, n)
        # singular values are REAL even for complex input
        s_dtype = str(np.zeros(0, dtype=x.type.dtype).real.dtype)
        s_t = TensorType(s_dtype, (k,))()
        if not self.compute_uv:
            return Apply(self, [x], [s_t])
        if self.full_matrices:
            u_t = TensorType(x.type.dtype, (m, m))()
            v_t = TensorType(x.type.dtype, (n, n))()
        else:
            u_t = TensorType(x.type.dtype, (m, k))()
            v_t = TensorType(x.type.dtype, (k, n))()
        return Apply(self, [x], [u_t, s_t, v_t])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        if self.compute_uv:
            u, s, vt = np.linalg.svd(x, full_matrices=self.full_matrices)
            output_storage[0][0] = u.astype(x.dtype)
            output_storage[1][0] = s.astype(
                _np_dtype(node.outputs[1].type.dtype))
            output_storage[2][0] = vt.astype(x.dtype)
        else:
            s = np.linalg.svd(x, compute_uv=False)
            output_storage[0][0] = s.astype(
                _np_dtype(node.outputs[0].type.dtype))

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0])]


def svd(a, full_matrices=True, compute_uv=True):
    return SVD(full_matrices, compute_uv)(a)


class Lstsq(Op):
    """(reference ``nlinalg.py:581``)"""

    __props__ = ()

    def make_node(self, x, y, rcond):
        x = as_tensor_variable(x)
        y = as_tensor_variable(y)
        rcond = as_tensor_variable(rcond)
        return Apply(
            self, [x, y, rcond],
            [
                TensorType(x.type.dtype, (x.type.shape[1],) + y.type.shape[1:])(),
                TensorType(x.type.dtype, (None,))(),
                TensorType("int64", ())(),
                TensorType(x.type.dtype, (None,))(),
            ],
        )

    def perform(self, node, inputs, output_storage):
        x, y, rcond = inputs
        sol, res, rank, sv = np.linalg.lstsq(x, y, rcond=float(rcond))
        output_storage[0][0] = sol.astype(x.dtype)
        output_storage[1][0] = res.astype(x.dtype)
        output_storage[2][0] = np.asarray(rank, dtype=np.int64)
        output_storage[3][0] = sv.astype(x.dtype)


def lstsq(x, y, rcond=-1):
    return Lstsq()(x, y, rcond)


class TensorInv(Op):
    """(reference ``nlinalg.py:689``)"""

    __props__ = ("ind",)

    def __init__(self, ind=2):
        self.ind = int(ind)

    def make_node(self, a):
        a = as_tensor_variable(a)
        return Apply(self, [a], [TensorType(a.type.dtype, (None,) * a.type.ndim)()])

    def perform(self, node, inputs, output_storage):
        (a,) = inputs
        output_storage[0][0] = np.linalg.tensorinv(a, self.ind).astype(a.dtype)


def tensorinv(a, ind=2):
    return TensorInv(ind)(a)


class TensorSolve(Op):
    """(reference ``nlinalg.py:747``)"""

    __props__ = ("axes",)

    def __init__(self, axes=None):
        self.axes = tuple(axes) if axes is not None else None

    def make_node(self, a, b):
        a = as_tensor_variable(a)
        b = as_tensor_variable(b)
        out_ndim = a.type.ndim - b.type.ndim
        return Apply(self, [a, b], [TensorType(a.type.dtype, (None,) * max(out_ndim, 1))()])

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        output_storage[0][0] = np.linalg.tensorsolve(a, b, axes=self.axes).astype(a.dtype)


def tensorsolve(a, b, axes=None):
    return TensorSolve(axes)(a, b)


# --- conveniences --------------------------------------------------------------

def trace(x):
    from aesara_tpu.tensor.math import sum as tsum

    return tsum(diagonal(as_tensor_variable(x)))


def matrix_dot(*args):
    from aesara_tpu.tensor.math import dot

    res = args[0]
    for a in args[1:]:
        res = dot(res, a)
    return res


def matrix_power(m, n: int):
    from aesara_tpu.tensor.basic import identity_like

    m = as_tensor_variable(m)
    if n < 0:
        m = matrix_inverse(m)
        n = -n
    if n == 0:
        return identity_like(m)
    result = m
    for _ in range(n - 1):
        result = matrix_dot(result, m)
    return result


def norm(x, ord=None):
    from aesara_tpu.tensor import math as tm

    x = as_tensor_variable(x)
    if x.type.ndim == 1:
        return tm.norm(x, 2 if ord is None else ord)
    if x.type.ndim == 2:
        if ord in (None, "fro"):
            sq = (tm.sqr(tm.abs(x))
                  if x.type.dtype.startswith("complex") else tm.sqr(x))
            return tm.sqrt(tm.sum(sq))
        if ord == 1:
            return tm.max(tm.sum(tm.abs(x), axis=0))
        if ord == np.inf:
            return tm.max(tm.sum(tm.abs(x), axis=1))
        if ord == -1:
            return tm.min(tm.sum(tm.abs(x), axis=0))
        if ord == -np.inf:
            return tm.min(tm.sum(tm.abs(x), axis=1))
    raise NotImplementedError(f"norm order {ord} for ndim {x.type.ndim}")
