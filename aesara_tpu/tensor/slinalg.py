"""SciPy-flavored linear algebra.

Re-design of the reference's ``aesara/tensor/slinalg.py`` (Cholesky:26,
CholeskySolve:130, SolveTriangular:280, Solve:365, Eigvalsh:446, Expm:595,
SolveContinuousLyapunov:676, BilinearSolveDiscreteLyapunov:713, kron).
perform uses scipy.linalg (oracle); XLA lowers to jax.scipy.linalg.
"""

from __future__ import annotations

import numpy as np
import scipy.linalg as spla

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.tensor.basic import as_tensor_variable
from aesara_tpu.tensor.type import TensorType


__all__ = [
    "Cholesky", "cholesky", "CholeskySolve", "cho_solve",
    "Solve", "solve", "SolveTriangular", "solve_triangular",
    "Eigvalsh", "eigvalsh", "Expm", "expm", "kron",
    "SolveContinuousLyapunov", "solve_continuous_lyapunov",
    "SolveDiscreteLyapunov", "solve_discrete_lyapunov",
]


class Cholesky(Op):
    """(reference ``slinalg.py:26``)"""

    __props__ = ("lower", "on_error")

    def __init__(self, lower=True, on_error="raise"):
        self.lower = bool(lower)
        self.on_error = on_error

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim != 2:
            raise TypeError("cholesky requires a matrix")
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        try:
            res = spla.cholesky(x, lower=self.lower)
        except spla.LinAlgError:
            if self.on_error == "nan":
                res = np.full_like(x, np.nan)
            else:
                raise
        output_storage[0][0] = res.astype(x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        # Murray (2016) cholesky backward
        (x,) = inputs
        (gz,) = output_grads
        from aesara_tpu.tensor.basic import tril, triu
        from aesara_tpu.tensor.math import dot

        chol_x = cholesky_op_cached(self.lower)(x)
        if not self.lower:
            chol_x = chol_x.T
            gz = gz.T

        def phi(m):
            return tril(m) - 0.5 * _diag_part_as_matrix(m)

        inner = phi(dot(chol_x.T, gz))
        li = solve_triangular(chol_x, _eye_like(chol_x), lower=True)
        grad_val = dot(dot(li.T, inner), li)
        # the perform reads ONLY the input's lower triangle (scipy
        # semantics), so all sensitivity lands there: off-diagonal gets
        # g + g.T, the diagonal g alone, the upper triangle zero
        lower_grad = tril(grad_val + grad_val.T) - _diag_part_as_matrix(grad_val)
        if not self.lower:
            return [lower_grad.T]
        return [lower_grad]


def _diag_part_as_matrix(m):
    from aesara_tpu.tensor.basic import AllocDiag, diagonal

    return AllocDiag(0)(diagonal(m))


def _eye_like(x):
    from aesara_tpu.tensor.basic import eye
    from aesara_tpu.tensor.shape import shape as tshape

    return eye(tshape(x)[0], tshape(x)[0], 0, dtype=x.type.dtype)


_chol_cache = {}


def cholesky_op_cached(lower):
    if lower not in _chol_cache:
        _chol_cache[lower] = Cholesky(lower=lower)
    return _chol_cache[lower]


def cholesky(x, lower=True):
    return cholesky_op_cached(lower)(x)


class SolveBase(Op):
    __props__ = ()

    def make_node(self, a, b):
        a = as_tensor_variable(a)
        b = as_tensor_variable(b)
        if a.type.ndim != 2:
            raise TypeError("A must be a matrix")
        if b.type.ndim not in (1, 2):
            raise TypeError("b must be a vector or matrix")
        return Apply(self, [a, b], [TensorType(a.type.dtype, b.type.shape)()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[1]]

    def _solve(self, a, b):
        raise NotImplementedError

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        output_storage[0][0] = np.asarray(self._solve(a, b), dtype=a.dtype)

    def L_op(self, inputs, outputs, output_grads):
        # standard solve backward: gb = A^-T gz; gA = -gb zᵀ
        a, b = inputs
        (c,) = outputs
        (gz,) = output_grads
        from aesara_tpu.tensor.math import dot, neg
        from aesara_tpu.tensor.shape import shape_padright

        b_bar = self._transpose_solve(a, gz)
        if c.type.ndim == 1:
            a_bar = neg(dot(shape_padright(b_bar, 1), shape_padright(c, 1).T))
        else:
            a_bar = neg(dot(b_bar, c.T))
        return [a_bar, b_bar]

    def _transpose_solve(self, a, g):
        return Solve()(a.T, g)


class Solve(SolveBase):
    """general solve (reference ``slinalg.py:365``)."""

    __props__ = ("assume_a", "lower")

    def __init__(self, assume_a="gen", lower=False):
        self.assume_a = assume_a
        self.lower = bool(lower)

    def _solve(self, a, b):
        # lower matters for assume_a in ("sym","her","pos"): scipy reads
        # only one triangle then (review finding: it was dropped, so a
        # matrix stored lower-only factorized the garbage upper triangle)
        return spla.solve(a, b, assume_a=self.assume_a, lower=self.lower)

    def _transpose_solve(self, a, g):
        # for the triangle-reading modes, aᵀ swaps the stored triangle
        return Solve(self.assume_a, not self.lower)(a.T, g)


def solve(a, b, assume_a="gen", lower=False):
    return Solve(assume_a, lower)(a, b)


class SolveTriangular(SolveBase):
    """(reference ``slinalg.py:280``)"""

    __props__ = ("lower", "trans", "unit_diagonal")

    def __init__(self, lower=True, trans=0, unit_diagonal=False):
        self.lower = bool(lower)
        self.trans = trans
        self.unit_diagonal = bool(unit_diagonal)

    def _solve(self, a, b):
        return spla.solve_triangular(
            a, b, lower=self.lower, trans=self.trans,
            unit_diagonal=self.unit_diagonal,
        )

    def _transpose_solve(self, a, g):
        return SolveTriangular(not self.lower, self.trans, self.unit_diagonal)(a.T, g)

    def L_op(self, inputs, outputs, output_grads):
        res = super().L_op(inputs, outputs, output_grads)
        from aesara_tpu.tensor.basic import tril, triu

        a_bar = tril(res[0]) if self.lower else triu(res[0])
        return [a_bar, res[1]]


def solve_triangular(a, b, lower=True, trans=0, unit_diagonal=False):
    return SolveTriangular(lower, trans, unit_diagonal)(a, b)


class CholeskySolve(SolveBase):
    """(reference ``slinalg.py:130``)"""

    __props__ = ("lower",)

    def __init__(self, lower=True):
        self.lower = bool(lower)

    def _solve(self, c, b):
        return spla.cho_solve((c, self.lower), b)

    def L_op(self, inputs, outputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, 0, inputs[0]),
                CholeskySolve(self.lower)(inputs[0], output_grads[0])]


def cho_solve(c_and_lower, b):
    c, lower = c_and_lower if isinstance(c_and_lower, tuple) else (c_and_lower, True)
    return CholeskySolve(lower)(c, b)


class Eigvalsh(Op):
    """(reference ``slinalg.py:446``)"""

    __props__ = ("lower",)

    def __init__(self, lower=True):
        self.lower = bool(lower)

    def make_node(self, a, b=None):
        a = as_tensor_variable(a)
        inputs = [a]
        if b is not None:
            inputs.append(as_tensor_variable(b))
        return Apply(self, inputs, [TensorType(a.type.dtype, (a.type.shape[0],))()])

    def perform(self, node, inputs, output_storage):
        res = spla.eigvalsh(*inputs, lower=self.lower)
        output_storage[0][0] = res.astype(inputs[0].dtype)

    def grad(self, inputs, output_grads):
        from aesara_tpu.tensor.nlinalg import eigh
        from aesara_tpu.tensor.math import dot, mul
        from aesara_tpu.tensor.shape import shape_padleft

        if len(inputs) > 1:
            from aesara_tpu.gradient import grad_not_implemented

            return [grad_not_implemented(self, i, inp) for i, inp in enumerate(inputs)]
        (a,) = inputs
        (gw,) = output_grads
        w, v = eigh(a, "L" if self.lower else "U")
        g = dot(mul(v, shape_padleft(gw, 1)), v.T)
        # fold into the triangle eigvalsh actually reads (review finding
        # — same defect as Eigh.grad)
        from aesara_tpu.tensor.basic import AllocDiag, ExtractDiag, tril, triu

        diag_part = AllocDiag(0)(ExtractDiag(0, 0, 1)(g))
        folded = (tril(g + g.T) if self.lower else triu(g + g.T)) - diag_part
        return [folded]


def eigvalsh(a, b=None, lower=True):
    if b is None:
        return Eigvalsh(lower)(a)
    return Eigvalsh(lower)(a, b)


class Expm(Op):
    """matrix exponential (reference ``slinalg.py:595``)."""

    __props__ = ()

    def make_node(self, x):
        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = spla.expm(x).astype(x.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        # VJP via the block-matrix Fréchet identity (reference implements
        # this as an eig-based ExpmGrad C op, slinalg.py:631; the block
        # form is the TPU-first formulation — it reuses expm itself, so
        # it lowers and re-differentiates wherever expm does):
        #   expm([[Aᵀ, G], [0, Aᵀ]]) = [[e^{Aᵀ}, L(Aᵀ)(G)], [0, e^{Aᵀ}]]
        # and VJP_expm(A)[G] = L(Aᵀ)(G).
        from aesara_tpu.tensor.basic import join, zeros_like

        (A,) = inputs
        (gz,) = output_grads
        n = A.shape[0]
        Z = zeros_like(A)
        blk = join(0, join(1, A.T, gz), join(1, Z, A.T))
        return [Expm()(blk)[:n, n:]]


expm = Expm()


class SolveContinuousLyapunov(Op):
    """AX + XA^H = Q (reference ``slinalg.py:676``)."""

    __props__ = ()

    def make_node(self, a, q):
        a = as_tensor_variable(a)
        q = as_tensor_variable(q)
        return Apply(self, [a, q], [a.type()])

    def perform(self, node, inputs, output_storage):
        a, q = inputs
        output_storage[0][0] = spla.solve_continuous_lyapunov(a, q).astype(a.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]


def solve_continuous_lyapunov(a, q):
    return SolveContinuousLyapunov()(a, q)


class SolveDiscreteLyapunov(Op):
    """AXA^H - X + Q = 0 (reference ``slinalg.py:713``)."""

    __props__ = ("method",)

    def __init__(self, method="direct"):
        self.method = method

    def make_node(self, a, q):
        a = as_tensor_variable(a)
        q = as_tensor_variable(q)
        return Apply(self, [a, q], [a.type()])

    def perform(self, node, inputs, output_storage):
        a, q = inputs
        output_storage[0][0] = spla.solve_discrete_lyapunov(
            a, q, method=self.method
        ).astype(a.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]


def solve_discrete_lyapunov(a, q, method="direct"):
    return SolveDiscreteLyapunov(method)(a, q)


def kron(a, b):
    """Kronecker product via reshape+broadcast (reference ``slinalg.py``)."""
    from aesara_tpu.tensor.shape import reshape, shape_tuple
    from aesara_tpu.tensor.math import mul

    a = as_tensor_variable(a)
    b = as_tensor_variable(b)
    if a.type.ndim != 2 or b.type.ndim != 2:
        raise TypeError("kron requires matrices")
    sa = shape_tuple(a)
    sb = shape_tuple(b)
    out = a.dimshuffle(0, "x", 1, "x") * b.dimshuffle("x", 0, "x", 1)
    return reshape(out, [sa[0] * sb[0], sa[1] * sb[1]], ndim=2)
