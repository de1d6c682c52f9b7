"""Linear-algebra rewrites (reference ``aesara/sandbox/linalg/ops.py``
— promoted here to a first-class pack, as the reference's own TODO
suggests).  Uses the tag-hint protocol: setting ``x.tag.symmetric``,
``x.tag.psd`` or ``x.tag.positive = True`` unlocks the corresponding
structure-exploiting forms.

On TPU the wins are real: ``inv(A)·b → solve(A, b)`` halves the flops
and avoids the explicit inverse's conditioning loss;
``solve(cholesky(A), b) → solve_triangular`` replaces an LU
factorization with a triangular substitution that maps directly onto
``jax.scipy.linalg.solve_triangular``.
"""

from __future__ import annotations

from aesara_tpu.compile.mode import (
    register_canonicalize,
    register_specialize,
    register_stabilize,
)
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.tensor import math as tm
from aesara_tpu.tensor.elemwise import DimShuffle, Elemwise
from aesara_tpu.tensor.math import Dot, Prod
from aesara_tpu.tensor.nlinalg import Det, MatrixInverse
from aesara_tpu.tensor.slinalg import (
    Cholesky,
    Solve,
    SolveTriangular,
    cholesky,
    solve,
    solve_triangular,
)

__all__ = [
    "transinv_to_invtrans",
    "inv_as_solve",
    "tag_solve_triangular",
    "no_transpose_symmetric",
    "psd_solve_with_chol",
    "local_det_chol",
    "local_log_prod_sqr",
]


def _is_transpose(node):
    return (
        isinstance(node.op, DimShuffle) and node.op.new_order == (1, 0)
    )


@node_rewriter([DimShuffle])
def transinv_to_invtrans(fgraph, node):
    """inv(X).T → inv(X.T) (reference ``transinv_to_invtrans``)."""
    if not _is_transpose(node):
        return False
    (A,) = node.inputs
    if A.owner is None or not isinstance(A.owner.op, MatrixInverse):
        return False
    (X,) = A.owner.inputs
    res = A.owner.op(node.op(X))
    copy_stack_trace(node.outputs[0], res)
    return [res]


register_canonicalize(transinv_to_invtrans)


@node_rewriter([Dot])
def inv_as_solve(fgraph, node):
    """``dot(inv(A), b) → solve(A, b)`` and ``dot(l, inv(X)) →
    solve(X.T, l.T).T`` (reference ``inv_as_solve``) — never
    materialize the inverse just to apply it."""
    l, r = node.inputs
    if l.owner and isinstance(l.owner.op, MatrixInverse):
        res = solve(l.owner.inputs[0], r)
    elif r.owner and isinstance(r.owner.op, MatrixInverse):
        x = r.owner.inputs[0]
        if getattr(x.tag, "symmetric", None) is True:
            res = solve(x, l.T).T
        else:
            res = solve(x.T, l.T).T
    else:
        return False
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_stabilize(inv_as_solve)


@node_rewriter([Solve])
def tag_solve_triangular(fgraph, node):
    """solve(L, b) where L = cholesky(X) → triangular solve (reference
    ``tag_solve_triangular``; our version targets SolveTriangular
    directly — it lowers to one ``jax.scipy.linalg.solve_triangular``)."""
    if node.op.assume_a != "gen":
        return False
    A, b = node.inputs
    if A.owner and isinstance(A.owner.op, Cholesky):
        res = solve_triangular(A, b, lower=A.owner.op.lower)
    elif (
        A.owner
        and _is_transpose(A.owner)
        and A.owner.inputs[0].owner
        and isinstance(A.owner.inputs[0].owner.op, Cholesky)
    ):
        res = solve_triangular(
            A, b, lower=not A.owner.inputs[0].owner.op.lower
        )
    else:
        return False
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(tag_solve_triangular)
register_stabilize(tag_solve_triangular)


@node_rewriter([DimShuffle])
def no_transpose_symmetric(fgraph, node):
    """X.T → X when ``X.tag.symmetric`` (reference
    ``no_transpose_symmetric``)."""
    if not _is_transpose(node):
        return False
    x = node.inputs[0]
    if x.type.ndim == 2 and getattr(x.tag, "symmetric", None) is True:
        return [x]
    return False


register_canonicalize(no_transpose_symmetric)
register_stabilize(no_transpose_symmetric)
register_specialize(no_transpose_symmetric)


@node_rewriter([Solve])
def psd_solve_with_chol(fgraph, node):
    """solve(A, b) with ``A.tag.psd`` → two triangular solves through
    cholesky(A) (reference ``psd_solve_with_chol``)."""
    A, b = node.inputs
    if getattr(A.tag, "psd", None) is not True:
        return False
    L = cholesky(A)
    Li_b = solve_triangular(L, b, lower=True)
    res = solve_triangular(L.T, Li_b, lower=False)
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_stabilize(psd_solve_with_chol)


@node_rewriter([Det])
def local_det_chol(fgraph, node):
    """det(X) with an L = cholesky(X) already in the graph →
    prod(diag(L)²) — reuse the factorization (reference
    ``local_det_chol``)."""
    from aesara_tpu.tensor.basic import extract_diag

    (x,) = node.inputs
    for cl, _pos in fgraph.clients.get(x, ()):
        if cl != "output" and isinstance(cl.op, Cholesky):
            L = cl.outputs[0]
            res = tm.prod(extract_diag(L) ** 2)
            conv = node.outputs[0].type.convert_variable(res)
            if conv is None:
                return False
            copy_stack_trace(node.outputs[0], conv)
            return [conv]
    return False


register_stabilize(local_det_chol)
register_specialize(local_det_chol)


@node_rewriter([Elemwise])
def local_log_prod_sqr(fgraph, node):
    """log(prod(p)) with ``p.tag.positive`` → sum(log(p)) (reference
    ``local_log_prod_sqr``) — avoids prod overflow/underflow."""
    import aesara_tpu.scalar as aes

    if not isinstance(node.op.scalar_op, aes.ops.Log):
        return False
    (x,) = node.inputs
    if x.owner is None or not isinstance(x.owner.op, Prod):
        return False
    p = x.owner.inputs[0]
    if getattr(p.tag, "positive", None) is not True:
        return False
    res = tm.sum(tm.log(p), axis=x.owner.op.axis)
    conv = node.outputs[0].type.convert_variable(res)
    if conv is None:
        return False
    copy_stack_trace(node.outputs[0], conv)
    return [conv]


register_canonicalize(local_log_prod_sqr)
register_stabilize(local_log_prod_sqr)
register_specialize(local_log_prod_sqr)
