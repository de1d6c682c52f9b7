"""Sparse rewrite pack (reference ``aesara/sparse/rewriting.py``, 2,064
LoC).

The reference's bulk selects gen-C structured-dot kernels per
format/dtype — that role is subsumed by the single BCOO lowering
(``link/jax/sparse_dispatch.py``).  What survives, re-designed for the
one-XLA-program execution model, are the STRUCTURAL rewrites: roundtrip
elimination, construct/deconstruct folding, densified-dot →
``StructuredDot`` specialization (so sparse graphs actually ride
``bcoo_dot_general`` instead of materializing), and the ``Usmm`` gemm
fusion (reference ``local_usmm``).
"""

from __future__ import annotations

import numpy as np

from aesara_tpu import scalar as aes
from aesara_tpu.compile.mode import register_canonicalize, register_specialize
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.sparse.basic import (
    CSM,
    CSMProperties,
    Cast,
    DenseFromSparse,
    Diag,
    Dot,
    EnsureSortedIndices,
    Neg,
    SparseFromDense,
    SparseTensorType,
    SquareDiagonal,
    StructuredDot,
    Transpose,
    Usmm,
    structured_dot,
)
from aesara_tpu.tensor.elemwise import Elemwise


def _keep(out, res):
    conv = out.type.convert_variable(res)
    if conv is not None:
        copy_stack_trace(out, conv)
    return conv


@node_rewriter([DenseFromSparse])
def local_dense_from_sparse_roundtrip(fgraph, node):
    """DenseFromSparse(SparseFromDense(x)) → x"""
    inner = node.inputs[0]
    if inner.owner is not None and isinstance(inner.owner.op, SparseFromDense):
        res = _keep(node.outputs[0], inner.owner.inputs[0])
        return [res] if res is not None else False
    return False


register_canonicalize(local_dense_from_sparse_roundtrip,
                      name="local_dense_from_sparse_roundtrip")


@node_rewriter([SparseFromDense])
def local_sparse_from_dense_roundtrip(fgraph, node):
    """SparseFromDense(DenseFromSparse(x)) → x when the format matches
    (densify-then-resparsify is a no-op on the values)."""
    inner = node.inputs[0]
    if inner.owner is None or not isinstance(inner.owner.op, DenseFromSparse):
        return False
    x = inner.owner.inputs[0]
    if x.type.format != node.op.format:
        return False
    res = _keep(node.outputs[0], x)
    return [res] if res is not None else False


register_canonicalize(local_sparse_from_dense_roundtrip)


@node_rewriter([CSMProperties])
def local_csm_properties_csm(fgraph, node):
    """CSMProperties(CSM(data, indices, indptr, shape)) → the four parts
    directly (reference local_csm_properties_csm)."""
    inner = node.inputs[0]
    if inner.owner is None or not isinstance(inner.owner.op, CSM):
        return False
    parts = inner.owner.inputs
    out = []
    for o, p in zip(node.outputs, parts):
        conv = o.type.convert_variable(p)
        if conv is None:
            return False
        copy_stack_trace(o, conv)
        out.append(conv)
    return out


register_canonicalize(local_csm_properties_csm)


@node_rewriter([CSM])
def local_csm_of_csm_properties(fgraph, node):
    """CSM(*CSMProperties(x)) → x when all four parts come from the same
    deconstruction and the format matches."""
    owners = [i.owner for i in node.inputs]
    if any(o is None or not isinstance(o.op, CSMProperties) for o in owners):
        return False
    src = owners[0]
    if any(o is not src for o in owners[1:]):
        return False
    # parts must be used in (data, indices, indptr, shape) order
    if any(node.inputs[k] is not src.outputs[k] for k in range(4)):
        return False
    x = src.inputs[0]
    if x.type.format != node.op.format:
        return False
    res = _keep(node.outputs[0], x)
    return [res] if res is not None else False


register_canonicalize(local_csm_of_csm_properties)


@node_rewriter([Dot])
def local_dot_to_structured_dot(fgraph, node):
    """sparse.Dot(sparse, dense) → StructuredDot — rides the MXU-side
    bcoo_dot_general instead of the densifying fallback (reference
    local_structured_dot)."""
    a, b = node.inputs
    a_sp = isinstance(a.type, SparseTensorType)
    b_sp = isinstance(b.type, SparseTensorType)
    if a_sp == b_sp:  # sparse@sparse or dense@dense: leave alone
        return False
    if b.type.ndim not in (1, 2):
        return False
    res = structured_dot(a, b)
    res = _keep(node.outputs[0], res)
    return [res] if res is not None else False


register_specialize(local_dot_to_structured_dot)


from aesara_tpu.tensor.math import Dot as _TensorDot


@node_rewriter([_TensorDot])
def local_dense_dot_of_dense_from_sparse(fgraph, node):
    """tensor dot(DenseFromSparse(x), y) → StructuredDot(x, y) — never
    materialize the sparse operand just to multiply (reference
    local_structured_dot's dense-graph entry point)."""
    a, b = node.inputs
    new_a, new_b = a, b
    hit = False
    if a.owner is not None and isinstance(a.owner.op, DenseFromSparse):
        new_a = a.owner.inputs[0]
        hit = True
    if b.owner is not None and isinstance(b.owner.op, DenseFromSparse):
        new_b = b.owner.inputs[0]
        hit = True
    if not hit:
        return False
    if isinstance(new_a.type, SparseTensorType) and isinstance(
        new_b.type, SparseTensorType
    ):
        # keep one side dense: StructuredDot needs a dense rhs
        new_b = b
    res = structured_dot(new_a, new_b)
    res = _keep(node.outputs[0], res)
    return [res] if res is not None else False


register_specialize(local_dense_dot_of_dense_from_sparse)


def _scalar_const(v):
    from aesara_tpu.tensor.basic import (
        NotScalarConstantError,
        get_scalar_constant_value,
    )

    try:
        return get_scalar_constant_value(v, only_process_constants=True)
    except NotScalarConstantError:
        return None


@node_rewriter([Elemwise])
def local_usmm(fgraph, node):
    """add(z, [alpha *] sparse_dot(x, y)) → Usmm(alpha, x, y, z) — the
    sparse gemm fusion (reference local_usmm)."""
    if not isinstance(node.op.scalar_op, aes.ops.Add) or len(node.inputs) != 2:
        return False

    def decompose(v):
        """Return (alpha, x, y) if v is [alpha *] sparse-dot, else None."""
        n = v.owner
        if n is None or len(fgraph.clients.get(v, [])) > 1:
            return None
        if isinstance(n.op, (Dot, StructuredDot)):
            return (None, n.inputs[0], n.inputs[1])
        if isinstance(n.op, Elemwise) and isinstance(
            n.op.scalar_op, aes.ops.Mul
        ) and len(n.inputs) == 2:
            for i, j in ((0, 1), (1, 0)):
                alpha = n.inputs[i]
                dot_var = n.inputs[j]
                if (
                    all(s == 1 for s in alpha.type.shape)
                    and dot_var.owner is not None
                    and isinstance(dot_var.owner.op, (Dot, StructuredDot))
                    and len(fgraph.clients.get(dot_var, [])) == 1
                ):
                    dn = dot_var.owner
                    return (alpha, dn.inputs[0], dn.inputs[1])
        return None

    for i, j in ((0, 1), (1, 0)):
        dec = decompose(node.inputs[i])
        if dec is None:
            continue
        alpha, x, y = dec
        if not (
            isinstance(x.type, SparseTensorType)
            or isinstance(y.type, SparseTensorType)
        ):
            continue
        z = node.inputs[j]
        if isinstance(z.type, SparseTensorType):
            continue
        if alpha is None:
            from aesara_tpu.tensor.basic import constant

            alpha = constant(np.asarray(1, dtype=node.outputs[0].type.dtype))
        elif alpha.type.ndim:
            alpha = alpha.dimshuffle(())
        res = Usmm()(alpha, x, y, z)
        res = _keep(node.outputs[0], res)
        if res is None:
            continue
        return [res]
    return False


register_specialize(local_usmm)


@node_rewriter([Neg])
def local_sparse_neg_neg(fgraph, node):
    """Neg(Neg(x)) → x"""
    inner = node.inputs[0]
    if inner.owner is not None and isinstance(inner.owner.op, Neg):
        res = _keep(node.outputs[0], inner.owner.inputs[0])
        return [res] if res is not None else False
    return False


register_canonicalize(local_sparse_neg_neg)


@node_rewriter([Transpose])
def local_sparse_transpose_transpose(fgraph, node):
    """Transpose(Transpose(x)) → x"""
    inner = node.inputs[0]
    if inner.owner is not None and isinstance(inner.owner.op, Transpose):
        res = _keep(node.outputs[0], inner.owner.inputs[0])
        return [res] if res is not None else False
    return False


register_canonicalize(local_sparse_transpose_transpose)


@node_rewriter([Cast])
def local_sparse_cast_cast(fgraph, node):
    """Cast(Cast(x)) → one Cast ; Cast to the same dtype → x"""
    (x,) = node.inputs
    out = node.outputs[0]
    if x.type.dtype == node.op.out_type:
        res = _keep(out, x)
        return [res] if res is not None else False
    inner = x.owner
    if inner is not None and isinstance(inner.op, Cast):
        base = inner.inputs[0]
        # merging through the intermediate is only valid when that cast
        # was lossless (widening) — a narrowing cast truncates values
        # (regression class pinned in df62646 for dense cast-merge)
        if not np.can_cast(base.type.dtype, x.type.dtype, casting="safe"):
            return False
        res = base if base.type.dtype == node.op.out_type else Cast(
            node.op.out_type
        )(base)
        res = _keep(out, res)
        return [res] if res is not None else False
    return False


register_canonicalize(local_sparse_cast_cast)


@node_rewriter([EnsureSortedIndices])
def local_ensure_sorted_indices_idempotent(fgraph, node):
    """EnsureSortedIndices(EnsureSortedIndices(x)) → one application
    (reference's ensure-sorted cleanup)."""
    inner = node.inputs[0]
    if inner.owner is not None and isinstance(
        inner.owner.op, EnsureSortedIndices
    ):
        res = _keep(node.outputs[0], inner)
        return [res] if res is not None else False
    return False


register_canonicalize(local_ensure_sorted_indices_idempotent)


@node_rewriter([Diag])
def local_diag_of_square_diagonal(fgraph, node):
    """Diag(SquareDiagonal(v)) → v"""
    inner = node.inputs[0]
    if inner.owner is not None and isinstance(inner.owner.op, SquareDiagonal):
        res = _keep(node.outputs[0], inner.owner.inputs[0])
        return [res] if res is not None else False
    return False


register_canonicalize(local_diag_of_square_diagonal)


@node_rewriter([DenseFromSparse])
def local_dense_from_sparse_of_square_diagonal(fgraph, node):
    """DenseFromSparse(SquareDiagonal(v)) → alloc_diag(v) — build the
    dense diagonal directly, skipping the sparse container."""
    inner = node.inputs[0]
    if inner.owner is None or not isinstance(inner.owner.op, SquareDiagonal):
        return False
    from aesara_tpu.tensor.basic import AllocDiag

    res = AllocDiag()(inner.owner.inputs[0])
    res = _keep(node.outputs[0], res)
    return [res] if res is not None else False


register_specialize(local_dense_from_sparse_of_square_diagonal)


# ---------------------------------------------------------------------------
# dense-graph entry points for the sparse elemwise specializations
# (reference local_mul_s_d / local_mul_s_v / local_addsd /
# local_sampling_dot_csr): when a densified sparse operand meets an
# elemwise mul/add, push the computation back into the sparse domain so
# only nnz-sized work rides the device.
# ---------------------------------------------------------------------------

def _densified(v, fgraph, require_single_client=True):
    """The sparse variable behind DenseFromSparse(v), else None."""
    n = v.owner
    if n is None or not isinstance(n.op, DenseFromSparse):
        return None
    if require_single_client and len(fgraph.clients.get(v, ())) != 1:
        return None  # the dense form is needed anyway: no win
    return n.inputs[0]


@node_rewriter([Elemwise])
def local_mul_dense_from_sparse(fgraph, node):
    """mul(DenseFromSparse(s), d) → DenseFromSparse(MulSD/MulSV/MulSS)."""
    from aesara_tpu.sparse.basic import MulSD, MulSS, MulSV, dense_from_sparse
    from aesara_tpu.tensor.elemwise import DimShuffle

    if not isinstance(node.op.scalar_op, aes.ops.Mul) or len(node.inputs) != 2:
        return False
    out = node.outputs[0]
    for i, j in ((0, 1), (1, 0)):
        s = _densified(node.inputs[i], fgraph)
        if s is None:
            continue
        other = node.inputs[j]
        s2 = _densified(other, fgraph)
        if s2 is not None:
            res = dense_from_sparse(MulSS()(s, s2))
        else:
            on = other.owner
            if (
                on is not None
                and isinstance(on.op, DimShuffle)
                and tuple(on.op.new_order) == ("x", 0)
            ):
                # row-vector broadcast: pattern-preserving column scale
                res = dense_from_sparse(MulSV()(s, on.inputs[0]))
            elif other.type.ndim == 2 and all(
                sh != 1 for sh in other.type.shape if sh is not None
            ):
                samp = _sampling_dot_operands(other, fgraph)
                if samp is not None:
                    # mul(DFS(p), dot(x, yT)): never materialize the full
                    # (M,N) product — sample it at p's pattern
                    from aesara_tpu.sparse.basic import SamplingDot

                    x, y = samp
                    res = dense_from_sparse(SamplingDot()(x, y, s))
                else:
                    res = dense_from_sparse(MulSD()(s, other))
            else:
                continue
        res = _keep(out, res)
        if res is not None:
            return [res]
    return False


def _sampling_dot_operands(d, fgraph):
    """(x, y) when d = dot(x, y.T) consumed only here, else None."""
    from aesara_tpu.tensor.elemwise import DimShuffle
    from aesara_tpu.tensor.math import Dot as TDot

    dn = d.owner
    if (
        dn is None
        or not isinstance(dn.op, TDot)
        or len(fgraph.clients.get(d, ())) != 1
    ):
        return None
    x, yt = dn.inputs
    if x.type.ndim != 2 or yt.type.ndim != 2:
        return None
    ytn = yt.owner
    if not (
        ytn is not None
        and isinstance(ytn.op, DimShuffle)
        and tuple(ytn.op.new_order) == (1, 0)
    ):
        return None
    return x, ytn.inputs[0]


register_specialize(local_mul_dense_from_sparse)


@node_rewriter([Elemwise])
def local_add_dense_from_sparse(fgraph, node):
    """add(DenseFromSparse(s), d) → AddSD(s, d); both-sparse → AddSS."""
    from aesara_tpu.sparse.basic import AddSD, AddSS, dense_from_sparse

    if not isinstance(node.op.scalar_op, aes.ops.Add) or len(node.inputs) != 2:
        return False
    out = node.outputs[0]
    for i, j in ((0, 1), (1, 0)):
        s = _densified(node.inputs[i], fgraph)
        if s is None:
            continue
        other = node.inputs[j]
        s2 = _densified(other, fgraph)
        if s2 is not None:
            res = dense_from_sparse(AddSS()(s, s2))
        elif other.type.ndim == 2 and all(
            sh != 1 for sh in other.type.shape if sh is not None
        ):
            res = AddSD()(s, other)
        else:
            continue
        res = _keep(out, res)
        if res is not None:
            return [res]
    return False


register_specialize(local_add_dense_from_sparse)


@node_rewriter([Elemwise])
def local_sampling_dot(fgraph, node):
    """mul(DenseFromSparse(p), dot(x, yᵀ)) → SamplingDot(x, y, p): never
    materialize the full (M,N) product when only p's nonzero positions
    are kept (reference local_sampling_dot_csr).  The pattern match is
    shared with local_mul_dense_from_sparse via
    ``_sampling_dot_operands`` (single source of truth)."""
    from aesara_tpu.sparse.basic import SamplingDot, dense_from_sparse

    if not isinstance(node.op.scalar_op, aes.ops.Mul) or len(node.inputs) != 2:
        return False
    out = node.outputs[0]
    for i, j in ((0, 1), (1, 0)):
        p = _densified(node.inputs[i], fgraph)
        if p is None:
            continue
        samp = _sampling_dot_operands(node.inputs[j], fgraph)
        if samp is None:
            continue
        x, y = samp
        res = _keep(out, dense_from_sparse(SamplingDot()(x, y, p)))
        if res is not None:
            return [res]
    return False


register_specialize(local_sampling_dot)


@node_rewriter([Elemwise])
def local_sparse_add_cancel(fgraph, node):
    """add(DFS(s), DFS(neg(s))) → zeros: the dense-side canonizer cannot
    see through DenseFromSparse, so the sparse pack cancels it here."""
    from aesara_tpu.sparse.basic import Neg as SNeg

    if not isinstance(node.op.scalar_op, aes.ops.Add) or len(node.inputs) != 2:
        return False
    a = _densified(node.inputs[0], fgraph, require_single_client=False)
    b = _densified(node.inputs[1], fgraph, require_single_client=False)
    if a is None or b is None:
        return False
    for s, t in ((a, b), (b, a)):
        tn = t.owner
        if tn is not None and isinstance(tn.op, SNeg) and tn.inputs[0] is s:
            from aesara_tpu.tensor.basic import zeros

            out = node.outputs[0]
            # shape must come from an INPUT (the densified operand), not
            # from `out` itself — a self-referencing shape would keep the
            # replaced add alive and re-trigger the rewrite forever
            src = node.inputs[0]
            shp = tuple(
                dim if dim is not None else src.shape[k]
                for k, dim in enumerate(out.type.shape)
            )
            res = _keep(out, zeros(shp, dtype=out.type.dtype))
            if res is not None:
                return [res]
    return False


register_canonicalize(local_sparse_add_cancel)
