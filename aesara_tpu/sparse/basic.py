"""Sparse ops (reference ``aesara/sparse/basic.py``, 56 op classes; the
load-bearing subset: CSM/CSMProperties construct/deconstruct, dense↔sparse
casts, StructuredDot, true Dot, SamplingDot, Usmm, Add/Mul families,
Transpose, Neg, structured reductions — with SciPy perform oracles and
structured gradients).

TPU path: ``structured_dot`` lowers to BCOO ``bcoo_dot_general``
(jax.experimental.sparse) — the segment-sum formulation SURVEY §2.6 calls
for; sparse VALUES cross the boundary as (data, indices, indptr) dense
parts (CSM), since XLA has no native CSR buffers.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from aesara_tpu.graph.ir import Apply, Constant, Variable
from aesara_tpu.graph.op import Op
from aesara_tpu.sparse.type import SparseTensorType
from aesara_tpu.tensor.basic import as_tensor_variable, cast
from aesara_tpu.tensor.type import TensorType
from aesara_tpu.tensor.var import TensorVariable
from aesara_tpu.scalar.ops import upcast


__all__ = [
    "SparseVariable", "SparseConstant", "as_sparse_variable", "as_sparse_or_tensor_variable",
    "matrix", "csr_matrix", "csc_matrix", "constant",
    "CSM", "CSMProperties", "csm_properties", "csm_data", "csm_indices", "csm_indptr",
    "CSR", "CSC", "SparseFromDense", "DenseFromSparse", "csr_from_dense",
    "csc_from_dense", "dense_from_sparse",
    "StructuredDot", "structured_dot", "Dot", "dot", "true_dot",
    "SamplingDot", "sampling_dot", "Usmm", "usmm",
    "AddSS", "AddSD", "add", "sub", "MulSS", "MulSD", "mul",
    "Neg", "neg", "Transpose", "transpose", "SpSum", "sp_sum",
    "sp_ones_like", "sp_zeros_like", "sparse_shared",
]


class SparseVariable(TensorVariable):
    def toarray(self):
        return dense_from_sparse(self)

    @property
    def format(self):
        return self.type.format


class SparseConstant(SparseVariable, Constant):
    def signature(self):
        # values AND structure must participate: two matrices holding the
        # same values at different positions are different constants
        # (review finding: merge unified them)
        import hashlib

        d = self.data
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(d.data).tobytes())
        h.update(np.ascontiguousarray(d.indices).tobytes())
        h.update(np.ascontiguousarray(d.indptr).tobytes())
        return (self.type, d.shape, d.nnz, h.hexdigest())


SparseTensorType.variable_type = SparseVariable
SparseTensorType.constant_type = SparseConstant


def matrix(format, name=None, dtype=None):
    from aesara_tpu.config import config

    return SparseTensorType(format, dtype or config.floatX)(name)


def csr_matrix(name=None, dtype=None):
    return matrix("csr", name, dtype)


def csc_matrix(name=None, dtype=None):
    return matrix("csc", name, dtype)


def constant(x, name=None):
    if not sp.issparse(x):
        raise TypeError("sparse.constant needs a scipy sparse matrix")
    fmt = x.format if x.format in ("csr", "csc") else "csr"
    x = x.asformat(fmt)
    return SparseConstant(
        SparseTensorType(fmt, x.dtype.name, x.shape), x, name=name
    )


def as_sparse_variable(x, name=None):
    if isinstance(x, Variable):
        if not isinstance(x.type, SparseTensorType):
            raise TypeError(f"{x} is not sparse")
        return x
    return constant(x, name)


as_sparse = as_sparse_variable


def as_sparse_or_tensor_variable(x, name=None):
    try:
        return as_sparse_variable(x, name)
    except TypeError:
        return as_tensor_variable(x, name)


def sparse_shared(value, name=None, format=None, **kwargs):
    """Shared variable holding a scipy sparse matrix."""
    from aesara_tpu.compile.sharedvalue import SharedVariable

    fmt = format or value.format
    stype = SparseTensorType(fmt, value.dtype.name)
    return SharedVariable(stype, value.asformat(fmt), name=name)


# ---------------------------------------------------------------------------
# construct / deconstruct (reference CSM / CSMProperties)
# ---------------------------------------------------------------------------

class CSM(Op):
    """(data, indices, indptr, shape) → sparse matrix."""

    __props__ = ("format",)

    def __init__(self, format: str):
        self.format = format

    def make_node(self, data, indices, indptr, shape):
        data = as_tensor_variable(data)
        indices = cast(as_tensor_variable(indices), "int32")
        indptr = cast(as_tensor_variable(indptr), "int32")
        shape = cast(as_tensor_variable(shape), "int32")
        return Apply(
            self, [data, indices, indptr, shape],
            [SparseTensorType(self.format, data.type.dtype)()],
        )

    def perform(self, node, inputs, output_storage):
        data, indices, indptr, shape = inputs
        cls = sp.csr_matrix if self.format == "csr" else sp.csc_matrix
        output_storage[0][0] = cls(
            (data, indices.astype(np.int64), indptr.astype(np.int64)),
            shape=tuple(int(s) for s in shape),
        )

    def connection_pattern(self, node):
        return [[True], [False], [False], [False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        data, indices, indptr, shape = inputs
        (gz,) = output_grads
        # gz may have a DIFFERENT sparsity pattern (e.g. a union pattern
        # from sparse addition): gather its entries at THIS op's
        # positions, in this op's storage order (reference CSMGrad;
        # review finding: raw csm_data(gz) misaligned/mis-sized)
        g_data = CSMGrad(self.format)(indices, indptr, shape, gz)
        return [g_data, DisconnectedType()(), DisconnectedType()(),
                DisconnectedType()()]


class CSMGrad(Op):
    """Gather gz[row_k, col_k] for every position k of a CSM's pattern
    (reference ``sparse/basic.py`` CSMGrad)."""

    __props__ = ("format",)

    def __init__(self, format):
        self.format = format

    def make_node(self, indices, indptr, shape, gz):
        indices = as_tensor_variable(indices)
        indptr = as_tensor_variable(indptr)
        shape = as_tensor_variable(shape)
        gz = as_sparse_variable(gz)
        return Apply(
            self, [indices, indptr, shape, gz],
            [TensorType(gz.type.dtype, (None,))()],
        )

    def perform(self, node, inputs, output_storage):
        indices, indptr, shape, gz = inputs
        indices = np.asarray(indices, dtype=np.int64)
        indptr = np.asarray(indptr, dtype=np.int64)
        # expand indptr into the major-axis coordinate per entry
        major = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
        gz = gz.tocsr() if self.format == "csr" else gz.tocsc()
        if self.format == "csr":
            rows, cols = major, indices
        else:
            rows, cols = indices, major
        vals = np.asarray(gz.tocsr()[rows, cols]).ravel()
        output_storage[0][0] = vals.astype(node.outputs[0].type.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]


class ConstructSparseFromList(Op):
    """Scatter dense rows into a sparse matrix: out[ilist[k], :] +=
    values[k, :] with x supplying the shape (reference
    ``sparse/basic.py construct_sparse_from_list`` — the sparse gradient
    of row gathering)."""

    __props__ = ()

    def make_node(self, x, values, ilist):
        x = as_tensor_variable(x)
        values = as_tensor_variable(values)
        ilist = as_tensor_variable(ilist)
        if x.type.ndim != 2 or values.type.ndim != 2:
            raise TypeError("ConstructSparseFromList needs matrices")
        if ilist.type.ndim != 1:
            raise TypeError("index list must be a vector")
        return Apply(
            self, [x, values, ilist],
            [SparseTensorType("csr", values.type.dtype)()],
        )

    def perform(self, node, inputs, output_storage):
        x, values, ilist = inputs
        rows = np.asarray(ilist, dtype=np.int64)
        n_rows = x.shape[0]
        indptr = np.zeros(len(rows) + 1, dtype=np.int64)
        indptr[1:] = x.shape[1]
        np.cumsum(indptr, out=indptr)
        cols = np.tile(np.arange(x.shape[1], dtype=np.int64), len(rows))
        m = sp.csr_matrix(
            (np.asarray(values).ravel(), cols, indptr),
            shape=(len(rows), x.shape[1]),
        )
        # scatter the gathered rows back: duplicate indices accumulate
        onehot = sp.csr_matrix(
            (np.ones(len(rows), dtype=values.dtype),
             (rows, np.arange(len(rows)))),
            shape=(n_rows, len(rows)),
        )
        output_storage[0][0] = (onehot @ m).asformat("csr")

    def connection_pattern(self, node):
        return [[False], [True], [False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType
        from aesara_tpu.tensor.subtensor import AdvancedSubtensor1

        x, values, ilist = inputs
        (gz,) = output_grads
        g_values = AdvancedSubtensor1()(dense_from_sparse(gz), ilist)
        return [DisconnectedType()(), g_values, DisconnectedType()()]

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]


def construct_sparse_from_list(x, values, ilist):
    return ConstructSparseFromList()(x, values, ilist)


class CSMProperties(Op):
    """sparse → (data, indices, indptr, shape)."""

    __props__ = ()

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(
            self, [x],
            [
                TensorType(x.type.dtype, (None,))(),
                TensorType("int32", (None,))(),
                TensorType("int32", (None,))(),
                TensorType("int32", (2,))(),
            ],
        )

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        output_storage[0][0] = np.asarray(x.data)
        output_storage[1][0] = np.asarray(x.indices, dtype=np.int32)
        output_storage[2][0] = np.asarray(x.indptr, dtype=np.int32)
        output_storage[3][0] = np.asarray(x.shape, dtype=np.int32)

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        (x,) = inputs
        g_data = output_grads[0]
        # structured gradient: scatter g_data back into x's pattern
        gx = CSM(x.type.format)(
            g_data, csm_indices(x), csm_indptr(x), csm_shape_var(x)
        )
        return [gx]


csm_properties_op = CSMProperties()


def csm_properties(x):
    return csm_properties_op(x)


def csm_data(x):
    return csm_properties(x)[0]


def csm_indices(x):
    return csm_properties(x)[1]


def csm_indptr(x):
    return csm_properties(x)[2]


def csm_shape_var(x):
    return csm_properties(x)[3]


CSR = CSM("csr")
CSC = CSM("csc")


# ---------------------------------------------------------------------------
# dense <-> sparse
# ---------------------------------------------------------------------------

class SparseFromDense(Op):
    __props__ = ("format",)

    def __init__(self, format: str):
        self.format = format

    def make_node(self, x):
        x = as_tensor_variable(x)
        if x.type.ndim != 2:
            raise TypeError("only matrices can become sparse")
        return Apply(
            self, [x],
            [SparseTensorType(self.format, x.type.dtype, x.type.shape)()],
        )

    def perform(self, node, inputs, output_storage):
        cls = sp.csr_matrix if self.format == "csr" else sp.csc_matrix
        output_storage[0][0] = cls(inputs[0])

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [dense_from_sparse(gz)]


csr_from_dense = SparseFromDense("csr")
csc_from_dense = SparseFromDense("csc")


class DenseFromSparse(Op):
    __props__ = ("structured",)

    def __init__(self, structured: bool = True):
        self.structured = bool(structured)

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(self, [x], [TensorType(x.type.dtype, x.type.shape)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(inputs[0].todense(), dtype=inputs[0].dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        (x,) = inputs
        (gz,) = output_grads
        if self.structured:
            # keep x's sparsity pattern
            return [sp_structured_like(gz, x)]
        return [SparseFromDense(x.type.format)(gz)]


def dense_from_sparse(x):
    return DenseFromSparse()(x)


class StructuredLike(Op):
    """Project a dense grad onto a sparse template's pattern."""

    __props__ = ()

    def make_node(self, dense, template):
        dense = as_tensor_variable(dense)
        template = as_sparse_variable(template)
        return Apply(self, [dense, template], [template.type()])

    def perform(self, node, inputs, output_storage):
        d, t = inputs
        res = t.copy()
        if t.format == "csr":
            rows = np.repeat(np.arange(t.shape[0]), np.diff(t.indptr))
            cols = t.indices
        else:
            cols = np.repeat(np.arange(t.shape[1]), np.diff(t.indptr))
            rows = t.indices
        res.data = np.asarray(d[rows, cols]).ravel().astype(t.dtype)
        output_storage[0][0] = res

    def connection_pattern(self, node):
        return [[True], [False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType

        (gz,) = output_grads
        return [dense_from_sparse(gz), DisconnectedType()()]


def sp_structured_like(dense, template):
    return StructuredLike()(dense, template)


# ---------------------------------------------------------------------------
# products
# ---------------------------------------------------------------------------

class StructuredDot(Op):
    """sparse @ dense with STRUCTURED gradient wrt the sparse operand
    (gradient restricted to the existing sparsity pattern — reference
    ``sparse/basic.py`` StructuredDot)."""

    __props__ = ()

    def make_node(self, a, b):
        a = as_sparse_variable(a)
        b = as_tensor_variable(b)
        if b.type.ndim not in (1, 2):
            raise TypeError("structured_dot rhs must be vector/matrix")
        dtype = upcast(a.type.dtype, b.type.dtype)
        out_shape = (a.type.shape[0],) + (
            (b.type.shape[1],) if b.type.ndim == 2 else ()
        )
        return Apply(self, [a, b], [TensorType(dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        res = a @ b
        output_storage[0][0] = np.asarray(res, dtype=node.outputs[0].type.dtype)

    def infer_shape(self, fgraph, node, input_shapes):
        a_s, b_s = input_shapes
        if node.inputs[1].type.ndim == 2:
            return [(a_s[0], b_s[1])]
        return [(a_s[0],)]

    def grad(self, inputs, output_grads):
        a, b = inputs
        (gz,) = output_grads
        ga = StructuredDotGradA()(gz, b, a)
        gb = structured_dot(transpose(a), gz)
        return [ga, gb]


class StructuredDotGradA(Op):
    """gA (structured): (gz @ bᵀ) projected on a's pattern."""

    __props__ = ()

    def make_node(self, gz, b, a):
        return Apply(self, [gz, b, a], [a.type()])

    def perform(self, node, inputs, output_storage):
        gz, b, a = inputs
        gz2 = np.atleast_2d(np.asarray(gz))
        b2 = np.atleast_2d(np.asarray(b))
        if np.asarray(b).ndim == 1:
            dense_ga = np.outer(np.asarray(gz), np.asarray(b))
        else:
            dense_ga = gz2 @ b2.T
        res = a.copy().astype(node.outputs[0].type.dtype)
        if a.format == "csr":
            rows = np.repeat(np.arange(a.shape[0]), np.diff(a.indptr))
            cols = a.indices
        else:
            cols = np.repeat(np.arange(a.shape[1]), np.diff(a.indptr))
            rows = a.indices
        res.data = dense_ga[rows, cols].astype(res.dtype)
        output_storage[0][0] = res

    def connection_pattern(self, node):
        return [[True], [True], [False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        return [grad_not_implemented(self, i, v) for i, v in enumerate(inputs)]


_structured_dot = StructuredDot()


def structured_dot(a, b):
    if isinstance(getattr(a, "type", None), SparseTensorType):
        return _structured_dot(a, b)
    if isinstance(getattr(b, "type", None), SparseTensorType):
        # dense @ sparse = (sparseᵀ @ denseᵀ)ᵀ
        res = _structured_dot(transpose(b), as_tensor_variable(a).T)
        return res.T
    raise TypeError("structured_dot needs a sparse operand")


class Dot(Op):
    """true dot returning DENSE output with full (unstructured) grads."""

    __props__ = ()

    def make_node(self, a, b):
        a = as_sparse_or_tensor_variable(a)
        b = as_sparse_or_tensor_variable(b)
        dtype = upcast(a.type.dtype, b.type.dtype)
        if a.type.ndim not in (1, 2) or b.type.ndim not in (1, 2):
            raise TypeError("sparse dot operands must be 1-D or 2-D")
        # numpy dot rank semantics: contracted dims drop (review finding:
        # a 1-D dense left operand was typed 2-D, corrupting grad shapes)
        if a.type.ndim == 1 and b.type.ndim == 1:
            out_shape = ()
        elif a.type.ndim == 1:
            out_shape = (b.type.shape[1],)
        elif b.type.ndim == 1:
            out_shape = (a.type.shape[0],)
        else:
            out_shape = (a.type.shape[0], b.type.shape[1])
        return Apply(self, [a, b], [TensorType(dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        res = a @ b
        if sp.issparse(res):
            res = np.asarray(res.todense())
        output_storage[0][0] = np.asarray(res, dtype=node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        # true dot: FULL (unstructured) grads on both sides (reference
        # TrueDot semantics; review finding: the left-sparse grad was
        # pattern-projected and the right-sparse grad unimplemented)
        import aesara_tpu.tensor.math as tm

        a, b = inputs
        (gz,) = output_grads

        def dense(v):
            return (dense_from_sparse(v)
                    if isinstance(v.type, SparseTensorType) else v)

        # rank-promote for vector operands: z = A @ v has gA = outer(gz, v)
        ga = (
            tm.outer(gz, dense(b))
            if b.type.ndim == 1
            else tm.dot(gz, dense(b).T)
        )
        gb = (
            tm.outer(dense(a), gz)
            if a.type.ndim == 1
            else tm.dot(dense(a).T, gz)
        )
        if isinstance(a.type, SparseTensorType):
            ga = SparseFromDense(a.type.format)(ga)
        if isinstance(b.type, SparseTensorType):
            gb = SparseFromDense(b.type.format)(gb)
        return [ga, gb]


_dense_dot = Dot()


def dot(a, b):
    return _dense_dot(a, b)


class TrueDot(Op):
    """Sparse @ (sparse|dense) keeping a SPARSE result (ref ``TrueDot``
    sparse/basic.py:3285 — where ``Dot`` densifies, ``TrueDot`` keeps the
    scipy product's container)."""

    __props__ = ()

    def __init__(self, grad_preserves_dense=True):
        # not part of __props__ on purpose (matches the reference): merge
        # rewrites must unify nodes that differ only in grad packaging.
        self.grad_preserves_dense = grad_preserves_dense

    def make_node(self, x, y):
        x = as_sparse_variable(x)
        y = as_sparse_or_tensor_variable(y)
        if x.type.dtype != y.type.dtype:
            raise NotImplementedError("TrueDot requires matching dtypes")
        fmt = "csr" if x.type.format == "csr" else "csc"
        return Apply(self, [x, y], [SparseTensorType(fmt, x.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        x, y = inputs
        res = x @ y
        if not sp.issparse(res):
            res = sp.csr_matrix(res)
        output_storage[0][0] = res.asformat(node.outputs[0].type.format).astype(
            node.outputs[0].type.dtype
        )

    def grad(self, inputs, output_grads):
        x, y = inputs
        (gz,) = output_grads
        gx = true_dot(gz, transpose(y) if isinstance(y.type, SparseTensorType) else y.T)
        gy = true_dot(transpose(x), gz)
        if not isinstance(y.type, SparseTensorType) and self.grad_preserves_dense:
            gy = dense_from_sparse(gy)
        return [gx, gy]

    def infer_shape(self, fgraph, node, shapes):
        return [(shapes[0][0], shapes[1][1])]


def true_dot(x, y, grad_preserves_dense=True):
    """Dot product with a sparse result (ref ``true_dot``
    sparse/basic.py:3375). At least ``x`` must be sparse; a dense left
    operand is handled by transposing the flipped product."""
    if hasattr(x, "type") and isinstance(x.type, SparseTensorType):
        return TrueDot(grad_preserves_dense)(x, y)
    if hasattr(y, "type") and isinstance(y.type, SparseTensorType):
        return transpose(TrueDot(grad_preserves_dense)(transpose(y), x.T))
    raise TypeError("true_dot requires at least one sparse operand")


class SamplingDot(Op):
    """(x @ yᵀ) sampled at p's sparsity pattern (reference SamplingDot)."""

    __props__ = ()

    def make_node(self, x, y, p):
        x = as_tensor_variable(x)
        y = as_tensor_variable(y)
        p = as_sparse_variable(p)
        return Apply(self, [x, y, p], [p.type()])

    def perform(self, node, inputs, output_storage):
        x, y, p = inputs
        dense = x @ y.T
        res = p.copy().astype(node.outputs[0].type.dtype)
        if p.format == "csr":
            rows = np.repeat(np.arange(p.shape[0]), np.diff(p.indptr))
            cols = p.indices
        else:
            cols = np.repeat(np.arange(p.shape[1]), np.diff(p.indptr))
            rows = p.indices
        res.data = (dense[rows, cols] * p.data).astype(res.dtype)
        output_storage[0][0] = res

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_not_implemented

        x, y, p = inputs
        (gz,) = output_grads
        # out_ij = p_ij · (x yᵀ)_ij — p's DATA weighs the sample (see
        # perform), so the VJP carries p ∘ gz, not gz alone (reference
        # SamplingDot.grad, sparse/basic.py:4088)
        pgz = mul(p, gz)
        gx = dot(pgz, y)
        gy = dot(transpose(pgz), x)
        return [gx, gy, grad_not_implemented(self, 2, p)]


def sampling_dot(x, y, p):
    return SamplingDot()(x, y, p)


class Usmm(Op):
    """alpha * x @ y + z (reference Usmm) — the sparse gemm."""

    __props__ = ()

    def make_node(self, alpha, x, y, z):
        alpha = as_tensor_variable(alpha)
        x = as_sparse_or_tensor_variable(x)
        y = as_sparse_or_tensor_variable(y)
        z = as_tensor_variable(z)
        dtype = upcast(alpha.type.dtype, x.type.dtype, y.type.dtype, z.type.dtype)
        return Apply(self, [alpha, x, y, z], [TensorType(dtype, z.type.shape)()])

    def perform(self, node, inputs, output_storage):
        alpha, x, y, z = inputs
        res = alpha * (x @ y) + z
        if sp.issparse(res):
            res = np.asarray(res.todense())
        output_storage[0][0] = np.asarray(res, dtype=node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        # out = alpha·(x@y) + z (reference UsmmCscDense rides the same
        # math; grads follow gemm rules, structured on a sparse operand's
        # pattern via sampling_dot)
        from aesara_tpu.gradient import grad_not_implemented
        from aesara_tpu.tensor import math as _tm

        alpha, x, y, z = inputs
        (gz,) = output_grads
        x_sparse = isinstance(x.type, SparseTensorType)
        y_sparse = isinstance(y.type, SparseTensorType)
        xy = dot(x, y) if (x_sparse or y_sparse) else _tm.dot(x, y)
        g_alpha = _tm.sum(_tm.mul(gz, xy))
        agz = gz * alpha
        if x_sparse:
            gx = sampling_dot(agz, dense_from_sparse(y) if y_sparse else y,
                              sp_ones_like(x))
        elif y_sparse:
            gx = dot(agz, transpose(y))
        else:
            gx = _tm.dot(agz, y.T)
        if y_sparse:
            xd = dense_from_sparse(x) if x_sparse else x
            gy = sampling_dot(xd.T, agz.T, sp_ones_like(y))
        elif x_sparse:
            gy = structured_dot(transpose(x), agz)
        else:
            gy = _tm.dot(x.T, agz)
        return [g_alpha, gx, gy, gz]


def usmm(alpha, x, y, z):
    return Usmm()(alpha, x, y, z)


# ---------------------------------------------------------------------------
# elementwise-ish sparse algebra
# ---------------------------------------------------------------------------

class _BinarySS(Op):
    """base: sparse op sparse → sparse"""

    __props__ = ()
    _fn = None

    def make_node(self, a, b):
        a = as_sparse_variable(a)
        b = as_sparse_variable(b)
        dtype = upcast(a.type.dtype, b.type.dtype)
        return Apply(self, [a, b], [SparseTensorType(a.type.format, dtype)()])

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]


class AddSS(_BinarySS):
    def perform(self, node, inputs, output_storage):
        a, b = inputs
        output_storage[0][0] = (a + b).asformat(node.outputs[0].type.format).astype(
            node.outputs[0].type.dtype
        )

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [gz, gz]


class MulSS(_BinarySS):
    def perform(self, node, inputs, output_storage):
        a, b = inputs
        output_storage[0][0] = a.multiply(b).asformat(
            node.outputs[0].type.format
        ).astype(node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        a, b = inputs
        (gz,) = output_grads
        return [MulSS()(gz, b), MulSS()(gz, a)]


class AddSD(Op):
    """sparse + dense → dense"""

    __props__ = ()

    def make_node(self, a, b):
        a = as_sparse_variable(a)
        b = as_tensor_variable(b)
        if b.type.ndim != 2:
            raise TypeError(
                f"AddSD needs a 2-d dense operand, got ndim {b.type.ndim} "
                f"(scipy would broadcast, leaving the node mistyped)"
            )
        dtype = upcast(a.type.dtype, b.type.dtype)
        # the result broadcasts b against the sparse (M, N): a dim of b
        # that is statically 1 contributes no size information
        out_shape = tuple(
            ad if ad is not None else (bd if bd not in (1, None) else None)
            for ad, bd in zip(a.type.shape, b.type.shape)
        )
        return Apply(self, [a, b], [TensorType(dtype, out_shape)()])

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        output_storage[0][0] = np.asarray(a + b, dtype=node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        (a, b) = inputs
        (gz,) = output_grads
        return [sp_structured_like(gz, a), gz]


class MulSD(Op):
    """sparse * dense (elementwise) → sparse"""

    __props__ = ()

    def make_node(self, a, b):
        a = as_sparse_variable(a)
        b = as_tensor_variable(b)
        dtype = upcast(a.type.dtype, b.type.dtype)
        return Apply(self, [a, b], [SparseTensorType(a.type.format, dtype)()])

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        output_storage[0][0] = a.multiply(b).asformat(
            node.outputs[0].type.format
        ).astype(node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        a, b = inputs
        (gz,) = output_grads
        return [MulSD()(gz, b), dense_from_sparse(MulSS()(gz, a))]


def add(a, b):
    a_sparse = isinstance(getattr(a, "type", None), SparseTensorType)
    b_sparse = isinstance(getattr(b, "type", None), SparseTensorType)
    if a_sparse and b_sparse:
        return AddSS()(a, b)
    if a_sparse:
        return AddSD()(a, b)
    if b_sparse:
        return AddSD()(b, a)
    raise TypeError("sparse.add needs a sparse operand")


def sub(a, b):
    return add(a, neg(b) if isinstance(getattr(b, "type", None), SparseTensorType) else -b)


def mul(a, b):
    a_sparse = isinstance(getattr(a, "type", None), SparseTensorType)
    b_sparse = isinstance(getattr(b, "type", None), SparseTensorType)
    if a_sparse and b_sparse:
        return MulSS()(a, b)
    if a_sparse:
        return MulSD()(a, b)
    if b_sparse:
        return MulSD()(b, a)
    raise TypeError("sparse.mul needs a sparse operand")


class Neg(Op):
    __props__ = ()

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = -inputs[0]

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        return [Neg()(output_grads[0])]


def neg(x):
    return Neg()(x)


class Transpose(Op):
    __props__ = ()

    fmt_swap = {"csr": "csc", "csc": "csr"}

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(
            self, [x],
            [SparseTensorType(
                self.fmt_swap[x.type.format], x.type.dtype,
                (x.type.shape[1], x.type.shape[0]),
            )()],
        )

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0].transpose()

    def infer_shape(self, fgraph, node, input_shapes):
        (xs,) = input_shapes
        return [(xs[1], xs[0])]

    def grad(self, inputs, output_grads):
        return [Transpose()(output_grads[0])]


def transpose(x):
    return Transpose()(x)


class SpSum(Op):
    __props__ = ("axis", "structured")

    def __init__(self, axis=None, sparse_grad=True):
        if axis not in (None, 0, 1):
            raise ValueError(
                f"sp_sum axis must be None, 0 or 1 (2-d sparse); got {axis}"
            )
        self.axis = axis
        self.structured = bool(sparse_grad)

    def make_node(self, x):
        x = as_sparse_variable(x)
        if self.axis is None:
            out = TensorType(x.type.dtype, ())()
        else:
            n = x.type.shape[1 - (self.axis % 2)]
            out = TensorType(x.type.dtype, (n,))()
        return Apply(self, [x], [out])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        if self.axis is None:
            output_storage[0][0] = np.asarray(x.sum(), dtype=x.dtype)
        else:
            output_storage[0][0] = np.asarray(x.sum(self.axis)).ravel().astype(x.dtype)

    def grad(self, inputs, output_grads):
        from aesara_tpu.tensor.basic import fill as tfill
        from aesara_tpu.tensor.shape import shape_padleft, shape_padright

        (x,) = inputs
        (gz,) = output_grads
        if self.axis is None:
            g_dense = tfill(dense_from_sparse(x), gz)
        elif self.axis == 0:
            g_dense = shape_padleft(gz, 1) + dense_from_sparse(x) * 0
        else:
            g_dense = shape_padright(gz, 1) + dense_from_sparse(x) * 0
        if self.structured:
            # structured: gradient only at stored positions
            return [sp_structured_like(g_dense, x)]
        # unstructured (reference default): every cell contributes —
        # the dense fill rides back in a sparse container
        return [SparseFromDense(x.type.format)(g_dense)]


def sp_sum(x, axis=None, sparse_grad=False):
    # reference default: UNSTRUCTURED gradient (sparse/basic.py:1802)
    return SpSum(axis, sparse_grad)(x)


def sp_ones_like(x):
    data, indices, indptr, shape = csm_properties(x)
    from aesara_tpu.tensor.basic import ones_like as t_ones_like

    return CSM(x.type.format)(t_ones_like(data), indices, indptr, shape)


def sp_zeros_like(x):
    data, indices, indptr, shape = csm_properties(x)
    from aesara_tpu.tensor.basic import zeros_like as t_zeros_like

    return CSM(x.type.format)(t_zeros_like(data), indices, indptr, shape)


# ---------------------------------------------------------------------------
# stacking, comparisons, indexing, casts, structured elemwise
# (reference sparse/basic.py: HStack:3211, VStack:3296, comparison ops
# :430-700, GetItem2d:1542, GetItemScalar:1702, Cast:1150,
# structured_* :2800s)
# ---------------------------------------------------------------------------

class HStack(Op):
    """Concatenate sparse matrices horizontally (ref ``HStack:3211``)."""

    __props__ = ("format", "dtype")

    def __init__(self, format="csc", dtype=None):
        self.format = format
        self.dtype = dtype

    def make_node(self, *mats):
        mats = [as_sparse_variable(m) for m in mats]
        dtype = self.dtype or upcast(*[m.type.dtype for m in mats])
        return Apply(self, list(mats), [SparseTensorType(self.format, dtype)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = sp.hstack(inputs, format=self.format).astype(
            node.outputs[0].type.dtype
        )

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        out, col = [], 0
        for m in inputs:
            ncols = m.shape[1]
            out.append(_slice_grad(gz, slice(None), slice(col, col + ncols)))
            col = col + ncols
        return out

    def infer_shape(self, fgraph, node, shapes):
        from aesara_tpu.tensor import math as tm

        cols = shapes[0][1]
        for s in shapes[1:]:
            cols = tm.add(cols, s[1])
        return [(shapes[0][0], cols)]


class VStack(HStack):
    """Concatenate sparse matrices vertically (ref ``VStack:3296``)."""

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = sp.vstack(inputs, format=self.format).astype(
            node.outputs[0].type.dtype
        )

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        out, row = [], 0
        for m in inputs:
            nrows = m.shape[0]
            out.append(_slice_grad(gz, slice(row, row + nrows), slice(None)))
            row = row + nrows
        return out

    def infer_shape(self, fgraph, node, shapes):
        from aesara_tpu.tensor import math as tm

        rows = shapes[0][0]
        for s in shapes[1:]:
            rows = tm.add(rows, s[0])
        return [(rows, shapes[0][1])]


def _slice_grad(gz, s0, s1):
    """HStack/VStack gradient slice: the upstream gradient may be sparse
    (structured path) or dense (after ``sp_sum(sparse_grad=False)`` etc.);
    slice in whichever domain it lives, convert dense slices to sparse."""
    if isinstance(gz.type, SparseTensorType):
        return get_item_2d(gz, s0, s1)
    piece = gz[s0, s1]
    return SparseFromDense("csr")(piece)


def hstack(blocks, format="csc", dtype=None):
    return HStack(format, dtype)(*blocks)


def vstack(blocks, format="csc", dtype=None):
    return VStack(format, dtype)(*blocks)


class GetItem2d(Op):
    """Slice a sparse matrix with symbolic slice bounds — stays sparse
    (ref ``GetItem2d:1542``).  Bounds arrive as four scalar inputs
    (start0, stop0, start1, stop1); None bounds become 0/nrows."""

    __props__ = ()

    def make_node(self, x, start0, stop0, start1, stop1):
        x = as_sparse_variable(x)
        bounds = [as_tensor_variable(b) for b in (start0, stop0, start1, stop1)]
        return Apply(self, [x] + bounds,
                     [SparseTensorType(x.type.format, x.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        x, a0, b0, a1, b1 = inputs
        output_storage[0][0] = x[int(a0):int(b0), int(a1):int(b1)].asformat(
            node.outputs[0].type.format
        )


def get_item_2d(x, s0: slice, s1: slice):
    x = as_sparse_variable(x)
    from aesara_tpu.tensor.shape import shape as _shape

    shp = _shape(x)
    def _bounds(sl, dim):
        start = 0 if sl.start is None else sl.start
        stop = shp[dim] if sl.stop is None else sl.stop
        if sl.step not in (None, 1):
            raise NotImplementedError("sparse GetItem2d supports step=1 only")
        return start, stop

    a0, b0 = _bounds(s0, 0)
    a1, b1 = _bounds(s1, 1)
    return GetItem2d()(x, a0, b0, a1, b1)


class GetItemScalar(Op):
    """x[i, j] → 0-d dense scalar (ref ``GetItemScalar:1702``)."""

    __props__ = ()

    def make_node(self, x, i, j):
        x = as_sparse_variable(x)
        i = as_tensor_variable(i)
        j = as_tensor_variable(j)
        return Apply(self, [x, i, j], [TensorType(x.type.dtype, ())()])

    def perform(self, node, inputs, output_storage):
        x, i, j = inputs
        output_storage[0][0] = np.asarray(x[int(i), int(j)], dtype=node.outputs[0].type.dtype)


class Cast(Op):
    """Sparse dtype cast on the data vector only (ref ``Cast:1150``)."""

    __props__ = ("out_type",)

    def __init__(self, out_type):
        self.out_type = out_type

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(self, [x], [SparseTensorType(x.type.format, self.out_type)()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0].astype(self.out_type)

    def grad(self, inputs, output_grads):
        return [Cast(inputs[0].type.dtype)(output_grads[0])]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


def sp_cast(x, dtype):
    return Cast(dtype)(x)


class _ComparisonSS(_BinarySS):
    """sparse-vs-sparse comparison → bool-valued sparse matrix.
    SciPy emits efficiency warnings for comparisons that densify; the
    reference keeps the sparse container regardless, so do we."""

    _cmp = None

    def make_node(self, a, b):
        a = as_sparse_variable(a)
        b = as_sparse_variable(b)
        return Apply(self, [a, b], [SparseTensorType(a.type.format, "uint8")()])

    def perform(self, node, inputs, output_storage):
        a, b = inputs
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("ignore")
            res = self._cmp(a, b)
        output_storage[0][0] = sp.csr_matrix(res, dtype="uint8").asformat(
            node.outputs[0].type.format
        )


class EqualSS(_ComparisonSS):
    _cmp = staticmethod(lambda a, b: a == b)


class NotEqualSS(_ComparisonSS):
    _cmp = staticmethod(lambda a, b: a != b)


class LessThanSS(_ComparisonSS):
    _cmp = staticmethod(lambda a, b: a < b)


class GreaterThanSS(_ComparisonSS):
    _cmp = staticmethod(lambda a, b: a > b)


class LessEqualSS(_ComparisonSS):
    _cmp = staticmethod(lambda a, b: a <= b)


class GreaterEqualSS(_ComparisonSS):
    _cmp = staticmethod(lambda a, b: a >= b)


class _ComparisonSD(Op):
    """sparse-vs-dense comparison → DENSE uint8 matrix (ref
    ``__ComparisonOpSD`` sparse/basic.py:2618 — densifying is inherent:
    entries absent from the pattern still compare against the dense side)."""

    __props__ = ()
    _cmp = None

    def make_node(self, x, y):
        x = as_sparse_variable(x)
        y = as_tensor_variable(y)
        if y.type.ndim != 2:
            raise TypeError("sparse-dense comparison needs a 2d dense operand")
        return Apply(self, [x, y], [TensorType("uint8", (None, None))()])

    def perform(self, node, inputs, output_storage):
        x, y = inputs
        output_storage[0][0] = np.asarray(self._cmp(x, y)).astype("uint8")

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


class EqualSD(_ComparisonSD):
    _cmp = staticmethod(lambda x, y: x == y)


class NotEqualSD(_ComparisonSD):
    _cmp = staticmethod(lambda x, y: x != y)


class LessThanSD(_ComparisonSD):
    _cmp = staticmethod(lambda x, y: x < y)


class GreaterThanSD(_ComparisonSD):
    _cmp = staticmethod(lambda x, y: x > y)


class LessEqualSD(_ComparisonSD):
    _cmp = staticmethod(lambda x, y: x <= y)


class GreaterEqualSD(_ComparisonSD):
    _cmp = staticmethod(lambda x, y: x >= y)


def _comparison_switch(ss, sd, ds):
    """Dispatch a comparison over the sparse/dense operand mix (ref
    ``__ComparisonSwitch`` sparse/basic.py:2624).  ``ds`` is the mirrored
    sparse-dense op, applied as ``ds(y, x)`` since scipy requires the
    sparse operand on the left."""

    def helper(x, y):
        if sp.issparse(x):
            x = as_sparse_variable(x)
        if sp.issparse(y):
            y = as_sparse_variable(y)
        x_sp = hasattr(x, "type") and isinstance(getattr(x, "type", None), SparseTensorType)
        y_sp = hasattr(y, "type") and isinstance(getattr(y, "type", None), SparseTensorType)
        if x_sp and y_sp:
            return ss(x, y)
        if x_sp:
            return sd(x, as_tensor_variable(y))
        if y_sp:
            return ds(y, as_tensor_variable(x))
        raise TypeError("at least one operand must be sparse")

    return helper


equal_s_s = EqualSS()
equal_s_d = EqualSD()
not_equal_s_s = NotEqualSS()
not_equal_s_d = NotEqualSD()
less_than_s_s = LessThanSS()
less_than_s_d = LessThanSD()
greater_than_s_s = GreaterThanSS()
greater_than_s_d = GreaterThanSD()
less_equal_s_s = LessEqualSS()
less_equal_s_d = LessEqualSD()
greater_equal_s_s = GreaterEqualSS()
greater_equal_s_d = GreaterEqualSD()

# mirrored forms: cmp(dense, sparse) == mirror_cmp(sparse, dense)
eq = _comparison_switch(equal_s_s, equal_s_d, equal_s_d)
neq = _comparison_switch(not_equal_s_s, not_equal_s_d, not_equal_s_d)
lt = _comparison_switch(less_than_s_s, less_than_s_d, greater_than_s_d)
gt = _comparison_switch(greater_than_s_s, greater_than_s_d, less_than_s_d)
le = _comparison_switch(less_equal_s_s, less_equal_s_d, greater_equal_s_d)
ge = _comparison_switch(greater_equal_s_s, greater_equal_s_d, less_equal_s_d)


class StructuredElemwise(Op):
    """Apply a scalar function to the NONZERO entries only — the
    ``structured_*`` family (ref ``structured_sigmoid`` etc., built by
    ``structured_monoid`` :2799)."""

    __props__ = ("fn_name",)

    def __init__(self, fn_name, np_fn):
        self.fn_name = fn_name
        self.np_fn = np_fn

    def make_node(self, x):
        x = as_sparse_variable(x)
        dtype = x.type.dtype
        if dtype.startswith(("int", "uint")):
            dtype = "float64" if dtype in ("int64", "uint64") else "float32"
        return Apply(self, [x], [SparseTensorType(x.type.format, dtype)()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        out = x.copy().astype(node.outputs[0].type.dtype)
        out.data = self.np_fn(out.data).astype(node.outputs[0].type.dtype)
        output_storage[0][0] = out

    def grad(self, inputs, output_grads):
        # Structured VJP: f applies to stored entries only, so the
        # gradient is f'(data) placed back on x's pattern, times gz
        # (``mul`` dispatches MulSS/MulSD for sparse/dense gz).  The
        # reference writes one grad per generated op
        # (sparse/basic.py structured_monoid family); here one table of
        # scalar derivative expressions serves them all.
        (x,) = inputs
        (gz,) = output_grads
        deriv = _STRUCTURED_DERIVS.get(self.fn_name)
        if deriv is None:
            from aesara_tpu.gradient import grad_not_implemented

            return [grad_not_implemented(self, 0, x,
                                         f"structured_{self.fn_name}")]
        data, indices, indptr, shape = csm_properties(x)
        fprime = CSM(x.type.format)(deriv(data), indices, indptr, shape)
        return [mul(fprime, gz)]

    def __str__(self):
        return f"structured_{self.fn_name}"


def _make_structured_derivs():
    """Scalar derivative expressions f'(d) on the stored-data vector, for
    every smooth structured op (f(0)=0 family).  Step functions
    (trunc/sgn/ceil/floor/conj) stay unlisted → grad_not_implemented."""
    import aesara_tpu.tensor.basic as _tb
    import aesara_tpu.tensor.math as _tm

    return {
        "sigmoid": lambda d: _tm.sigmoid(d) * (1.0 - _tm.sigmoid(d)),
        "exp": lambda d: _tm.exp(d),
        "log": lambda d: 1.0 / d,
        "log1p": lambda d: 1.0 / (1.0 + d),
        "sqrt": lambda d: 0.5 / _tm.sqrt(d),
        "sqr": lambda d: 2.0 * d,
        "deg2rad": lambda d: _tb.ones_like(d) * (np.pi / 180.0),
        "rad2deg": lambda d: _tb.ones_like(d) * (180.0 / np.pi),
        "sin": lambda d: _tm.cos(d),
        "tan": lambda d: 1.0 + _tm.sqr(_tm.tan(d)),
        "arcsin": lambda d: 1.0 / _tm.sqrt(1.0 - _tm.sqr(d)),
        "arctan": lambda d: 1.0 / (1.0 + _tm.sqr(d)),
        "sinh": lambda d: _tm.cosh(d),
        "tanh": lambda d: 1.0 - _tm.sqr(_tm.tanh(d)),
        "arcsinh": lambda d: 1.0 / _tm.sqrt(1.0 + _tm.sqr(d)),
        "arctanh": lambda d: 1.0 / (1.0 - _tm.sqr(d)),
    }


class _LazyDerivTable(dict):
    """Defer the tensor.math import to first gradient request (sparse
    imports before tensor.math finishes initializing)."""

    def get(self, key, default=None):
        if not self:
            self.update(_make_structured_derivs())
        return super().get(key, default)


_STRUCTURED_DERIVS = _LazyDerivTable()


def _structured(name, np_fn):
    op = StructuredElemwise(name, np_fn)

    def fn(x):
        return op(x)

    fn.__name__ = f"structured_{name}"
    return fn


import scipy.special as _sps  # noqa: E402

structured_sigmoid = _structured("sigmoid", _sps.expit)
structured_exp = _structured("exp", np.exp)
structured_log = _structured("log", np.log)
structured_log1p = _structured("log1p", np.log1p)
structured_pow = None  # binary; see structured_add_s_v below for pattern
structured_sqrt = _structured("sqrt", np.sqrt)
structured_conj = _structured("conj", np.conj)
sqr_sp = _structured("sqr", np.square)
deg2rad_sp = _structured("deg2rad", np.deg2rad)
rad2deg_sp = _structured("rad2deg", np.rad2deg)
trunc_sp = _structured("trunc", np.trunc)
sgn_sp = _structured("sgn", np.sign)
ceil_sp = _structured("ceil", np.ceil)
floor_sp = _structured("floor", np.floor)
sin_sp = _structured("sin", np.sin)
tan_sp = _structured("tan", np.tan)
arcsin_sp = _structured("arcsin", np.arcsin)
arctan_sp = _structured("arctan", np.arctan)
sinh_sp = _structured("sinh", np.sinh)
tanh_sp = _structured("tanh", np.tanh)
arcsinh_sp = _structured("arcsinh", np.arcsinh)
arctanh_sp = _structured("arctanh", np.arctanh)
expm1_sp = _structured("expm1", np.expm1)


class Diag(Op):
    """Extract the diagonal of a square sparse matrix as a dense vector
    (ref ``Diag:3610``)."""

    __props__ = ()

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(self, [x], [TensorType(x.type.dtype, (None,))()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = np.asarray(inputs[0].diagonal())

    def grad(self, inputs, output_grads):
        # VJP: scatter gz back onto the diagonal.  The reference returns
        # square_diagonal(gz) (sparse/basic.py:3640) and so only supports
        # square inputs; since this Diag handles rectangular matrices the
        # scatter is built at the INPUT's shape via CSM (review finding:
        # square_diagonal(gz) was (k,k) for an (m,n) input).
        from aesara_tpu.tensor.basic import arange
        from aesara_tpu.tensor.math import minimum

        (x,) = inputs
        (gz,) = output_grads
        shp = csm_shape_var(x)
        k = gz.shape[0]
        # csc with one entry (row j) in each column j < k
        indices = arange(k)
        indptr = minimum(arange(shp[1] + 1), k)
        return [CSM("csc")(gz, indices, indptr, shp)]

    def infer_shape(self, fgraph, node, shapes):
        from aesara_tpu.tensor.math import minimum

        return [(minimum(shapes[0][0], shapes[0][1]),)]


class SquareDiagonal(Op):
    """Build a sparse diagonal matrix from a dense vector
    (ref ``SquareDiagonal:3653``)."""

    __props__ = ()

    def make_node(self, diag):
        diag = as_tensor_variable(diag)
        return Apply(self, [diag], [SparseTensorType("csc", diag.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        (d,) = inputs
        output_storage[0][0] = sp.diags(d).tocsc().astype(node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        return [Diag()(output_grads[0])]


def diag(x):
    return Diag()(x)


def square_diagonal(d):
    return SquareDiagonal()(d)


class EnsureSortedIndices(Op):
    """(ref ``EnsureSortedIndices:3704``)"""

    __props__ = ("inplace",)

    def __init__(self, inplace=False):
        self.inplace = inplace

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(self, [x], [SparseTensorType(x.type.format, x.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        if self.inplace:
            x.sort_indices()
            output_storage[0][0] = x
        else:
            output_storage[0][0] = x.sorted_indices()

    def grad(self, inputs, output_grads):
        return [output_grads[0]]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


def ensure_sorted_indices(x):
    return EnsureSortedIndices()(x)


def clean(x):
    """Sort indices and drop explicit zeros (ref ``clean:3770``)."""
    return ensure_sorted_indices(remove0(x))


class Remove0(Op):
    """Drop explicitly-stored zeros (ref ``Remove0:295``)."""

    __props__ = ()

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(self, [x], [SparseTensorType(x.type.format, x.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        out = inputs[0].copy()
        out.eliminate_zeros()
        output_storage[0][0] = out

    def grad(self, inputs, output_grads):
        return [output_grads[0]]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


def remove0(x):
    return Remove0()(x)


__all__ += [
    "HStack", "VStack", "hstack", "vstack", "GetItem2d", "get_item_2d", "GetItemScalar",
    "Cast", "sp_cast", "eq", "neq", "lt", "gt", "le", "ge",
    "structured_sigmoid", "structured_exp", "structured_log",
    "structured_log1p", "structured_sqrt",
    "Diag", "diag", "SquareDiagonal", "square_diagonal",
    "EnsureSortedIndices", "ensure_sorted_indices", "clean",
    "Remove0", "remove0",
]


# ---------------------------------------------------------------------------
# sparse×vector broadcast, list indexing, construction, pattern samplers
# (reference sparse/basic.py: MulSV:2730, StructuredAddSV:2612,
# GetItemList:1402, GetItem2Lists:1480, ConstructSparseFromList:4100,
# Poisson:3860, Binomial:3900, Multinomial:3950)
# ---------------------------------------------------------------------------

class MulSV(Op):
    """sparse * dense vector, broadcast along rows (ref ``MulSV:2730``):
    keeps the sparsity pattern — only stored entries are scaled."""

    __props__ = ()

    def make_node(self, x, v):
        x = as_sparse_variable(x)
        v = as_tensor_variable(v)
        if v.type.ndim != 1:
            raise TypeError("MulSV needs a vector")
        dtype = upcast(x.type.dtype, v.type.dtype)
        return Apply(self, [x, v], [SparseTensorType(x.type.format, dtype)()])

    def perform(self, node, inputs, output_storage):
        x, v = inputs
        output_storage[0][0] = x.multiply(v).asformat(
            node.outputs[0].type.format
        ).astype(node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        x, v = inputs
        (gz,) = output_grads
        from aesara_tpu.tensor.math import sum as t_sum

        # z_ij = x_ij * v_j:  dx = gz*v (same pattern),  dv_j = sum_i gz_ij x_ij
        return [MulSV()(gz, v),
                t_sum(dense_from_sparse(MulSS()(gz, x)), axis=0)]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


def mul_s_v(x, v):
    return MulSV()(x, v)


class StructuredAddSV(Op):
    """Add a dense vector to the NONZERO entries only (ref
    ``StructuredAddSV:2612``) — pattern-preserving add."""

    __props__ = ()

    def make_node(self, x, v):
        x = as_sparse_variable(x)
        v = as_tensor_variable(v)
        if v.type.ndim != 1:
            raise TypeError("StructuredAddSV needs a vector")
        dtype = upcast(x.type.dtype, v.type.dtype)
        return Apply(self, [x, v], [SparseTensorType(x.type.format, dtype)()])

    def perform(self, node, inputs, output_storage):
        x, v = inputs
        out = x.copy().astype(node.outputs[0].type.dtype)
        if x.format == "csr":
            col_of = out.indices
            out.data = out.data + np.asarray(v)[col_of]
        else:
            csr = out.tocsr()
            csr.data = csr.data + np.asarray(v)[csr.indices]
            out = csr.asformat(x.format)
        output_storage[0][0] = out

    def grad(self, inputs, output_grads):
        x, v = inputs
        (gz,) = output_grads
        from aesara_tpu.tensor.math import sum as t_sum

        # z.data = x.data + v[col]:  dx = gz projected onto x's pattern,
        # dv_j = sum over x's STORED positions of gz — gz must be
        # projected first because an unstructured upstream gradient
        # (e.g. sp_sum(..., sparse_grad=False)) covers every cell
        gz_on_pattern = MulSS()(gz, sp_ones_like(x))
        return [gz_on_pattern,
                t_sum(dense_from_sparse(gz_on_pattern), axis=0)]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


def structured_add_s_v(x, v):
    return StructuredAddSV()(x, v)


class GetItemList(Op):
    """Select ROWS by an index vector — stays sparse (ref
    ``GetItemList:1402``)."""

    __props__ = ()

    def make_node(self, x, idx):
        x = as_sparse_variable(x)
        idx = as_tensor_variable(idx)
        if idx.type.ndim != 1:
            raise TypeError("GetItemList needs a 1-d index vector")
        return Apply(self, [x, idx],
                     [SparseTensorType(x.type.format, x.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        x, idx = inputs
        output_storage[0][0] = x[np.asarray(idx, dtype="int64")].asformat(
            node.outputs[0].type.format
        )

    def grad(self, inputs, output_grads):
        x, idx = inputs
        (gz,) = output_grads
        from aesara_tpu.tensor.shape import shape as _shape

        return [GetItemListGrad()(gz, idx, _shape(x)),
                grad_undefined_int(self, 1, idx)]


def grad_undefined_int(op, i, inp):
    from aesara_tpu.gradient import grad_undefined

    return grad_undefined(op, i, inp, "integer index has no gradient")


class GetItemListGrad(Op):
    """Scatter row gradients back to the original row positions."""

    __props__ = ()

    def make_node(self, gz, idx, xshape):
        gz = as_sparse_variable(gz)
        idx = as_tensor_variable(idx)
        xshape = as_tensor_variable(xshape)
        return Apply(self, [gz, idx, xshape],
                     [SparseTensorType(gz.type.format, gz.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        gz, idx, xshape = inputs
        out = sp.lil_matrix(tuple(int(s) for s in xshape), dtype=gz.dtype)
        gzl = gz.tolil()
        for k, row in enumerate(np.asarray(idx, dtype="int64")):
            out[row] = out[row] + gzl[k]
        output_storage[0][0] = out.asformat(node.outputs[0].type.format)


class GetItem2Lists(Op):
    """x[rows, cols] elementwise gather → dense vector (ref
    ``GetItem2Lists:1480``)."""

    __props__ = ()

    def make_node(self, x, rows, cols):
        x = as_sparse_variable(x)
        rows = as_tensor_variable(rows)
        cols = as_tensor_variable(cols)
        return Apply(self, [x, rows, cols],
                     [TensorType(x.type.dtype, (None,))()])

    def perform(self, node, inputs, output_storage):
        x, rows, cols = inputs
        output_storage[0][0] = np.asarray(
            x[np.asarray(rows, dtype="int64"),
              np.asarray(cols, dtype="int64")]
        ).flatten().astype(node.outputs[0].type.dtype)

    def grad(self, inputs, output_grads):
        x, rows, cols = inputs
        (gz,) = output_grads
        return [GetItem2ListsGrad()(x, rows, cols, gz),
                grad_undefined_int(self, 1, rows),
                grad_undefined_int(self, 2, cols)]


class GetItem2ListsGrad(Op):
    """Scatter the gather's cotangent back to a sparse matrix at the
    (rows, cols) coordinates (ref ``GetItem2ListsGrad:1516``)."""

    __props__ = ()

    def make_node(self, x, rows, cols, gz):
        x = as_sparse_variable(x)
        return Apply(self, [x, as_tensor_variable(rows),
                            as_tensor_variable(cols), as_tensor_variable(gz)],
                     [SparseTensorType(x.type.format, gz.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        x, rows, cols, gz = inputs
        out = sp.coo_matrix(
            (gz, (np.asarray(rows, dtype="int64"), np.asarray(cols, dtype="int64"))),
            shape=x.shape,
        )
        output_storage[0][0] = out.asformat(node.outputs[0].type.format)

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


def get_item_list(x, idx):
    return GetItemList()(x, idx)


def get_item_2lists(x, rows, cols):
    return GetItem2Lists()(x, rows, cols)


class _PatternSampler(Op):
    """Fill the sparsity pattern with random draws (ref ``Poisson:3860``
    family): structure stays, stored values are resampled on the host —
    utility ops for sparse-data pipelines, not device RNG."""

    __props__ = ("seed",)
    _sample = None

    def __init__(self, seed=428):
        self.seed = seed

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(self, [x], [SparseTensorType(x.type.format, x.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        rng = np.random.default_rng(self.seed)
        out = x.copy()
        out.data = self._sample(rng, out.data).astype(out.dtype)
        out.eliminate_zeros()
        output_storage[0][0] = out


class PoissonSampler(_PatternSampler):
    _sample = staticmethod(lambda rng, lam: rng.poisson(np.abs(lam)))


class BinomialSampler(_PatternSampler):
    _sample = staticmethod(
        lambda rng, p: rng.binomial(1, np.clip(np.abs(p), 0, 1))
    )


def poisson(x, seed=428):
    return PoissonSampler(seed)(x)


def binomial_sample(x, seed=428):
    return BinomialSampler(seed)(x)


__all__ += [
    "MulSV", "mul_s_v", "StructuredAddSV", "structured_add_s_v",
    "GetItemList", "GetItem2Lists", "get_item_list", "get_item_2lists",
    "ConstructSparseFromList", "construct_sparse_from_list",
    "PoissonSampler", "poisson", "BinomialSampler", "binomial_sample",
]


# ---------------------------------------------------------------------------
# column/row scaling, same-pattern add, operator sugar
# (reference sparse/basic.py: ColScaleCSC:1567, RowScaleCSC:1611,
# col_scale:1660, row_scale:1691, AddSSData:2051, _sparse_py_operators)
# ---------------------------------------------------------------------------


class ColScaleCSC(Op):
    """Scale each column of a csc matrix by the matching element of a dense
    vector; structured gradient (ref ``ColScaleCSC:1567``)."""

    __props__ = ()

    def make_node(self, x, s):
        x = as_sparse_variable(x)
        if x.type.format != "csc":
            raise ValueError("ColScaleCSC needs a csc operand")
        s = as_tensor_variable(s)
        return Apply(self, [x, s], [x.type()])

    def perform(self, node, inputs, output_storage):
        x, s = inputs
        out = x.copy()
        # column id of every stored entry, vectorized over the csc layout
        cols = np.repeat(np.arange(x.shape[1]), np.diff(x.indptr))
        out.data = out.data * s[cols]
        output_storage[0][0] = out.astype(x.dtype)

    def grad(self, inputs, output_grads):
        x, s = inputs
        (gz,) = output_grads
        return [col_scale(gz, s), sp_sum(mul(x, gz), axis=0)]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


class RowScaleCSC(Op):
    """Scale each row of a csc matrix by the matching element of a dense
    vector; structured gradient (ref ``RowScaleCSC:1611``)."""

    __props__ = ()

    def make_node(self, x, s):
        x = as_sparse_variable(x)
        if x.type.format != "csc":
            raise ValueError("RowScaleCSC needs a csc operand")
        s = as_tensor_variable(s)
        return Apply(self, [x, s], [x.type()])

    def perform(self, node, inputs, output_storage):
        x, s = inputs
        out = x.copy()
        # in csc layout, indices[k] is the ROW of stored entry k
        out.data = out.data * s[x.indices]
        output_storage[0][0] = out.astype(x.dtype)

    def grad(self, inputs, output_grads):
        x, s = inputs
        (gz,) = output_grads
        return [row_scale(gz, s), sp_sum(mul(x, gz), axis=1)]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


def col_scale(x, s):
    """Scale columns of ``x`` by vector ``s`` (ref ``col_scale:1660``).
    csr inputs route through the transpose, exactly as the reference."""
    if x.format == "csc":
        return ColScaleCSC()(x, s)
    if x.format == "csr":
        return transpose(RowScaleCSC()(transpose(x), s))
    raise NotImplementedError(f"col_scale: format {x.format}")


def row_scale(x, s):
    """Scale rows of ``x`` by vector ``s`` (ref ``row_scale:1691``)."""
    return transpose(col_scale(transpose(x), s))


class AddSSData(Op):
    """Add two sparse matrices that share a sparsity pattern by adding their
    data vectors; structured gradient (ref ``AddSSData:2051``)."""

    __props__ = ()

    def make_node(self, x, y):
        x = as_sparse_variable(x)
        y = as_sparse_variable(y)
        if x.type.dtype != y.type.dtype or x.type.format != y.type.format:
            raise NotImplementedError("AddSSData needs matching dtype+format")
        return Apply(self, [x, y], [SparseTensorType(x.type.format, x.type.dtype)()])

    def perform(self, node, inputs, output_storage):
        x, y = inputs
        if x.data.shape != y.data.shape:
            raise ValueError("AddSSData operands must share a sparsity pattern")
        out = x.copy()
        out.data = out.data + y.data
        output_storage[0][0] = out

    def grad(self, inputs, output_grads):
        (gz,) = output_grads
        return [gz, gz]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[0]]


add_s_s_data = AddSSData()


# operator sugar on SparseVariable (ref ``_sparse_py_operators``): route the
# arithmetic dunders through the sparse ops instead of the inherited dense
# TensorVariable ones, and make ``.T`` a sparse transpose (a dimshuffle on a
# scipy container would be meaningless).
def _sp_add(self, other):
    return add(self, other)


def _sp_sub(self, other):
    return sub(self, other)


def _sp_mul(self, other):
    return mul(self, other)


SparseVariable.__add__ = _sp_add
SparseVariable.__radd__ = _sp_add
SparseVariable.__sub__ = _sp_sub
SparseVariable.__mul__ = _sp_mul
SparseVariable.__rmul__ = _sp_mul
SparseVariable.__neg__ = lambda self: neg(self)
SparseVariable.__lt__ = lambda self, other: lt(self, other)
SparseVariable.__le__ = lambda self, other: le(self, other)
SparseVariable.__gt__ = lambda self, other: gt(self, other)
SparseVariable.__ge__ = lambda self, other: ge(self, other)
SparseVariable.T = property(lambda self: transpose(self))
SparseVariable.sum = lambda self, axis=None, sparse_grad=True: sp_sum(
    self, axis=axis, sparse_grad=sparse_grad
)
SparseVariable.astype = lambda self, dtype: sp_cast(self, dtype)


def _sp_getitem(self, key):
    """Sparse indexing sugar (ref ``_sparse_py_operators.__getitem__``):
    slices → GetItem2d (stays sparse), (i, j) scalars → GetItemScalar,
    an integer vector → GetItemList (row gather), two vectors →
    GetItem2Lists — NOT the dense Subtensor path."""
    from aesara_tpu.graph.ir import Variable as _V

    def _is_scalar_idx(k):
        if isinstance(k, (int, np.integer)):
            return True
        return isinstance(k, _V) and getattr(k.type, "ndim", None) == 0

    def _is_vector_idx(k):
        if isinstance(k, (list, np.ndarray)):
            return np.asarray(k).ndim == 1
        return isinstance(k, _V) and getattr(k.type, "ndim", None) == 1

    if isinstance(key, tuple):
        if len(key) != 2:
            raise IndexError("sparse matrices are 2-d")
        k0, k1 = key
        if _is_scalar_idx(k0) and _is_scalar_idx(k1):
            return GetItemScalar()(self, k0, k1)
        if _is_vector_idx(k0) and _is_vector_idx(k1):
            return get_item_2lists(self, k0, k1)
        if isinstance(k0, slice) or isinstance(k1, slice):
            s0 = k0 if isinstance(k0, slice) else slice(k0, k0 + 1)
            s1 = k1 if isinstance(k1, slice) else slice(k1, k1 + 1)
            return get_item_2d(self, s0, s1)
        raise NotImplementedError(f"sparse index {key!r}")
    if isinstance(key, slice):
        return get_item_2d(self, key, slice(None))
    if _is_vector_idx(key):
        return get_item_list(self, key)
    if _is_scalar_idx(key):
        return get_item_2d(self, slice(key, key + 1), slice(None))
    raise NotImplementedError(f"sparse index {key!r}")


SparseVariable.__getitem__ = _sp_getitem


__all__ += [
    "TrueDot",
    "ColScaleCSC", "RowScaleCSC", "col_scale", "row_scale",
    "AddSSData", "add_s_s_data",
    "EqualSD", "NotEqualSD", "LessThanSD", "GreaterThanSD",
    "LessEqualSD", "GreaterEqualSD",
    "equal_s_s", "equal_s_d", "not_equal_s_s", "not_equal_s_d",
    "less_than_s_s", "less_than_s_d", "greater_than_s_s",
    "greater_than_s_d", "less_equal_s_s", "less_equal_s_d",
    "greater_equal_s_s", "greater_equal_s_d",
]
