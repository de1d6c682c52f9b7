"""Sparse random samplers (reference ``aesara/sparse/sandbox/sp2.py``:
Poisson:33, Binomial:78, Multinomial:149).  Unlike the deterministic
seeded ``_PatternSampler`` family in ``sparse/basic.py``, these mirror
the reference's contract-violating stateful draws (each call samples
fresh) — kept for API parity."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from aesara_tpu.graph.ir import Apply
from aesara_tpu.graph.op import Op
from aesara_tpu.sparse.basic import as_sparse_variable
from aesara_tpu.sparse.type import SparseTensorType
from aesara_tpu.tensor.basic import as_tensor_variable

__all__ = ["Poisson", "poisson", "Binomial", "Multinomial", "multinomial"]


class Poisson(Op):
    """Sparse matrix with data ~ Poisson(x.data), pattern preserved
    (reference ``Poisson:33``; non-deterministic like the reference)."""

    __props__ = ()

    def make_node(self, x):
        x = as_sparse_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        (x,) = inputs
        out = x.copy()
        out.data = np.asarray(np.random.poisson(np.abs(out.data)), dtype=x.dtype)
        out.eliminate_zeros()
        output_storage[0][0] = out

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        return [grad_undefined(self, 0, inputs[0], "Poisson sampling")]

    def infer_shape(self, fgraph, node, shapes):
        return shapes


poisson = Poisson()


class Binomial(Op):
    """Sparse matrix of binomial(n, p) draws with a given dense shape
    (reference ``Binomial:78``)."""

    __props__ = ("format", "dtype")

    def __init__(self, format, dtype):
        self.format = format
        self.dtype = dtype

    def make_node(self, n, p, shape):
        n = as_tensor_variable(n)
        p = as_tensor_variable(p)
        shape = as_tensor_variable(shape)
        return Apply(self, [n, p, shape],
                     [SparseTensorType(self.format, self.dtype)()])

    def perform(self, node, inputs, output_storage):
        n, p, shape = inputs
        draws = np.random.binomial(int(n), float(p),
                                   size=tuple(int(s) for s in shape))
        cls = sp.csr_matrix if self.format == "csr" else sp.csc_matrix
        output_storage[0][0] = cls(draws, dtype=self.dtype)

    def connection_pattern(self, node):
        return [[True], [True], [False]]

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType, grad_undefined

        n, p, shape = inputs
        return [grad_undefined(self, 0, n, "Binomial sampling"),
                grad_undefined(self, 1, p, "Binomial sampling"),
                DisconnectedType()()]

    def infer_shape(self, fgraph, node, shapes):
        return [(node.inputs[2][0], node.inputs[2][1])]


class Multinomial(Op):
    """Per-row multinomial over the stored probabilities of a csr matrix
    (reference ``Multinomial:149``)."""

    __props__ = ()

    def make_node(self, n, p):
        n = as_tensor_variable(n)
        p = as_sparse_variable(p)
        return Apply(self, [n, p], [p.type()])

    def perform(self, node, inputs, output_storage):
        n, p = inputs
        if p.format != "csr":
            raise NotImplementedError("Multinomial needs csr probabilities")
        out = p.copy()
        n_arr = np.broadcast_to(np.asarray(n), (p.shape[0],))
        for i in range(p.shape[0]):
            k, l = p.indptr[i], p.indptr[i + 1]
            if l > k:
                out.data[k:l] = np.random.multinomial(int(n_arr[i]), p.data[k:l])
        output_storage[0][0] = out

    def grad(self, inputs, output_grads):
        from aesara_tpu.gradient import grad_undefined

        n, p = inputs
        return [grad_undefined(self, 0, n, "Multinomial sampling"),
                grad_undefined(self, 1, p, "Multinomial sampling")]

    def infer_shape(self, fgraph, node, shapes):
        return [shapes[1]]


multinomial = Multinomial()
