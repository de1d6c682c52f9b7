"""Sparse rewrites (reference ``aesara/sparse/rewriting.py``: its bulk
selects gen-C structured-dot kernels — subsumed by the BCOO lowering.
The structural rewrite that survives: fold ``DenseFromSparse(
SparseFromDense(x))`` round-trips."""

from aesara_tpu.compile.mode import register_canonicalize
from aesara_tpu.graph.rewriting.basic import copy_stack_trace, node_rewriter
from aesara_tpu.sparse.basic import DenseFromSparse, SparseFromDense


@node_rewriter([DenseFromSparse])
def local_dense_from_sparse_roundtrip(fgraph, node):
    inner = node.inputs[0]
    if inner.owner is not None and isinstance(inner.owner.op, SparseFromDense):
        x = inner.owner.inputs[0]
        copy_stack_trace(node.outputs[0], x)
        return [x]
    return False


register_canonicalize(local_dense_from_sparse_roundtrip,
                      name="local_dense_from_sparse_roundtrip")
