"""Block-sparse dot ops (reference ``aesara/tensor/nnet/blocksparse.py``:
SparseBlockGemv/SparseBlockOuter, 272 LoC) — gather/batched-matmul
compositions; XLA turns them into fused gathers + MXU dots."""

from __future__ import annotations

from aesara_tpu.tensor.basic import as_tensor_variable
import aesara_tpu.tensor.math as tm


def sparse_block_dot(W, h, inputIdx, b, outputIdx):
    """o[b, j] = b[outputIdx[b, j]] + sum_i h[b, i] @ W[inputIdx[b, i],
    outputIdx[b, j]] (reference sparse_block_dot semantics).

    W: (iBlocks, oBlocks, iSize, oSize); h: (batch, iWin, iSize);
    inputIdx: (batch, iWin); b: (oBlocks, oSize); outputIdx: (batch, oWin).
    Returns (batch, oWin, oSize).
    """
    W = as_tensor_variable(W)
    h = as_tensor_variable(h)
    b = as_tensor_variable(b)
    inputIdx = as_tensor_variable(inputIdx)
    outputIdx = as_tensor_variable(outputIdx)
    # gather blocks: W[inputIdx][:, :, outputIdx] requires per-batch fancy
    # indexing; express as W[inputIdx[b,i], outputIdx[b,j]] via two gathers
    Wi = W[inputIdx]                     # (batch, iWin, oBlocks, iSize, oSize)
    # per-batch gather of output blocks
    batch_idx = _batch_arange(outputIdx)
    Wio = Wi[batch_idx, :, outputIdx]    # (batch, oWin, iWin, iSize, oSize)
    # contract h over (iWin, iSize)
    prod = tm.mul(
        Wio,
        h.dimshuffle(0, "x", 1, 2, "x"),
    )
    contracted = tm.sum(prod, axis=(2, 3))  # (batch, oWin, oSize)
    return contracted + b[outputIdx]


def _batch_arange(idx2d):
    from aesara_tpu.tensor.basic import arange
    from aesara_tpu.tensor.shape import shape as tshape, shape_padright

    n = tshape(idx2d)[0]
    return shape_padright(arange(n), 1)


sparse_block_gemv = sparse_block_dot
