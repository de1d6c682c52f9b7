"""Symbolic model builders — the framework's model families, expressed
entirely in the aesara_tpu graph language so every model compiles to one
XLA program (and shards through ``aesara_tpu.parallel``).

The reference ships these as tutorial code (logistic regression, MLP,
conv net, RNN — ``doc/tutorial`` of aesara-devs/aesara); here they are a
first-class package so the flagship train steps are importable,
testable, and benchmarkable.
"""

from aesara_tpu.models.optim import (
    accumulate_gradients, adam, adamw, adamw_from_grads,
    clip_by_global_norm, ema_updates, momentum, rmsprop,
    scaled_loss_updates, sgd, warmup_cosine,
)
from aesara_tpu.models.linear import LinearRegression, LogisticRegression
from aesara_tpu.models.mlp import MLP
from aesara_tpu.models.convnet import ConvNet
from aesara_tpu.models.rnn import GRU, LSTM, ElmanRNN
from aesara_tpu.models.transformer import TransformerEncoderLayer
from aesara_tpu.models.decoder import DecoderLM, TransformerDecoderLayer
from aesara_tpu.models.checkpoint import load_checkpoint, save_checkpoint, state_shareds
from aesara_tpu.models.quant import quantize_decoder_int8

__all__ = [
    "DecoderLM", "TransformerDecoderLayer",
    "adamw", "adamw_from_grads", "clip_by_global_norm",
    "scaled_loss_updates", "warmup_cosine",
    "accumulate_gradients", "ema_updates",
    "save_checkpoint", "load_checkpoint", "state_shareds",
    "quantize_decoder_int8",
    "sgd", "momentum", "rmsprop", "adam",
    "LinearRegression", "LogisticRegression", "MLP", "ConvNet",
    "ElmanRNN", "LSTM", "GRU", "TransformerEncoderLayer",
]
