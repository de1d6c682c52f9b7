"""Deprecated-name alias: ``tensor/nnet/opt.py`` →
``tensor/nnet/rewriting.py`` (mirrors the reference's shim)."""
from aesara_tpu.tensor.nnet.rewriting import *  # noqa: F401,F403
