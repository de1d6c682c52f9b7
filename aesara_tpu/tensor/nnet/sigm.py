"""Reference import-path alias: ``tensor/nnet/sigm.py`` — the sigmoid
approximation family lives in ``nnet/basic.py`` here."""
from aesara_tpu.tensor.nnet.basic import (  # noqa: F401
    hard_sigmoid,
    sigmoid,
    ultra_fast_sigmoid,
)
