"""Signal-processing ops (reference ``aesara/tensor/signal/``)."""

from aesara_tpu.tensor.signal import pool
