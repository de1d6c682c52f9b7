"""Import-path parity (reference ``aesara/tensor/signal/pool.py``)."""

from aesara_tpu.tensor.nnet.pool import Pool, PoolGrad, max_pool_2d, pool_2d  # noqa: F401
