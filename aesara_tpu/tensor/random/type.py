"""Reference import-path alias: ``tensor/random/type.py`` — the RNG
types live in ``random/op.py`` here (threefry key types)."""
from aesara_tpu.tensor.random.op import (  # noqa: F401
    RandomGeneratorType,
    RandomStateType,
    random_generator_type,
)
