from aesara_tpu.tensor.random import basic
from aesara_tpu.tensor.random.basic import *  # noqa: F401,F403
from aesara_tpu.tensor.random.op import (
    RandomGeneratorType,
    RandomStateType,
    RandomVariable,
    default_rng,
    random_generator_type,
)
from aesara_tpu.tensor.random.utils import RandomStream, RandomStreams
from aesara_tpu.tensor.random.op import RandomStateType as RandomState  # noqa: F401
from aesara_tpu.tensor.random.var import (  # noqa: F401  (registers shared ctors)
    RandomGeneratorSharedVariable,
    RandomStateSharedVariable,
    RandomTypeSharedVariable,
)
