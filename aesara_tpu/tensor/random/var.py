"""Shared-variable classes for PRNG state (reference
``aesara/tensor/random/var.py``: RandomGeneratorSharedVariable,
RandomStateSharedVariable + shared_constructor registrations).

The reference stores the mutable ``np.random.Generator`` itself; here the
state is a functional threefry key (uint32[2]).  Registering NumPy
Generator/RandomState values with ``shared()`` keeps the reference's
user idiom — ``rng = shared(np.random.default_rng(123))`` — by seeding
a key from the supplied generator.
"""

from __future__ import annotations

import copy

import numpy as np

from aesara_tpu.compile.sharedvalue import SharedVariable, shared_constructor
from aesara_tpu.tensor.random.op import default_rng, random_generator_type

__all__ = ["RandomTypeSharedVariable", "RandomGeneratorSharedVariable",
           "RandomStateSharedVariable"]


class RandomTypeSharedVariable(SharedVariable):
    """Shared PRNG state (threefry key)."""

    def __str__(self):
        return self.name or f"RNG({self.container!r})"


class RandomGeneratorSharedVariable(RandomTypeSharedVariable):
    pass


#: the reference's legacy RandomState flavor — same key representation here
RandomStateSharedVariable = RandomGeneratorSharedVariable


def _key_shared(key, name, strict, allow_downcast):
    return RandomGeneratorSharedVariable(
        random_generator_type, np.asarray(key, dtype=np.uint32),
        name=name, strict=strict, allow_downcast=allow_downcast,
    )


@shared_constructor.register(np.random.Generator)
def generator_shared_constructor(value, name=None, strict=False,
                                 allow_downcast=None, borrow=False, **kwargs):
    # derive a key from the generator WITHOUT mutating the caller's copy
    seed = int(copy.deepcopy(value).integers(0, 2**63 - 1))
    return _key_shared(default_rng(seed), name, strict, allow_downcast)


@shared_constructor.register(np.random.RandomState)
def randomstate_shared_constructor(value, name=None, strict=False,
                                   allow_downcast=None, borrow=False, **kwargs):
    seed = int(copy.deepcopy(value).randint(0, 2**31 - 1))
    return _key_shared(default_rng(seed), name, strict, allow_downcast)
