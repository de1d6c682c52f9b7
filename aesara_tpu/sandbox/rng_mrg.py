"""MRG31k3p RandomStream shim (reference ``aesara/sandbox/rng_mrg.py:715``).

The reference's multi-stream MRG generator existed because RandomState
could not be split functionally; threefry keys make every stream a
split, so ``MRG_RandomStream`` is the standard RandomStream with the
reference's API (normal/uniform/multinomial/choice signatures)."""

from __future__ import annotations

import numpy as np

from aesara_tpu.tensor.random.utils import RandomStream


class MRG_RandomStream(RandomStream):
    """API-parity subclass (reference MRG_RandomStream)."""

    def __init__(self, seed: int = 12345):
        super().__init__(seed=seed)

    def multinomial(self, size=None, n=1, pvals=None, **kwargs):
        if pvals is None:
            raise ValueError("pvals required")
        return super().multinomial(n, pvals, size=size, **kwargs)

    def multinomial_wo_replacement(self, *args, **kwargs):
        raise NotImplementedError(
            "sampling without replacement lands with the choice(replace=False) work"
        )

    def get_substream_rngs(self, n_streams):
        import jax.random as jr

        key = jr.wrap_key_data(self._master)
        return [
            np.asarray(jr.key_data(jr.fold_in(key, i)), dtype=np.uint32)
            for i in range(n_streams)
        ]


MRG_RandomStreams = MRG_RandomStream
