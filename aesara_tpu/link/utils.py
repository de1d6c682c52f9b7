"""Reference import-path alias: ``link/utils.py`` — storage plumbing
lives in ``link/basic.py`` here; the reference's ``fgraph_to_python``
JIT-emitter role is ``link/jax/linker.fgraph_to_jax``."""
from aesara_tpu.link.basic import (  # noqa: F401
    Container,
    gc_helper,
    map_storage,
    raise_with_op,
    streamline,
)
from aesara_tpu.link.jax.linker import fgraph_to_jax as fgraph_to_python  # noqa: F401
