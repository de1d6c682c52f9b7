"""Mesh/sharding parallelism and collective communication.

The reference's complete distribution story is point-to-point MPI ops +
a send-early/wait-late scheduler (``aesara/tensor/io.py:96-300``,
``graph/sched.py:253`` — SURVEY §2.12).  The TPU-native replacement is
structural:

- ``Mesh``/``PartitionSpec`` (re-exported from jax.sharding) describe the
  device grid; ``TensorType.sharding`` carries specs on the IR;
- **automatic (GSPMD) path**: ``pjit_function`` compiles a graph with
  in/out shardings — XLA inserts the collectives over ICI (the
  "How to Scale Your Model" recipe: pick a mesh, annotate, let XLA
  place psum/all-gather);
- **explicit path**: collective Ops (``psum``/``all_gather``/
  ``ppermute``/``all_to_all``/...) as first-class graph ops compiled
  through ``shard_map_function`` — SPMD code with hand-placed
  collectives, replacing the reference's MPISend/MPIRecv;
- the MPI op names (``send``/``recv``/``isend``/``irecv``) are provided
  as ppermute-based shims for API parity.
"""

from jax.sharding import Mesh, NamedSharding, PartitionSpec

from aesara_tpu.parallel.ops import (
    all_gather,
    all_to_all,
    axis_index,
    pmax,
    pmean,
    pmin,
    ppermute,
    psum,
    recv,
    reduce_scatter,
    send,
    shard_constraint,
)
from aesara_tpu.parallel.shard import (
    current_mesh,
    fsdp_shard,
    get_mesh,
    make_mesh,
    pjit_function,
    set_mesh,
    shard_map_function,
    use_mesh,
)
from aesara_tpu.parallel.attention import (
    RingAttention,
    UlyssesAttention,
    attention_to_ring,
    attention_to_ulysses,
    ring_attention,
    ulysses_attention,
)
from aesara_tpu.parallel.pipeline import gpipe
from aesara_tpu.parallel.moe import switch_moe
