"""Every parallelism axis in one script (run on 8 virtual CPU devices):

  dp/tp — GSPMD pjit training step with Megatron-style weight shards
  sp/cp — ring attention over a context-parallel axis
  pp    — GPipe microbatch schedule from the framework's collectives
  ep    — top-1 switch-MoE with experts sharded over the mesh

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/parallelism_zoo.py
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

# force CPU before first backend use (set AESARA_TPU_EXAMPLE_TPU=1 to
# run on real chips instead)
if not os.environ.get("AESARA_TPU_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

import aesara_tpu.tensor as at
from aesara_tpu import parallel as par
from aesara_tpu.parallel.attention import ring_attention
from aesara_tpu.parallel.moe import switch_moe
from aesara_tpu.parallel.pipeline import gpipe

rng = np.random.default_rng(0)
n = len(jax.devices())
print(f"{n} devices")

# --- sp/cp: ring attention ----------------------------------------------------
mesh = par.make_mesh({"cp": n})
q = at.tensor3("q", dtype="float32")
out = ring_attention(q, q, q, "cp", causal=True)
f = par.shard_map_function([q, q.clone(), q.clone()], out, mesh=mesh,
                           in_specs=[(None, "cp", None)] * 3,
                           out_specs=[(None, "cp", None)])
qv = rng.normal(size=(4, 8 * n, 16)).astype("float32")
print("ring attention:", np.asarray(f(qv, qv, qv)).shape)

# --- pp: GPipe ----------------------------------------------------------------
S = 4 if n % 4 == 0 else 2
mesh = par.make_mesh({"pp": S, "dp": -1})
xs = at.tensor3("xs", dtype="float32")
wp = at.tensor3("wp", dtype="float32")
pipe = par.shard_map_function(
    [xs, wp], gpipe(xs, lambda h: at.tanh(at.dot(h, wp[0])), "pp", S, 6),
    mesh=mesh, in_specs=[None, ("pp", None, None)], out_specs=[None])
print("gpipe:", np.asarray(pipe(
    rng.normal(size=(6, 4, 32)).astype("float32"),
    (rng.normal(size=(S, 32, 32)) / np.sqrt(32)).astype("float32"))).shape)

# --- ep: switch-MoE -----------------------------------------------------------
E = 4 if n % 4 == 0 else 2
mesh = par.make_mesh({"ep": E, "dp": -1})
xm = at.matrix("xm", dtype="float32")
wr = at.matrix("wr", dtype="float32")
we = at.tensor3("we", dtype="float32")
moe = par.shard_map_function(
    [xm, wr, we],
    switch_moe(xm, at.dot(xm, wr), lambda t: at.tanh(at.dot(t, we[0])),
               "ep", n_experts=E, capacity=32),
    mesh=mesh, in_specs=[None, None, ("ep", None, None)], out_specs=[None])
print("switch_moe:", np.asarray(moe(
    rng.normal(size=(32, 16)).astype("float32"),
    rng.normal(size=(16, E)).astype("float32"),
    (rng.normal(size=(E, 16, 16)) / 4).astype("float32"))).shape)

print("see examples/sharded_training.py for the dp/tp pjit training step")
