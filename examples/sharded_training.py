"""dp x tp sharded training through aesara_tpu.parallel: batch sharded
on "data", Megatron-style weight splits on "model"; XLA's GSPMD inserts
the ICI collectives.  Works on a CPU-simulated mesh too:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_training.py
"""

import numpy as np

import jax

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu import parallel as par
from aesara_tpu.models import TransformerEncoderLayer

n = len(jax.devices())
tp = 2 if n % 2 == 0 and n > 1 else 1
dp = n // tp
mesh = par.make_mesh({"data": dp, "model": tp})
print(f"mesh: data={dp} x model={tp} on {n} device(s)")

B, T, D = 4 * dp, 16, 8 * tp
model = TransformerEncoderLayer(D, tp, 16 * tp)
model.wq.type.sharding = (None, "model")
model.wk.type.sharding = (None, "model")
model.wv.type.sharding = (None, "model")
model.wo.type.sharding = ("model", None)
model.w1.type.sharding = (None, "model")
model.b1.type.sharding = ("model",)
model.w2.type.sharding = ("model", None)

x = at.tensor3("x")
cost = model.loss(x)
grads = atp.grad(cost, model.params)
updates = {p: p - np.float32(0.01) * g for p, g in zip(model.params, grads)}
step = par.pjit_function([x], cost, mesh=mesh,
                         in_specs=[("data", None, None)], updates=updates)

X = np.random.default_rng(3).normal(size=(B, T, D)).astype("float32")
l0 = float(np.asarray(step(X)))
l1 = float(np.asarray(step(X)))
print(f"sharded loss: {l0:.4f} -> {l1:.4f}")
assert l1 < l0
