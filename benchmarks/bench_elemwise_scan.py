"""Extra benchmarks: fused-elemwise GB/s and scan steps/s on real TPU."""
import time, json
import numpy as np
import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.scan.basic import scan


def sync(v):
    import jax.numpy as jnp
    float(jnp.sum(v)) if hasattr(v, "dtype") else None


# 1. fused elemwise chain: softmax-ish stress (BASELINE config 2)
N = 4096
x = atp.shared(np.random.default_rng(0).normal(size=(N, N)).astype("float32"), name="x")
y = atp.shared(np.random.default_rng(1).normal(size=(N, N)).astype("float32"), name="y")
out = at.exp(x) * at.math.sigmoid(y) + at.tanh(x * y) - y / (1.0 + at.sqr(x))
f = atp.function([], [], updates={x: out}, mode="FAST_RUN")
f(); sync(x.container.storage[0]); 
t0 = time.perf_counter()
iters = 20
for _ in range(iters):
    f()
sync(x.container.storage[0])
el = time.perf_counter() - t0
# bytes: read x,y write x = 3 * N*N*4 per iter (fused ideal)
gbs = 3 * N * N * 4 * iters / el / 1e9
print(json.dumps({"metric": "fused_elemwise_GBps", "value": round(gbs, 1), "elapsed": el}))

# 2. scan RNN steps/s (BASELINE config 4)
T, B, H = 256, 128, 256
X = atp.shared(np.random.default_rng(2).normal(size=(T, B, H)).astype("float32"), name="X")
W = atp.shared((np.random.default_rng(3).normal(size=(H, H)) * 0.1).astype("float32"), name="W")
h0 = at.zeros((B, H), dtype="float32")
h, _ = scan(lambda xt, htm1, W: at.tanh(at.dot(htm1, W) + xt),
            sequences=[X], outputs_info=[h0], non_sequences=[W])
loss = (h[-1] ** 2).sum()
g = atp.grad(loss, W)
step = atp.function([], loss, updates={W: W - 1e-4 * g}, mode="FAST_RUN")
step(); sync(W.container.storage[0])
t0 = time.perf_counter()
for _ in range(10):
    step()
sync(W.container.storage[0])
el = time.perf_counter() - t0
steps_per_s = 10 * T / el
print(json.dumps({"metric": "scan_rnn_bptt_steps_per_s", "value": round(steps_per_s, 0), "elapsed": el}))
