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
# NOTE: at N=4096 each call pays the ~0.8 ms axon-tunnel dispatch floor, so
# this measures the user-visible per-call path, NOT chip bandwidth.  The
# honest HBM number is bench_hbm_roofline.py (slope-timed in-program loop:
# 664 GB/s = 94% of the measured raw ceiling).
print(json.dumps({"metric": "elemwise_dispatch_path_GBps_4096", "value": round(gbs, 1),
                  "elapsed": el, "note": "dispatch-bound; see bench_hbm_roofline"}))

# 2. scan RNN steps/s (BASELINE config 4)
T, B, H = 256, 128, 256
X = atp.shared(np.random.default_rng(2).normal(size=(T, B, H)).astype("float32"), name="X")
W = atp.shared((np.random.default_rng(3).normal(size=(H, H)) * 0.1).astype("float32"), name="W")
h0 = at.zeros((B, H), dtype="float32")
h, _ = scan(lambda xt, htm1, W: at.tanh(at.dot(htm1, W) + xt),
            sequences=[X], outputs_info=[h0], non_sequences=[W])
loss = (h[-1] ** 2).sum()
g = atp.grad(loss, W)

# fetching the scalar loss per call costs a full tunnel round-trip
# (~27 ms here); Out(borrow=True) returns the device array without the
# blocking host copy — the production pattern for train loops
from aesara_tpu.compile.io import Out

def timed(step_fn, n=10):
    step_fn(); sync(W.container.storage[0])
    t0 = time.perf_counter()
    for _ in range(n):
        step_fn()
    sync(W.container.storage[0])
    return time.perf_counter() - t0

step_fetch = atp.function([], loss, updates={W: W - 1e-4 * g}, mode="FAST_RUN")
step_borrow = atp.function([], Out(loss, borrow=True),
                           updates={W: W - 1e-4 * g}, mode="FAST_RUN")
el = timed(step_fetch)
el_b = timed(step_borrow)
steps_per_s = 10 * T / el_b
print(json.dumps({"metric": "scan_rnn_bptt_steps_per_s", "value": round(steps_per_s, 0),
                  "elapsed": el_b,
                  "fetching_loss_per_call_steps_per_s": round(10 * T / el, 0)}))

# 3. framework-overhead proof: the SAME RNN BPTT step hand-written in
# raw jax (lax.scan + jax.grad + jit, donated W).  If the framework's
# symbolic-scan + reverse-scan gradient compiles to the same XLA
# program shape, the ratio should be ~1.0.
import jax
import jax.numpy as jnp


def raw_step(Wv, Xv):
    def loss_fn(Wv):
        def cell(h, xt):
            h2 = jnp.tanh(jnp.dot(h, Wv) + xt)
            return h2, None
        hT, _ = jax.lax.scan(cell, jnp.zeros((B, H), jnp.float32), Xv)
        return (hT ** 2).sum()
    l, gW = jax.value_and_grad(loss_fn)(Wv)
    return l, Wv - 1e-4 * gW


raw = jax.jit(raw_step, donate_argnums=(0,))
Wv = jnp.asarray(W.get_value())
Xv = jnp.asarray(X.get_value())
l, Wv = raw(Wv, Xv); float(l)
t0 = time.perf_counter()
for _ in range(10):
    l, Wv = raw(Wv, Xv)
float(l)
el_raw = time.perf_counter() - t0
raw_steps_per_s = 10 * T / el_raw
print(json.dumps({
    "metric": "scan_rnn_bptt_raw_jax_steps_per_s",
    "value": round(raw_steps_per_s, 0),
    "framework_vs_raw": round(steps_per_s / raw_steps_per_s, 3),
}))
