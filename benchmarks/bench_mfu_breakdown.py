"""Model-scale MFU residual accounting (VERDICT r3 #7).

Measures WHERE the non-MXU time goes in the model-scale transformer
step (4L d=2048 ff=8192 B=8 T=2048 bf16) by timing ablated variants of
the same program on the real chip:

  full        — the production train step (grads + SGD update)
  fwd         — forward loss only (no grads, no updates)
  no_attn     — attention block replaced by identity (MLP+LN+residual
                train step): isolates the attention share
  mlp_matmul  — just the 4 MLP matmul pairs chained (the pure-MXU
                floor for the dominant FLOPs)

Prints a table with achieved TFLOP/s per variant and the residual
attribution.  Run on the real chip:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/bench_mfu_breakdown.py
"""

import time

import numpy as np

BF16_PEAK = 197.0


def _sync(x):
    return float(np.asarray(x.get_value().ravel()[0]))


def build(n_layers=4, batch=8, seqlen=2048, d_model=2048, n_heads=16,
          d_ff=8192, dtype="bfloat16", attention=True, train=True):
    import aesara_tpu as atp
    import aesara_tpu.tensor as at
    from aesara_tpu.models import TransformerEncoderLayer
    from aesara_tpu.models.optim import sgd
    from aesara_tpu.tensor import math as tm
    from aesara_tpu.compile.function import Out

    layers = [TransformerEncoderLayer(d_model, n_heads, d_ff, seed=i)
              for i in range(n_layers)]
    rng = np.random.default_rng(0)
    xv = (rng.normal(size=(batch, seqlen, d_model)) * 0.1).astype(dtype)
    x = atp.shared(xv, name="x")
    h = x
    from aesara_tpu.models.transformer import layer_norm
    for layer in layers:
        if attention:
            h = layer(h)
        else:
            # same layer minus the attention block (LN + FFN + residual,
            # the exact expression from TransformerEncoderLayer.__call__)
            z = layer_norm(h, layer.ln2_g, layer.ln2_b)
            ffn = tm.dot(tm.maximum(tm.dot(z, layer.w1) + layer.b1, 0.0),
                         layer.w2) + layer.b2
            h = h + ffn
    loss = tm.mean(tm.sqr(h))
    if attention:
        params = [p for layer in layers for p in layer.params]
    else:
        # only the FFN/LN2 params stay connected to the cost
        params = [p for layer in layers
                  for p in (layer.ln2_g, layer.ln2_b, layer.w1, layer.b1,
                            layer.w2, layer.b2)]
    if train:
        f = atp.function([], Out(loss, borrow=True),
                         updates=sgd(loss, params, lr=0.01), mode="FAST_RUN")
    else:
        f = atp.function([], Out(loss, borrow=True), mode="FAST_RUN")
    n_params = sum(int(np.prod(p.get_value().shape)) for p in params)
    return f, params, n_params, layers


def timeit(f, params, iters=10, sync_output=False):
    r = f()
    if sync_output:
        float(np.asarray(r))          # forward-only: params never change,
    else:                             # so sync on the returned loss
        _sync(params[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    if sync_output:
        float(np.asarray(r))
    else:
        _sync(params[0])
    return (time.perf_counter() - t0) / iters


def model_flops(n_params, batch, seqlen, n_layers, d_model, train=True,
                attention=True):
    toks = batch * seqlen
    mult = 3 if train else 1          # fwd + bwd(2x) vs fwd
    core = 2 * n_params * toks * mult
    attn = 0
    if attention:
        # 2 matmuls of 2*T*d per token per layer, fwd(+bwd 2x)
        attn = n_layers * mult * 2 * 2 * seqlen * d_model * toks
    return core + attn


def main():
    # chip/tunnel throughput fluctuates up to ~4x BETWEEN processes
    # (measured round 4); all variants are therefore timed inside ONE
    # process, the full step twice (first/last) with the min taken and
    # the spread reported as jitter
    B, T, D, L, FF = 8, 2048, 2048, 8, 8192
    kw = dict(n_layers=L, batch=B, seqlen=T, d_model=D, d_ff=FF)
    rows = []

    import gc

    # HBM: an L=8 train program + its activations is several GB; the
    # three variants cannot coexist on the chip.  Each variant is
    # therefore timed and FREED before the next is built.
    f_full, p_full, n_params, layers = build(train=True, attention=True,
                                             **kw)
    t_full_a = timeit(f_full, p_full)
    t_full_b = timeit(f_full, p_full)
    fl_full = model_flops(n_params, B, T, L, D)
    t_full = min(t_full_a, t_full_b)
    jitter = abs(t_full_a - t_full_b) / t_full
    del f_full, p_full, layers
    gc.collect()

    f, p, n_params_f, lyr = build(train=False, attention=True, **kw)
    t_fwd = timeit(f, p, sync_output=True)
    del f, p, lyr
    gc.collect()

    f, p, n_params_na, lyr = build(train=True, attention=False, **kw)
    t_na = timeit(f, p)
    del f, p, lyr
    gc.collect()

    rows.append(("full step", t_full, fl_full))
    rows.append(("forward only", t_fwd,
                 model_flops(n_params_f, B, T, L, D, train=False)))
    rows.append(("no attention", t_na,
                 model_flops(n_params_na, B, T, L, D, attention=False)))

    print(f"model-scale breakdown  {L}L d={D} ff={FF} B={B} T={T} bf16 "
          f"({n_params / 1e6:.0f}M params, full-step jitter {jitter:.1%})")
    for name, t, fl in rows:
        tf = fl / t / 1e12
        print(f"  {name:14s} {t * 1e3:7.1f} ms   {tf:6.1f} TFLOP/s   "
              f"MFU {tf / BF16_PEAK:6.1%}")

    t_attn = t_full - t_na       # attention fwd+bwd share
    t_bwd = t_full - t_fwd
    print(f"  attention share  {t_attn * 1e3:7.1f} ms  "
          f"({t_attn / t_full:5.1%} of step)")
    print(f"  backward+update  {t_bwd * 1e3:7.1f} ms  "
          f"({t_bwd / t_full:5.1%} of step)")


if __name__ == "__main__":
    main()
