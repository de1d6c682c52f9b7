"""XLA lowering of the Scan op onto ``lax.scan``.

The reference runs scan's inner loop on the host through a Cython driver
(``scan/scan_perform.pyx``); here the entire loop is ONE device-side
``lax.scan``: tap buffers are rolling windows in the carry, sequences are
the scanned xs, nit-sot outputs are the ys, shared states ride in the
carry (SURVEY §2.11 item 2).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from aesara_tpu.link.jax.dispatch import jax_funcify
from aesara_tpu.scan.op import Scan


def _n_steps_is_trace_static(var) -> bool:
    """True when ``var``'s value is concrete at jit-trace time: it
    depends on runtime inputs only THROUGH shape extraction (static
    under jit) or constants.  A data-dependent n_steps (e.g. a plain
    iscalar input) would be a tracer, and ``lax.scan`` needs a static
    trip count — such graphs degrade to the py path like any other
    dynamic-shape form (reference runs scan's loop on the host
    unconditionally, so this matches its behavior there)."""
    from aesara_tpu.graph.ir import Constant
    from aesara_tpu.tensor.shape import Shape, Shape_i

    seen = set()
    stack = [var]
    while stack:
        v = stack.pop()
        if id(v) in seen:
            continue
        seen.add(id(v))
        if isinstance(v, Constant):
            continue
        if v.owner is None:
            return False              # runtime DATA feeds the count
        if isinstance(v.owner.op, (Shape, Shape_i)):
            continue                  # concrete under jit
        stack.extend(v.owner.inputs)
    return True


@jax_funcify.register(Scan)
def _jax_scan(op, node=None, for_jit=True, **kwargs):
    from aesara_tpu.link.jax.dispatch import NoLoweringError
    from aesara_tpu.link.jax.linker import fgraph_to_jax

    info = op.info
    if info.as_while:
        return _jax_while_scan(op)
    # data-dependent n_steps only matters under jit (it is a tracer
    # there); the eager path sees a concrete value, so rejecting at
    # funcify time would demote the WHOLE graph to py for nothing
    if for_jit and node is not None \
            and not _n_steps_is_trace_static(node.inputs[0]):
        raise NoLoweringError(
            "Scan with a data-dependent n_steps has a dynamic trip count "
            "and cannot lower to lax.scan; py path (pass a python int, "
            "derive n_steps from input shapes, or use a while-scan)"
        )
    body = fgraph_to_jax(op.fgraph)
    tap_depths = [-min(taps) for taps in info.mit_sot_taps]

    def scan_fn(n_steps, *operands):
        try:
            length = int(n_steps)
        except Exception as e:
            raise NotImplementedError(
                "Scan with a traced (data-dependent) n_steps cannot lower to "
                "XLA; make n_steps static or derive it from sequence shapes"
            ) from e
        pos = 0
        seqs = [jnp.asarray(s)[:length] for s in operands[pos: pos + info.n_seqs]]
        pos += info.n_seqs
        mit_inits = [jnp.asarray(v) for v in operands[pos: pos + info.n_mit_sot]]
        pos += info.n_mit_sot
        sit_inits = [jnp.asarray(v) for v in operands[pos: pos + info.n_sit_sot]]
        pos += info.n_sit_sot
        shared_inits = list(operands[pos: pos + info.n_shared])
        pos += info.n_shared
        non_seqs = list(operands[pos:])

        n_rec = info.n_mit_sot + info.n_sit_sot
        # a recurrent output is STACKED (rides ys, allocating the
        # (n_steps, ...) buffer) only when neither save-mem form applies;
        # final-only comes from the carry, tail-k from a k-deep ring kept
        # in the carry — the (n_steps, ...) buffer is never allocated
        stacked = [
            not info.is_final_only(i) and not info.tail_depth(i)
            for i in range(n_rec)
        ]

        def ring_init(rec_i, state_like):
            k = info.tail_depth(rec_i)
            row = jnp.asarray(state_like)
            return jnp.zeros((k,) + row.shape, row.dtype)

        rings = tuple(
            ring_init(i, mit_inits[i][0] if i < info.n_mit_sot
                      else sit_inits[i - info.n_mit_sot])
            for i in range(n_rec) if info.tail_depth(i)
        )

        # nit-sot rings have no init state to take a row shape from, so
        # the rows are abstract-eval'd from the body (free under jit:
        # static shapes, no FLOPs)
        nit_rings = ()
        if info.nit_tail_depths and any(info.nit_tail_depths):
            args0 = [s[0] for s in seqs]
            for w, taps, depth in zip(mit_inits, info.mit_sot_taps, tap_depths):
                for tap in taps:
                    args0.append(w[depth + tap])
            args0.extend(sit_inits)
            args0.extend(shared_inits)
            args0.extend(non_seqs)
            res_shapes = jax.eval_shape(lambda *a: tuple(body(*a)), *args0)
            nit_shapes = res_shapes[n_rec: n_rec + info.n_nit_sot]
            nit_rings = tuple(
                jnp.zeros((info.nit_tail_depth(i),) + tuple(sh.shape),
                          sh.dtype)
                for i, sh in enumerate(nit_shapes)
                if info.nit_tail_depth(i)
            )
        init_carry = (tuple(mit_inits), tuple(sit_inits),
                      tuple(shared_inits), rings, nit_rings)

        def step(carry, xs):
            mit_windows, sit_states, shared_states, rs, nit_rs = carry
            args = list(xs) if xs is not None else []
            for w, taps, depth in zip(mit_windows, info.mit_sot_taps, tap_depths):
                for tap in taps:
                    args.append(w[depth + tap])
            args.extend(sit_states)
            args.extend(shared_states)
            args.extend(non_seqs)
            res = body(*args)
            idx = 0
            new_windows = []
            rec_vals = []
            for w in mit_windows:
                v = res[idx]
                new_windows.append(
                    jnp.concatenate([w[1:], jnp.asarray(v)[None]], axis=0)
                )
                rec_vals.append(v)
                idx += 1
            sit_vals = list(res[idx: idx + info.n_sit_sot])
            rec_vals.extend(sit_vals)
            idx += info.n_sit_sot
            nit_vals = list(res[idx: idx + info.n_nit_sot])
            idx += info.n_nit_sot
            new_shared = list(res[idx: idx + info.n_shared])
            new_rings = []
            r_it = iter(rs)
            for i in range(n_rec):
                if info.tail_depth(i):
                    r = next(r_it)
                    new_rings.append(jnp.concatenate(
                        [r[1:], jnp.asarray(rec_vals[i])[None]], axis=0))
            new_nit_rings = []
            nr_it = iter(nit_rs)
            for i in range(info.n_nit_sot):
                if info.nit_tail_depth(i):
                    r = next(nr_it)
                    new_nit_rings.append(jnp.concatenate(
                        [r[1:], jnp.asarray(nit_vals[i])[None]], axis=0))
            new_carry = (tuple(new_windows), tuple(sit_vals),
                         tuple(new_shared), tuple(new_rings),
                         tuple(new_nit_rings))
            ys_vals = tuple(
                v for i, v in enumerate(rec_vals) if stacked[i]
            ) + tuple(
                v for i, v in enumerate(nit_vals)
                if not info.nit_tail_depth(i)
            )
            return new_carry, ys_vals

        (final_windows, final_sit, final_shared, final_rings,
         final_nit_rings), ys = lax.scan(
            step, init_carry, tuple(seqs) if seqs else None, length=length
        )
        ys_it = iter(ys)
        ring_it = iter(final_rings)
        nit_ring_it = iter(final_nit_rings)
        outs = []
        for i in range(n_rec):
            if stacked[i]:
                outs.append(next(ys_it))
            elif info.tail_depth(i):
                outs.append(next(ring_it))
            elif i < info.n_mit_sot:
                outs.append(final_windows[i][-1])
            else:
                outs.append(final_sit[i - info.n_mit_sot])
        for i in range(info.n_nit_sot):
            if info.nit_tail_depth(i):
                outs.append(next(nit_ring_it))
            else:
                outs.append(next(ys_it))
        return tuple(outs) + tuple(final_shared)

    return scan_fn


def _jax_while_scan(op):
    """while-Scan → ``lax.while_loop``: dynamic trip count with STATIC
    state shapes — XLA-lowerable iff every recurrent output is consumed
    final-value-only and there are no nit-sot stacks (``scan_save_mem``
    rewrites last-value usage into exactly this form).  Stacked while
    outputs are inherently dynamic-length; those stay on the py path
    (reference semantics: truncate at the triggering step,
    ``scan/op.py`` perform)."""
    from aesara_tpu.link.jax.linker import fgraph_to_jax

    info = op.info
    n_rec = info.n_mit_sot + info.n_sit_sot
    if info.n_nit_sot or not all(info.is_final_only(i) for i in range(n_rec)):
        raise NotImplementedError(
            "while-Scan with stacked (per-step) outputs has a data-dependent "
            "output length and cannot lower to XLA; keep only final values "
            "(out[-1], handled by scan_save_mem), pass a bound via "
            "scan(..., n_steps=bound, padded_while=True) for static-shape "
            "padded stacks + validity mask, or run in py mode"
        )
    body = fgraph_to_jax(op.fgraph)
    tap_depths = [-min(taps) for taps in info.mit_sot_taps]

    def while_fn(n_steps, *operands):
        pos = 0
        seqs = [jnp.asarray(s) for s in operands[pos: pos + info.n_seqs]]
        pos += info.n_seqs
        mit_windows = [jnp.asarray(v) for v in operands[pos: pos + info.n_mit_sot]]
        pos += info.n_mit_sot
        sit_states = [jnp.asarray(v) for v in operands[pos: pos + info.n_sit_sot]]
        pos += info.n_sit_sot
        shared_states = list(operands[pos: pos + info.n_shared])
        pos += info.n_shared
        non_seqs = list(operands[pos:])
        bound = jnp.asarray(n_steps, dtype=jnp.int32)

        def cond(state):
            t, done, *_ = state
            return jnp.logical_and(t < bound, jnp.logical_not(done))

        def step(state):
            t, _done, mit_ws, sits, shareds = state
            args = [lax.dynamic_index_in_dim(s, t, axis=0, keepdims=False)
                    for s in seqs]
            for w, taps, depth in zip(mit_ws, info.mit_sot_taps, tap_depths):
                for tap in taps:
                    args.append(w[depth + tap])
            args.extend(sits)
            args.extend(shareds)
            args.extend(non_seqs)
            res = body(*args)
            idx = 0
            new_ws = []
            for w in mit_ws:
                new_ws.append(jnp.concatenate(
                    [w[1:], jnp.asarray(res[idx])[None]], axis=0))
                idx += 1
            new_sits = tuple(res[idx: idx + info.n_sit_sot])
            idx += info.n_sit_sot
            new_shareds = tuple(res[idx: idx + info.n_shared])
            idx += info.n_shared
            done = jnp.asarray(res[idx], dtype=bool).reshape(())
            return (t + 1, done, tuple(new_ws), new_sits, new_shareds)

        init = (jnp.int32(0), jnp.asarray(False),
                tuple(mit_windows), tuple(sit_states), tuple(shared_states))
        _t, _done, fin_ws, fin_sits, fin_shareds = lax.while_loop(cond, step, init)
        outs = [w[-1] for w in fin_ws] + list(fin_sits)
        return tuple(outs) + tuple(fin_shareds)

    return while_fn
