"""Training checkpoints: save/restore model params + optimizer state.

The reference checkpoints by pickling compiled Functions
(``misc/pkl_utils``); that remains available.  This module adds the
production pattern — a plain ``.npz`` of every shared variable's value,
keyed stably — so checkpoints survive code changes that would break a
pickle, transfer between hosts, and restore into freshly-built graphs.

Optimizer state is captured from an ``updates`` list (every shared
TARGET of the update pairs — Adam moments, step counters, loss scales —
plus the params themselves).
"""

from __future__ import annotations

import numpy as np

from aesara_tpu.compile.sharedvalue import SharedVariable

__all__ = ["state_shareds", "save_checkpoint", "load_checkpoint"]


def state_shareds(params, updates=None):
    """The full training state: ``params`` + every shared update target
    in ``updates`` (deduplicated, order-stable)."""
    seen = []
    for p in params:
        if p not in seen:
            seen.append(p)
    for pair in updates or ():
        var = pair[0] if isinstance(pair, (tuple, list)) else pair
        if isinstance(var, SharedVariable) and var not in seen:
            seen.append(var)
    return seen


def _keys(shareds):
    """Stable unique keys: ``<idx>:<name>`` — the index pins order, the
    name makes archives human-readable and mismatches diagnosable."""
    return [f"{i}:{sv.name or 'shared'}" for i, sv in enumerate(shareds)]


def _npz_path(path):
    """np.savez appends '.npz' on write but np.load does not on read —
    normalize so save/load agree on suffix-less paths."""
    path = str(path)
    return path if path.endswith(".npz") else path + ".npz"


def _savable(arr):
    """ml_dtypes arrays (bfloat16/f8) serialize as raw void and cannot
    be restored; store them as float32 (bf16→f32 is exact, and load
    casts back to the variable's dtype)."""
    arr = np.asarray(arr)
    if arr.dtype.kind == "V" or str(arr.dtype) in ("bfloat16", "float8_e4m3",
                                                   "float8_e5m2"):
        return arr.astype("float32")
    return arr


def save_checkpoint(path, params, updates=None, extra=None):
    """Write an ``.npz`` with every state shared's value.  ``extra`` is
    an optional dict of additional arrays (e.g. the data-loader
    position)."""
    shareds = state_shareds(params, updates)
    arrays = {
        k: _savable(sv.get_value())
        for k, sv in zip(_keys(shareds), shareds)
    }
    for k, v in (extra or {}).items():
        arrays[f"extra:{k}"] = _savable(v)
    np.savez(_npz_path(path), **arrays)


def load_checkpoint(path, params, updates=None, strict=True):
    """Restore values saved by :func:`save_checkpoint` into the SAME
    graph structure (params/updates built the same way).  Returns the
    dict of ``extra`` arrays.  With ``strict`` (default) a count or
    shape mismatch raises; otherwise missing entries are skipped."""
    shareds = state_shareds(params, updates)
    keys = _keys(shareds)
    with np.load(_npz_path(path), allow_pickle=False) as archive:
        saved = {k: archive[k] for k in archive.files}
    n_state = len([k for k in saved if not k.startswith("extra:")])
    if strict and n_state != len(shareds):
        raise ValueError(
            f"checkpoint has {n_state} state entries, this graph has "
            f"{len(shareds)} — was the optimizer/updates list built "
            "differently?"
        )
    for k, sv in zip(keys, shareds):
        if k not in saved:
            if strict:
                raise KeyError(f"checkpoint missing {k!r}")
            continue
        val = saved[k]
        cur = sv.get_value(borrow=True)
        if strict and np.shape(cur) != val.shape:
            raise ValueError(
                f"checkpoint entry {k!r} has shape {val.shape}, "
                f"variable has {np.shape(cur)}"
            )
        cur_dtype = np.asarray(cur).dtype
        if cur_dtype.kind == "V":
            # ml_dtypes values round-trip through numpy as void; restore
            # to the variable's DECLARED dtype (bf16/f8_e4m3/f8_e5m2/…),
            # not a hardcoded bfloat16
            import ml_dtypes

            cur_dtype = np.dtype(getattr(ml_dtypes, sv.type.dtype))
        sv.set_value(val.astype(cur_dtype, copy=False))
    return {k[len("extra:"):]: v for k, v in saved.items()
            if k.startswith("extra:")}
