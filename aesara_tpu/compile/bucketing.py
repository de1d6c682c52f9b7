"""Driver-level dynamic-shape bucketing (SURVEY §7 hard part (a)).

The reference executes any concrete shape for a ``None`` dim with zero
recompilation — its per-node C thunks take runtime shapes (reference
``aesara/tensor/type.py:57`` filter + per-node thunk dispatch).  Under
XLA's static-shape model every distinct concrete shape of a ``None``-dim
input is a fresh trace + compile, so a varying-batch serving or
packed-sequence training loop would compile O(distinct shapes) programs.

This module is the driver's answer: **opt-in bucket padding** in
``Function.__call__``.

    config.shape_buckets = "pow2"          # next power of two
    config.shape_buckets = "8,16,64,256"   # explicit ladder

Policy (batch-dim contract)
---------------------------
* Only the LEADING dim (axis 0) of explicit inputs typed with
  ``shape[0] is None`` participates; all such inputs must share one
  runtime length ``n`` (the batch).  Calls where they disagree run
  unbucketed (one compile per shape, exactly as before).
* Inputs are padded from ``n`` up to the bucket ``b`` by **replicating
  the last row** — replicated rows stay in-distribution (no log(0)/NaN
  surprises in the pad region) and integer index inputs stay in-range.
* Every user output (and ``In(update=...)`` state) whose static leading
  dim is ``None`` and whose runtime leading dim came back as ``b`` is
  sliced to ``[:n]``.

This is EXACT for batch-rowwise graphs — each output row depends only on
the corresponding input row (per-example losses, decode steps, dense /
elemwise / rowwise-attention stacks).  It is NOT exact for graphs that
reduce over the batch inside the function (a mean over axis 0 would see
the replicated rows): keep outputs per-example and aggregate on the
host, which is also the memory-friendly pattern.  Shared-variable
updates are applied as computed — do not combine bucketing with
batch-reducing updates (e.g. accumulating per-batch statistics into a
shared); the docs and ``doc/performance.md`` spell this out.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

__all__ = ["parse_buckets", "bucket_for", "pad_leading"]

_parse_cache: dict = {}


def parse_buckets(spec: str) -> Union[None, str, Tuple[int, ...]]:
    """``"off"`` → None; ``"pow2"`` → "pow2"; ``"4,16,64"`` → (4, 16, 64)."""
    if spec in _parse_cache:
        return _parse_cache[spec]
    res = _parse_buckets_uncached(spec)
    _parse_cache[spec] = res
    return res


def _parse_buckets_uncached(spec: str) -> Union[None, str, Tuple[int, ...]]:
    spec = (spec or "off").strip()
    if spec in ("off", ""):
        return None
    if spec == "pow2":
        return "pow2"
    try:
        vals = tuple(sorted({int(tok) for tok in spec.split(",") if tok.strip()}))
    except ValueError:
        raise ValueError(
            f"config.shape_buckets must be 'off', 'pow2' or a comma list of "
            f"ints; got {spec!r}"
        ) from None
    if not vals or any(v <= 0 for v in vals):
        raise ValueError(f"shape_buckets sizes must be positive: {spec!r}")
    return vals


def bucket_for(n: int, policy: Union[str, Sequence[int]]) -> int:
    """Smallest bucket ≥ n.  pow2: next power of two (n=0 → no padding);
    explicit ladder: first rung ≥ n, or n itself above the ladder (the
    call then compiles its own shape — visible, not silently wrong)."""
    if n <= 0:
        return n
    if policy == "pow2":
        return 1 << (int(n) - 1).bit_length()
    for b in policy:
        if b >= n:
            return int(b)
    return n


def pad_leading(arr: np.ndarray, b: int) -> np.ndarray:
    """Pad axis 0 from len(arr) to ``b`` by replicating the last row."""
    n = arr.shape[0]
    if n == b:
        return arr
    reps = np.broadcast_to(arr[-1:], (b - n,) + arr.shape[1:])
    return np.concatenate([np.asarray(arr), reps], axis=0)
