"""Canonical graph keys for compiled-callable memoization.

The reference's ``cmodule_key`` (link/c/basic.py:1208) content-hashes the
graph + op versions to reuse compiled C modules; here the analogous key
memoizes lowered/jitted callables across Function instances with
identical graphs — identical structure never traces or compiles twice in
one process (the on-disk XLA cache handles cross-process reuse).
"""

from __future__ import annotations

import hashlib
from typing import Any

import numpy as np

from aesara_tpu.graph.ir import Constant


def fgraph_key(fgraph) -> str:
    """Stable content key for a FunctionGraph: toposorted ops (by props),
    variable types, constant payloads, and the wiring."""
    h = hashlib.sha256()
    index: dict = {}

    def vid(var) -> str:
        if var not in index:
            index[var] = f"v{len(index)}"
        return index[var]

    for i, inp in enumerate(fgraph.inputs):
        h.update(f"in{i}:{vid(inp)}:{inp.type}".encode())
    for node in fgraph.toposort():
        h.update(_op_key(node.op).encode())
        for inp in node.inputs:
            if isinstance(inp, Constant):
                h.update(b"const:")
                h.update(str(inp.type).encode())
                data = np.asarray(inp.data)
                h.update(data.tobytes() if data.size <= 65536 else str(data.shape).encode())
            else:
                h.update(vid(inp).encode())
        for out in node.outputs:
            h.update(f"->{vid(out)}:{out.type}".encode())
    for i, out in enumerate(fgraph.outputs):
        if isinstance(out, Constant):
            # a Constant appearing DIRECTLY as an output never passes
            # through the node-input hashing above — without its payload
            # two graphs differing only in such a constant collide
            # (review finding: update values crossed between functions)
            h.update(f"out{i}:const:{out.type}:".encode())
            data = np.asarray(out.data)
            h.update(data.tobytes() if data.size <= 65536
                     else str(data.shape).encode() + data.tobytes()[:65536])
        else:
            h.update(f"out{i}:{vid(out)}".encode())
    return h.hexdigest()


def _prop_key(v) -> str:
    from aesara_tpu.graph.op import Op

    if isinstance(v, Op):
        return _op_key(v)  # ops nested in props (Elemwise.scalar_op, ...)
    if isinstance(v, (tuple, list)):
        return "(" + ",".join(_prop_key(e) for e in v) + ")"
    return repr(v)


def _op_key(op) -> str:
    base = f"{type(op).__module__}.{type(op).__name__}"
    props = getattr(op, "__props__", None)
    if props:
        base += "(" + ",".join(_prop_key(getattr(op, p, None)) for p in props) + ")"
    if getattr(op, "info", None) is not None:
        base += repr(op.info)
    # inner-graph ops (Scan, OpFromGraph, scalar Composite) key by their
    # full inner structure — display names alias across distinct graphs
    inner = getattr(op, "fgraph", None)
    if inner is not None:
        base += fgraph_key(inner)
    return base
