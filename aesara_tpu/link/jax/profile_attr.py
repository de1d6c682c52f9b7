"""Per-Apply attribution of the compiled XLA program.

The reference's ProfileStats gives per-Apply wall time on its production
backend (``/root/reference/aesara/compile/profiling.py:185``).  Under
whole-graph XLA a per-node host timer is meaningless — the program is
one fused device computation — so attribution goes through the compiler
instead:

1. ``fgraph_to_jax`` wraps every node's lowering in
   ``jax.named_scope("n<idx>.<Op>")`` (linker.py), which XLA carries
   into each HLO instruction's ``op_name`` metadata — surviving fusion
   (a fused computation's constituent instructions keep their scopes).
2. ``attribute()`` re-lowers the jitted program, walks the optimized
   HLO text, prices every instruction with a roofline model
   (``max(flops/peak_flops, bytes/peak_bw)``), and aggregates per graph
   node.  A fusion is priced by ITS operand/output traffic (the
   memory-bound truth of elemwise fusions) and attributed jointly to
   the set of Apply nodes fused into it.

The model prices are for RANKING and SHARES, not absolute wall time;
``named_fraction`` reports how much of the modeled device time maps to
named graph nodes (the rest is glue XLA introduced: copies, tuples,
layout changes).
"""

from __future__ import annotations

import os
import re
from collections import defaultdict

# v5e defaults; override via env for other parts (shares barely move)
PEAK_FLOPS = float(os.environ.get("AESARA_TPU_PEAK_F32_FLOPS", 4.9e13))
PEAK_BW = float(os.environ.get("AESARA_TPU_PEAK_HBM_BPS", 8.19e11))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "s4": 1, "u4": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^=]*\)|\S+)\s+([a-z\-]+)"
    r"(?:\.\d+)?\(")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_SCOPE_RE = re.compile(r"(n\d+\.[A-Za-z0-9_.\-]+)")
_CALLS_RE = re.compile(r"(?:calls|to_apply|body)=%?([\w.\-]+)")
_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->", re.M)


def _shape_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _dot_flops(line: str, name_dims: dict) -> float:
    """2 * prod(out dims) * prod(contracting dim sizes).  The lhs dims
    come from the inline operand type when printed, else from the
    module-wide name->dims map (CPU HLO prints bare %refs)."""
    after = line.split("dot(", 1)
    if len(after) != 2:
        return 0.0
    mc = re.search(r"lhs_contracting_dims=\{([0-9,]*)\}", line)
    mo = _SHAPE_RE.search(line)  # result type is first on the line
    if not (mc and mo):
        return 0.0
    inline = _SHAPE_RE.findall(after[1].split(")", 1)[0])
    if inline:
        lhs_dims = [int(d) for d in inline[0][1].split(",") if d]
    else:
        refs = re.findall(r"%([\w.\-]+)", after[1])
        lhs_dims = name_dims.get(refs[0], []) if refs else []
    out_elems = 1
    for d in mo.group(2).split(","):
        if d:
            out_elems *= int(d)
    k = 1
    for ci in mc.group(1).split(","):
        if ci and int(ci) < len(lhs_dims):
            k *= lhs_dims[int(ci)]
    return 2.0 * out_elems * k


def parse_hlo(hlo_text: str):
    """-> (entries, computations, name_dims) where entries are
    per-instruction dicts of the ENTRY computation, computations maps
    name -> instruction dicts (fusion/while/call bodies), and name_dims
    maps every instruction name to its result dims (module-wide)."""
    comps: dict = {}
    name_dims: dict = {}
    cur = None
    entry_name = None
    for raw in hlo_text.splitlines():
        line = raw.rstrip()
        header = _COMP_RE.match(line.strip()) if line.strip().endswith("{") \
            else None
        if header and ("->" in line):
            cur = header.group(1)
            comps[cur] = []
            if line.strip().startswith("ENTRY"):
                entry_name = cur
            continue
        if line.strip() == "}":
            continue
        m = _INSTR_RE.match(line)
        if not m or cur is None:
            continue
        name, type_str, opcode = m.groups()
        mm = _OPNAME_RE.search(line)
        op_name = mm.group(1) if mm else ""
        scopes = tuple(dict.fromkeys(_SCOPE_RE.findall(op_name)))
        calls = _CALLS_RE.search(line)
        sm = _SHAPE_RE.search(type_str)
        if sm:
            name_dims[name] = [int(d) for d in sm.group(2).split(",") if d]
        comps[cur].append({
            "name": name,
            "opcode": opcode,
            "out_bytes": _shape_bytes(type_str),
            "line": line,
            "scopes": scopes,
            "calls": calls.group(1) if calls else None,
        })
    return comps.get(entry_name, []), comps, name_dims


_GLUE = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "copy", "copy-start", "copy-done", "after-all", "custom-call",
}


def _price(instr, comps, name_to_bytes, name_dims):
    """(flops, bytes, scopes) roofline inputs for one ENTRY instruction;
    fusion/call/while bodies contribute their dots' flops and their
    constituent scopes (one level deep)."""
    opc = instr["opcode"]
    out_b = instr["out_bytes"]
    # operand traffic: sum of referenced instruction outputs
    in_b = 0
    for ref in re.findall(r"%([\w.\-]+)", instr["line"].split("=", 1)[1]):
        in_b += name_to_bytes.get(ref, 0)
    flops = 0.0
    scopes = list(instr["scopes"])
    if opc == "dot":
        flops = _dot_flops(instr["line"], name_dims)
    elif opc in ("fusion", "call", "while") and instr["calls"] in comps:
        for sub in comps[instr["calls"]]:
            if sub["opcode"] == "dot":
                flops += _dot_flops(sub["line"], name_dims)
            for s in sub["scopes"]:
                if s not in scopes:
                    scopes.append(s)
    return flops, in_b + out_b, tuple(scopes)


def attribute(fn_or_thunk, fgraph=None):
    """Attribution report for a jax-linker Function (or its thunk).

    Call the function at least once first (the thunk records example
    args).  Returns {rows, named_fraction, total_model_s, glue_model_s};
    rows are sorted by modeled time, each {scopes, nodes, opcode, flops,
    bytes, model_s, share}."""
    thunk = getattr(fn_or_thunk, "fn", fn_or_thunk)
    jit_fn = getattr(thunk, "jit_fn", None)
    args = getattr(thunk, "last_args", None)
    if jit_fn is None or args is None:
        raise TypeError(
            "attribute() needs a jax-linker Function that has been "
            "called at least once (profile attribution re-lowers the "
            "jitted program with the recorded example args)"
        )
    hlo = jit_fn.lower(*args).compile().as_text()
    entry, comps, name_dims = parse_hlo(hlo)
    name_to_bytes = {i["name"]: i["out_bytes"] for i in entry}

    if fgraph is None:
        fg = getattr(fn_or_thunk, "maker", None)
        fgraph = getattr(fg, "fgraph", None)
    order = fgraph.toposort() if fgraph is not None else None

    agg = defaultdict(lambda: {"flops": 0.0, "bytes": 0, "opcodes": set()})
    glue_s = 0.0
    total_s = 0.0
    for instr in entry:
        if instr["opcode"] in _GLUE or instr["opcode"] == "parameter":
            continue
        flops, byts, scopes = _price(instr, comps, name_to_bytes, name_dims)
        t = max(flops / PEAK_FLOPS, byts / PEAK_BW)
        total_s += t
        if not scopes:
            glue_s += t
            continue
        key = tuple(sorted(scopes, key=lambda s: int(s[1:].split(".")[0])))
        agg[key]["flops"] += flops
        agg[key]["bytes"] += byts
        agg[key]["opcodes"].add(instr["opcode"])

    rows = []
    for key, v in agg.items():
        t = max(v["flops"] / PEAK_FLOPS, v["bytes"] / PEAK_BW)
        nodes = []
        if order is not None:
            for s in key:
                idx = int(s[1:].split(".")[0])
                if idx < len(order):
                    nodes.append(str(order[idx])[:120])
        rows.append({
            "scopes": list(key),
            "nodes": nodes,
            "opcodes": sorted(v["opcodes"]),
            "flops": v["flops"],
            "bytes": v["bytes"],
            "model_s": t,
            "share": (t / total_s) if total_s else 0.0,
        })
    rows.sort(key=lambda r: -r["model_s"])
    return {
        "rows": rows,
        "named_fraction": 1.0 - (glue_s / total_s) if total_s else 1.0,
        "total_model_s": total_s,
        "glue_model_s": glue_s,
    }


def print_report(report, file=None, top=15):
    import sys

    file = file or sys.stdout
    print(
        f"XLA per-node attribution (roofline model): "
        f"{report['named_fraction'] * 100:.1f}% of modeled device time "
        f"maps to named graph nodes", file=file)
    print(f"{'share':>7} {'model us':>10} {'GFLOP':>8} {'MB':>8}  node(s)",
          file=file)
    for r in report["rows"][:top]:
        label = " + ".join(r["nodes"] or r["scopes"])
        print(
            f"{r['share'] * 100:6.1f}% {r['model_s'] * 1e6:10.1f} "
            f"{r['flops'] / 1e9:8.2f} {r['bytes'] / 1e6:8.2f}  "
            f"{label[:90]}", file=file)
