"""Graph → drawable structure (reference ``d3viz/formatting.py``).

Beyond the flat node/edge dump, this carries the reference formatter's
two deep features: per-Apply profile shares (``d3viz/formatting.py``
profile coloring) and nested inner graphs for ``HasInnerGraph`` ops
(Scan / OpFromGraph / Composite), which the HTML viewer lets you
navigate into.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Apply, Constant, Variable, graph_inputs, io_toposort
from aesara_tpu.graph.op import HasInnerGraph


def _label(obj) -> str:
    if isinstance(obj, Apply):
        return str(obj.op)
    if isinstance(obj, Constant):
        return str(obj)
    name = getattr(obj, "name", None)
    return name or str(getattr(obj, "type", obj))


def _inner_graph(op) -> Optional[dict]:
    """Recursive node/edge dict for a HasInnerGraph op, or None."""
    try:
        inner_in = list(op.inner_inputs)
        inner_out = list(op.inner_outputs)
    except Exception:
        return None
    if not inner_out:
        return None
    return _build_dict(inner_in, inner_out, profile=None)


def _build_dict(inputs, outputs, profile=None) -> dict:
    nodes: Dict[int, dict] = {}
    edges: List[dict] = []
    layer: Dict[int, int] = {}

    apply_time = dict(getattr(profile, "apply_time", {}) or {})
    total_time = sum(apply_time.values()) or None

    def nid(obj, kind):
        key = id(obj)
        if key not in nodes:
            nodes[key] = {
                "id": key,
                "label": _label(obj),
                "kind": kind,
                "dtype": str(getattr(getattr(obj, "type", None), "dtype", "")),
                "shape": str(getattr(getattr(obj, "type", None), "shape", "")),
                "layer": 0,
            }
        return key

    for v in inputs:
        layer[nid(v, "input")] = 0

    order = io_toposort(inputs, outputs)
    for node in order:
        in_layers = []
        for inp in node.inputs:
            kind = (
                "input" if inp in inputs
                else "constant" if isinstance(inp, Constant)
                else "variable"
            )
            k = nid(inp, kind)
            in_layers.append(layer.get(k, 0))
        apply_id = nid(node, "apply")
        layer[apply_id] = (max(in_layers) if in_layers else 0) + 1
        nodes[apply_id]["layer"] = layer[apply_id]
        if total_time and node in apply_time:
            nodes[apply_id]["time"] = apply_time[node]
            nodes[apply_id]["time_frac"] = apply_time[node] / total_time
        if isinstance(node.op, HasInnerGraph):
            sub = _inner_graph(node.op)
            if sub is not None:
                nodes[apply_id]["subgraph"] = sub
        for i, inp in enumerate(node.inputs):
            edges.append({"src": id(inp), "dst": apply_id, "label": str(i)})
        for o in node.outputs:
            kind = "output" if o in outputs else "variable"
            k = nid(o, kind)
            layer[k] = layer[apply_id] + 1
            nodes[k]["layer"] = layer[k]
            edges.append({"src": apply_id, "dst": k, "label": ""})
    for v in outputs:
        if id(v) in nodes:
            nodes[id(v)]["kind"] = "output"
    return {"nodes": list(nodes.values()), "edges": edges}


def graph_to_dict(fct, profile=None) -> dict:
    """{'nodes': [...], 'edges': [...]} with layered layout columns,
    optional profile time shares, and nested ``subgraph`` entries for
    inner-graph ops."""
    from aesara_tpu.compile.function import Function

    if isinstance(fct, Function):
        fgraph = fct.fgraph
        inputs, outputs = fgraph.inputs, fgraph.outputs
        if profile is None:
            profile = getattr(fct, "profile", None)
    elif isinstance(fct, FunctionGraph):
        inputs, outputs = fct.inputs, fct.outputs
    elif isinstance(fct, Variable):
        outputs = [fct]
        inputs = [v for v in graph_inputs(outputs) if not isinstance(v, Constant)]
    else:
        outputs = list(fct)
        inputs = [v for v in graph_inputs(outputs) if not isinstance(v, Constant)]
    return _build_dict(inputs, outputs, profile=profile)


def _heat(frac: float) -> str:
    """white → red ramp for profile shares (dot fillcolor)."""
    g = max(0, min(255, int(255 * (1.0 - frac))))
    return f'"#ff{g:02x}{g:02x}"'


class PyDotFormatter:
    """DOT-language export (the reference's pydotprint path,
    ``printing.py:1266``) — emits .dot text without requiring graphviz.
    Apply nodes carry profile heat colors when the function was compiled
    with ``profile=True`` (reference formatting.py profile mode)."""

    def __call__(self, fct, profile=None) -> str:
        d = graph_to_dict(fct, profile=profile)
        shapes = {"apply": "box", "input": "ellipse", "output": "ellipse",
                  "constant": "ellipse", "variable": "ellipse"}
        colors = {"apply": "lightblue", "input": "limegreen",
                  "output": "tomato", "constant": "lightgrey",
                  "variable": "white"}
        lines = ["digraph G {", "  rankdir=TB;"]
        for n in d["nodes"]:
            label = n["label"].replace('"', "'")
            extra = f"\\n{n['dtype']}{n['shape']}" if n["dtype"] else ""
            if "time_frac" in n:
                extra += f"\\n{n['time_frac']:.1%} ({n['time']*1e3:.2f} ms)"
                fill = _heat(n["time_frac"])
            else:
                fill = colors[n["kind"]]
            peripheries = ", peripheries=2" if "subgraph" in n else ""
            lines.append(
                f'  n{n["id"]} [label="{label}{extra}", '
                f'shape={shapes[n["kind"]]}, style=filled, '
                f'fillcolor={fill}{peripheries}];'
            )
        for e in d["edges"]:
            lbl = f' [label="{e["label"]}"]' if e["label"] else ""
            lines.append(f'  n{e["src"]} -> n{e["dst"]}{lbl};')
        lines.append("}")
        return "\n".join(lines)
