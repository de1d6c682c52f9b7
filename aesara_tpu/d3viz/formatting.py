"""Graph → drawable structure (reference ``d3viz/formatting.py``)."""

from __future__ import annotations

from typing import Dict, List

from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Apply, Constant, Variable, graph_inputs, io_toposort


def _label(obj) -> str:
    if isinstance(obj, Apply):
        return str(obj.op)
    if isinstance(obj, Constant):
        return str(obj)
    name = getattr(obj, "name", None)
    return name or str(getattr(obj, "type", obj))


def graph_to_dict(fct) -> dict:
    """{'nodes': [...], 'edges': [...]} with layered layout columns."""
    from aesara_tpu.compile.function import Function

    if isinstance(fct, Function):
        fgraph = fct.fgraph
        inputs, outputs = fgraph.inputs, fgraph.outputs
    elif isinstance(fct, FunctionGraph):
        inputs, outputs = fct.inputs, fct.outputs
    elif isinstance(fct, Variable):
        outputs = [fct]
        inputs = [v for v in graph_inputs(outputs) if not isinstance(v, Constant)]
    else:
        outputs = list(fct)
        inputs = [v for v in graph_inputs(outputs) if not isinstance(v, Constant)]

    nodes: Dict[int, dict] = {}
    edges: List[dict] = []
    layer: Dict[int, int] = {}

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


class PyDotFormatter:
    """DOT-language export (the reference's pydotprint path,
    ``printing.py:1266``) — emits .dot text without requiring graphviz."""

    def __call__(self, fct) -> str:
        d = graph_to_dict(fct)
        shapes = {"apply": "box", "input": "ellipse", "output": "ellipse",
                  "constant": "ellipse", "variable": "ellipse"}
        colors = {"apply": "lightblue", "input": "limegreen",
                  "output": "tomato", "constant": "lightgrey",
                  "variable": "white"}
        lines = ["digraph G {", "  rankdir=TB;"]
        for n in d["nodes"]:
            label = n["label"].replace('"', "'")
            extra = f"\\n{n['dtype']}{n['shape']}" if n["dtype"] else ""
            lines.append(
                f'  n{n["id"]} [label="{label}{extra}", '
                f'shape={shapes[n["kind"]]}, style=filled, '
                f'fillcolor={colors[n["kind"]]}];'
            )
        for e in d["edges"]:
            lbl = f' [label="{e["label"]}"]' if e["label"] else ""
            lines.append(f'  n{e["src"]} -> n{e["dst"]}{lbl};')
        lines.append("}")
        return "\n".join(lines)
