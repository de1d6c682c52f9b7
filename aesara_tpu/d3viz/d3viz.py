"""Self-contained interactive HTML graph viewer (reference
``d3viz/d3viz.py:44`` d3viz, ``:115`` d3write).

Viewer features matching the reference's dagre app: pan/zoom,
tooltips, profile heat coloring (when the function was compiled with
``profile=True``), and click-through navigation into the inner graphs
of Scan / OpFromGraph nodes (double-bordered)."""

from __future__ import annotations

import json
import os

from aesara_tpu.d3viz.formatting import graph_to_dict


_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>aesara_tpu graph</title>
<style>
 body {{ font-family: sans-serif; margin: 0; }}
 svg {{ width: 100vw; height: 100vh; background: #fafafa; }}
 .input ellipse {{ fill: #a1d99b; stroke: #31a354; }}
 .output ellipse {{ fill: #fc9272; stroke: #de2d26; }}
 .constant ellipse {{ fill: #d9d9d9; stroke: #969696; }}
 .variable ellipse {{ fill: #ffffff; stroke: #969696; }}
 text {{ font-size: 11px; pointer-events: none; }}
 .edge {{ stroke: #888; fill: none; marker-end: url(#arrow); }}
 #tip {{ position: fixed; background: #222; color: #fff; padding: 4px 8px;
        border-radius: 4px; font-size: 12px; display: none; }}
 #back {{ position: fixed; top: 8px; left: 8px; padding: 4px 10px;
         display: none; cursor: pointer; background: #3182bd; color: #fff;
         border: none; border-radius: 4px; font-size: 13px; }}
</style></head>
<body>
<div id="tip"></div>
<button id="back">&#8592; back</button>
<svg id="canvas"><defs>
<marker id="arrow" viewBox="0 0 10 10" refX="9" refY="5" markerWidth="7"
 markerHeight="7" orient="auto"><path d="M0,0L10,5L0,10z" fill="#888"/></marker>
</defs><g id="view"></g></svg>
<script>
const rootGraph = {graph_json};
const NS = "http://www.w3.org/2000/svg";
const view = document.getElementById("view");
const tip = document.getElementById("tip");
const backBtn = document.getElementById("back");
const stack = [];
let scale = 1, tx = 0, ty = 0;

function heat(frac) {{
  const g = Math.max(0, Math.min(255, Math.round(255 * (1 - frac))));
  return `rgb(255,${{g}},${{g}})`;
}}

function render(graph) {{
  view.innerHTML = "";
  scale = 1; tx = 0; ty = 0;
  view.setAttribute("transform", "");
  backBtn.style.display = stack.length ? "block" : "none";
  const layers = {{}};
  graph.nodes.forEach(n => {{ (layers[n.layer] = layers[n.layer] || []).push(n); }});
  const W = 170, H = 70;
  Object.entries(layers).forEach(([l, ns]) => {{
    ns.forEach((n, i) => {{
      n.x = 60 + i * W + (l % 2) * (W / 3);
      n.y = 40 + l * H;
    }});
  }});
  const byId = {{}};
  graph.nodes.forEach(n => byId[n.id] = n);
  graph.edges.forEach(e => {{
    const s = byId[e.src], d = byId[e.dst];
    if (!s || !d) return;
    const p = document.createElementNS(NS, "path");
    const mx = (s.y + d.y) / 2;
    p.setAttribute("d", `M${{s.x}},${{s.y + 12}} C${{s.x}},${{mx}} ${{d.x}},${{mx}} ${{d.x}},${{d.y - 14}}`);
    p.setAttribute("class", "edge");
    view.appendChild(p);
  }});
  graph.nodes.forEach(n => {{
    const g = document.createElementNS(NS, "g");
    g.setAttribute("class", n.kind);
    g.setAttribute("transform", `translate(${{n.x}},${{n.y}})`);
    let shape;
    if (n.kind === "apply") {{
      shape = document.createElementNS(NS, "rect");
      shape.setAttribute("x", -70); shape.setAttribute("y", -12);
      shape.setAttribute("width", 140); shape.setAttribute("height", 24);
      shape.setAttribute("rx", 4);
      shape.setAttribute("fill", "time_frac" in n ? heat(n.time_frac) : "#9ecae1");
      shape.setAttribute("stroke", "#3182bd");
      if (n.subgraph) {{
        shape.setAttribute("stroke-width", 3);
        g.style.cursor = "pointer";
        g.addEventListener("click", () => {{ stack.push(graph); render(n.subgraph); }});
      }}
    }} else {{
      shape = document.createElementNS(NS, "ellipse");
      shape.setAttribute("rx", 70); shape.setAttribute("ry", 13);
    }}
    g.appendChild(shape);
    const t = document.createElementNS(NS, "text");
    t.setAttribute("text-anchor", "middle");
    t.setAttribute("dy", 4);
    t.textContent = n.label.length > 24 ? n.label.slice(0, 22) + "…" : n.label;
    g.appendChild(t);
    g.addEventListener("mousemove", ev => {{
      tip.style.display = "block";
      tip.style.left = (ev.clientX + 12) + "px";
      tip.style.top = (ev.clientY + 12) + "px";
      let txt = `${{n.label}}  ${{n.dtype}} ${{n.shape}}`;
      if ("time_frac" in n)
        txt += `  ${{(n.time_frac * 100).toFixed(1)}}% (${{(n.time * 1e3).toFixed(2)}} ms)`;
      if (n.subgraph) txt += "  [click to open inner graph]";
      tip.textContent = txt;
    }});
    g.addEventListener("mouseleave", () => tip.style.display = "none");
    view.appendChild(g);
  }});
}}

backBtn.addEventListener("click", () => {{ if (stack.length) render(stack.pop()); }});
render(rootGraph);

// pan/zoom
let dragging = false, lx = 0, ly = 0;
const svg = document.getElementById("canvas");
svg.addEventListener("wheel", ev => {{
  ev.preventDefault();
  scale *= ev.deltaY < 0 ? 1.1 : 0.9;
  view.setAttribute("transform", `translate(${{tx}},${{ty}}) scale(${{scale}})`);
}});
svg.addEventListener("mousedown", ev => {{ dragging = true; lx = ev.clientX; ly = ev.clientY; }});
svg.addEventListener("mouseup", () => dragging = false);
svg.addEventListener("mousemove", ev => {{
  if (!dragging) return;
  tx += ev.clientX - lx; ty += ev.clientY - ly; lx = ev.clientX; ly = ev.clientY;
  view.setAttribute("transform", `translate(${{tx}},${{ty}}) scale(${{scale}})`);
}});
</script></body></html>
"""


def d3write(fct, path: str, profile=None) -> None:
    """Write the graph JSON to ``path`` (reference ``d3viz.py:115``)."""
    with open(path, "w") as f:
        json.dump(graph_to_dict(fct, profile=profile), f, indent=1)


def d3viz(fct, outfile: str, copy_deps: bool = True, profile=None,
          **kwargs) -> None:
    """Render an interactive HTML view of the graph (reference
    ``d3viz.py:44``)."""
    html = _TEMPLATE.format(
        graph_json=json.dumps(graph_to_dict(fct, profile=profile))
    )
    os.makedirs(os.path.dirname(os.path.abspath(outfile)), exist_ok=True)
    with open(outfile, "w") as f:
        f.write(html)
