"""Interactive HTML graph visualization (reference ``aesara/d3viz/``,
d3viz.py:44, d3write:115, formatting.py).

The reference vendors d3.js/dagre; this build generates a fully
self-contained HTML file (inline SVG, layered DAG layout computed in
Python, pan/zoom + hover tooltips in vanilla JS) — no network, no
external JS."""

from aesara_tpu.d3viz.d3viz import d3viz, d3write
from aesara_tpu.d3viz.formatting import PyDotFormatter, graph_to_dict
