"""Interactive HTML graph visualization (reference ``aesara/d3viz/``,
d3viz.py:44, d3write:115, formatting.py).

The reference vendors d3.js/dagre; this build generates a fully
self-contained HTML file (inline SVG, layered DAG layout computed in
Python, pan/zoom + hover tooltips in vanilla JS) — no network, no
external JS."""

from aesara_tpu.d3viz.d3viz import d3viz, d3write
from aesara_tpu.d3viz.formatting import PyDotFormatter, graph_to_dict

# reference d3viz helpers
replace_patterns = None  # set below


def safe_json(obj):
    """JSON-dump with non-serializable values stringified (reference
    ``d3viz.safe_json``)."""
    import json

    return json.dumps(obj, default=str)


def replace_patterns(x: str, replace: dict) -> str:  # noqa: F811
    """Apply string replacements (reference ``d3viz.replace_patterns``)."""
    for from_, to in replace.items():
        x = x.replace(str(from_), str(to))
    return x
