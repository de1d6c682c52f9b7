"""Reference import-path alias: ``graph/kanren.py`` →
``graph/rewriting/kanren.py``."""
from aesara_tpu.graph.rewriting.kanren import KanrenRelationSub  # noqa: F401
