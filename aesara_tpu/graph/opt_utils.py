"""Deprecated-name alias: ``graph/opt_utils.py`` → ``graph/rewriting/utils.py``."""
from aesara_tpu.graph.rewriting.utils import *  # noqa: F401,F403
from aesara_tpu.graph.rewriting.utils import is_same_graph, rewrite_graph  # noqa: F401
