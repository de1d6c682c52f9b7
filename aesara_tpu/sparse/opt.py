"""Deprecated-name alias: ``sparse/opt.py`` → ``sparse/rewriting.py``."""
from aesara_tpu.sparse.rewriting import *  # noqa: F401,F403
