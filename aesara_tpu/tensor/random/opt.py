"""Deprecated-name alias: ``tensor/random/opt.py`` →
``tensor/random/rewriting.py``."""
from aesara_tpu.tensor.random.rewriting import *  # noqa: F401,F403
