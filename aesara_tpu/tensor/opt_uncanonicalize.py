"""Deprecated-name alias: ``tensor/opt_uncanonicalize.py`` →
``tensor/rewriting/uncanonicalize.py`` (mirrors the reference's own
deprecation shim)."""
from aesara_tpu.tensor.rewriting.uncanonicalize import *  # noqa: F401,F403
