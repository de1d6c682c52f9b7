"""Deprecated-name alias: ``tensor/basic_opt.py`` →
``tensor/rewriting/basic.py`` (mirrors the reference's own
deprecation shim)."""
from aesara_tpu.tensor.rewriting.basic import *  # noqa: F401,F403
