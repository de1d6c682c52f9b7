"""Deprecated-name alias: ``tensor/math_opt.py`` →
``tensor/rewriting/math.py`` (mirrors the reference's own
deprecation shim)."""
from aesara_tpu.tensor.rewriting.math import *  # noqa: F401,F403
