"""Deprecated-name alias: ``tensor/subtensor_opt.py`` →
``tensor/rewriting/subtensor.py`` (mirrors the reference's own
deprecation shim)."""
from aesara_tpu.tensor.rewriting.subtensor import *  # noqa: F401,F403
