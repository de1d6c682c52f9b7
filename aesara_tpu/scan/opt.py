"""Deprecated-name alias: ``scan/opt.py`` → ``scan/rewriting.py``
(mirrors the reference's own deprecation shim)."""
from aesara_tpu.scan.rewriting import *  # noqa: F401,F403
