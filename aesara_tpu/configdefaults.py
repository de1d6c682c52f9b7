"""Reference import-path alias: ``configdefaults.py`` — flag defaults
are defined inline in ``config.py`` here."""
from aesara_tpu.config import config  # noqa: F401
