"""Version info (reference ``aesara/version.py``)."""
from aesara_tpu import __version__ as version  # noqa: F401

short_version = version
release = True
git_revision = "unknown"
full_version = version
