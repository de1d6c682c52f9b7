"""NullType marker (reference ``aesara/graph/null_type.py:4``) — the
canonical implementation lives in aesara_tpu.gradient."""

from aesara_tpu.gradient import NullType, null_type  # noqa: F401
