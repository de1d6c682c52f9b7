"""Reference import-path alias (reference ``aesara/assert_op.py`` is the
same kind of forwarding module for ``raise_op``)."""
from aesara_tpu.raise_op import Assert, CheckAndRaise, assert_op  # noqa: F401
