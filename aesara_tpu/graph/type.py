"""Reference import-path alias: ``graph/type.py`` → the Type contract in
``graph/ir.py``."""
from aesara_tpu.graph.ir import Type  # noqa: F401
from aesara_tpu.graph.null_type import NullType  # noqa: F401
