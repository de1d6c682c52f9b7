"""Reference import-path alias: ``graph/toolbox.py`` → ``graph/features.py``
(the reference's own toolbox.py is a deprecation shim the same way)."""
from aesara_tpu.graph.features import *  # noqa: F401,F403
from aesara_tpu.graph.features import (  # noqa: F401
    Feature, History, NodeFinder, ReplaceValidate, Validator,
)
