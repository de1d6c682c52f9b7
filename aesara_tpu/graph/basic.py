"""Reference import-path alias: ``graph/basic.py`` → ``graph/ir.py``
(the reference keeps the graph core here; ours lives in ``ir.py``)."""
from aesara_tpu.graph.ir import *  # noqa: F401,F403
from aesara_tpu.graph.ir import (  # noqa: F401
    Apply, AtomicVariable, Constant, NominalVariable, Variable,
    ancestors, applys_between, clone, clone_get_equiv, clone_replace,
    equal_computations, general_toposort, graph_inputs, io_toposort,
    vars_between, walk,
)

Atomic = AtomicVariable
