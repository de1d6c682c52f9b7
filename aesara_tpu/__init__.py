"""aesara_tpu — a TPU-native symbolic tensor compiler.

Users build symbolic expression graphs with a NumPy-like API
(``aesara_tpu.tensor``), take symbolic gradients (``grad``/``Lop``/``Rop``),
and compile graphs to executables with ``aesara_tpu.function``.  Where the
reference (aesara-devs/aesara) transpiles per-op C run by a host VM, this
framework lowers whole function graphs to XLA (Pallas kernels for fused
chains, MXU ``dot_general`` for the BLAS pipeline, ``lax.scan`` for loops)
and adds a mesh/sharding + collectives layer (``aesara_tpu.parallel``).
"""

__version__ = "0.1.0"

from aesara_tpu.config import config, change_flags
from aesara_tpu.graph.ir import clone_replace

# Subsystems below import lazily-buildable modules; they are appended to the
# public namespace as the build progresses (round 1 scaffolding).
try:
    from aesara_tpu.compile.function import function
    from aesara_tpu.compile.sharedvalue import shared
    from aesara_tpu.compile.io import In, Out
    from aesara_tpu.compile.mode import Mode
    from aesara_tpu.gradient import Lop, Rop, grad, hessian, jacobian, verify_grad
    from aesara_tpu import tensor
    from aesara_tpu import scalar
    from aesara_tpu.printing import debugprint as dprint, debugprint
except ImportError:  # pragma: no cover - during staged bring-up only
    pass
