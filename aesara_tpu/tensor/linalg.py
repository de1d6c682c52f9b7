"""Combined linalg namespace (reference ``aesara/tensor/linalg.py``:
re-exports nlinalg + slinalg)."""

from aesara_tpu.tensor.nlinalg import *  # noqa: F401,F403
from aesara_tpu.tensor.slinalg import *  # noqa: F401,F403
