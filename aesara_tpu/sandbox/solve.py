"""Reference import-path alias: ``sandbox/solve.py`` — the Solve op
graduated to ``tensor/slinalg.py`` (as in later reference versions)."""
from aesara_tpu.tensor.slinalg import Solve, solve  # noqa: F401
