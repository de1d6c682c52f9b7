"""Deprecated-name alias: ``graph/optdb.py`` → ``graph/rewriting/db.py``
(old names OptimizationDatabase/OptimizationQuery included)."""
from aesara_tpu.graph.rewriting.db import *  # noqa: F401,F403
from aesara_tpu.graph.rewriting.db import (  # noqa: F401
    RewriteDatabase as OptimizationDatabase,
    RewriteDatabaseQuery as OptimizationQuery,
    SequenceDB,
    EquilibriumDB,
)
