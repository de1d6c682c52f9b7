"""Parity import path (reference ``aesara/graph/rewriting/unify.py``)."""

from aesara_tpu.graph.unify import ConstrainedVar, Var, etuplize, reify, unify, var, walk  # noqa: F401
