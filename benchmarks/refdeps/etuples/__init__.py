"""Minimal `etuples` stand-in (see benchmarks/refdeps/README.md)."""

from etuples.core import ExpressionTuple, apply, etuple, etuplize

__all__ = ["ExpressionTuple", "apply", "etuple", "etuplize"]
