"""Minimal `unification` stand-in (see benchmarks/refdeps/README.md)."""

from unification.core import assoc, reify, unify
from unification.variable import Var, isvar, var

__all__ = ["Var", "var", "isvar", "unify", "reify", "assoc", "variables"]


class variables:
    """Context manager exposing values as fresh logic variables (rarely
    used; provided for API completeness)."""

    def __init__(self, *vs):
        self.vs = vs

    def __enter__(self):
        return self.vs

    def __exit__(self, *exc):
        return False
