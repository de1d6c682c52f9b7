"""Minimal `cons` stand-in (see benchmarks/refdeps/README.md)."""

from cons.core import ConsError, _car, _cdr, car, cdr, cons

__all__ = ["ConsError", "car", "cdr", "cons", "_car", "_cdr"]
