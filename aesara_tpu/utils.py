"""Small shared utilities for the framework.

Parity: mirrors the helper roles of the reference's ``aesara/utils.py`` and
``aesara/graph/utils.py`` (Scratchpad, add_tag_trace, flatten) without
copying their implementations.
"""

from __future__ import annotations

import hashlib
import traceback
from collections.abc import Iterable
from typing import Any


class Scratchpad:
    """A free-form attribute bag attached to every :class:`Variable` as
    ``var.tag`` (reference: ``aesara/graph/utils.py:263``)."""

    def __init__(self, **kwargs: Any):
        self.__dict__.update(kwargs)

    def clear(self) -> None:
        self.__dict__.clear()

    def __update__(self, other: "Scratchpad") -> "Scratchpad":
        self.__dict__.update(other.__dict__)
        return self

    def __contains__(self, name: str) -> bool:
        return name in self.__dict__

    def __repr__(self) -> str:
        return f"Scratchpad({self.__dict__!r})"


class ValidatingScratchpad(Scratchpad):
    """Scratchpad that validates one attribute through a filter function."""

    def __init__(self, attr: str, attr_filter):
        object.__setattr__(self, "attr", attr)
        object.__setattr__(self, "attr_filter", attr_filter)

    def __setattr__(self, attr: str, obj: Any) -> None:
        if getattr(self, "attr", None) == attr:
            obj = self.attr_filter(obj)
        object.__setattr__(self, attr, obj)


class MethodNotDefined(Exception):
    """Raised by optional Op methods that a given op does not implement."""


class TestValueError(Exception):
    """Raised when a test value is required but missing."""


def add_tag_trace(thing: Any, user_line: int = 1) -> Any:
    """Attach an abbreviated creation traceback to ``thing.tag.trace``.

    Reference behavior: ``aesara/graph/utils.py:75``.  Used by error
    reporting to point at the user line that created a variable.
    """
    tb = traceback.extract_stack()
    # Drop frames from inside this package; keep the user frames as plain
    # picklable tuples.
    filtered = [
        (f.filename, f.lineno, f.name)
        for f in tb
        if "aesara_tpu" not in (f.filename or "")
    ]
    thing.tag.trace = [filtered[-user_line:]] if filtered else []
    return thing


def flatten(seq) -> list:
    """Recursively flatten nested lists/tuples into a flat list."""
    out: list = []
    stack = [seq]
    while stack:
        item = stack.pop()
        if isinstance(item, (list, tuple)):
            stack.extend(reversed(item))
        else:
            out.append(item)
    return out


def uniq(seq: Iterable) -> list:
    """Order-preserving unique (by identity-compatible equality)."""
    seen = set()
    out = []
    for x in seq:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def from_return_values(values):
    if isinstance(values, (list, tuple)):
        return list(values)
    return [values]


def hash_from_code(msg) -> str:
    """Stable content hash used for cache keys (reference ``utils.py``)."""
    if isinstance(msg, str):
        msg = msg.encode()
    return hashlib.sha256(msg).hexdigest()


class HashableNDArray:
    """Wrap an ndarray so it can live in sets/dicts keyed by content."""

    __slots__ = ("data", "_hash")

    def __init__(self, data):
        self.data = data
        self._hash = hash(
            (data.shape, str(data.dtype), data.tobytes() if data.size < 4096 else data.size)
        )

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        import numpy as np

        return (
            isinstance(other, HashableNDArray)
            and self.data.shape == other.data.shape
            and self.data.dtype == other.data.dtype
            and np.array_equal(self.data, other.data)
        )


class NoDuplicateOptWarningFilter:
    """logging filter dropping repeated rewrite warnings
    (reference ``aesara/utils.py``)."""

    prev_msgs: set = set()

    def filter(self, record) -> bool:
        msg = record.getMessage()
        if msg.startswith("WARNING (aesara_tpu"):
            if msg in self.prev_msgs:
                return False
            self.prev_msgs.add(msg)
        return True
