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


# --- reference graph/utils.py long tail --------------------------------------

class MetaObject:
    """Base with __props__-driven equality (reference ``MetaObject``)."""

    __props__: tuple = ()

    def _props(self):
        return tuple(getattr(self, p) for p in self.__props__)

    def _props_dict(self):
        return {p: getattr(self, p) for p in self.__props__}

    def __eq__(self, other):
        return type(self) is type(other) and self._props() == other._props()

    def __hash__(self):
        return hash((type(self), self._props()))


class MetaType(type):
    """Metaclass wiring __props__ equality automatically (reference)."""

    def __new__(cls, name, bases, dct):
        props = dct.get("__props__")
        res = super().__new__(cls, name, bases, dct)
        if props is not None and "__eq__" not in dct:
            res.__eq__ = MetaObject.__eq__
            res.__hash__ = MetaObject.__hash__
        return res


class AssocList:
    """Association list with a dict fast-path and a linear fallback for
    unhashable keys (reference ``AssocList``)."""

    def __init__(self):
        self._dict = {}
        self._list = []

    def __setitem__(self, k, v):
        try:
            self._dict[k] = v
        except TypeError:
            for i, (k2, _) in enumerate(self._list):
                if k2 == k:
                    self._list[i] = (k, v)
                    return
            self._list.append((k, v))

    def __getitem__(self, k):
        try:
            return self._dict[k]
        except TypeError:
            for k2, v in self._list:
                if k2 == k:
                    return v
            raise KeyError(k)
        except KeyError:
            raise

    def get(self, k, default=None):
        try:
            return self[k]
        except KeyError:
            return default


D = AssocList  # reference alias


def simple_extract_stack(f=None, limit=None, skips=None):
    """traceback.extract_stack with framework frames skipped (reference
    ``simple_extract_stack``)."""
    import traceback

    stack = traceback.extract_stack(f)
    if skips:
        stack = [s for s in stack
                 if not any(sk in (s.filename or "") for sk in skips)]
    if limit is not None:
        stack = stack[-limit:]
    return stack


def get_variable_trace_string(v) -> str:
    """Render a variable's creation traceback (reference name)."""
    tr = getattr(getattr(v, "tag", None), "trace", None)
    if not tr:
        return "  (no stored trace)"
    lines = []
    for entry in tr[-1] if isinstance(tr[-1], list) else tr:
        lines.append(f"  {entry}")
    return "\n".join(lines)


def toposort(prereqs_d: dict):
    """Generic topological sort over a {node: set(prereqs)} dict
    (reference ``graph/utils.py toposort``)."""
    seq = []
    done = set()
    prereqs = {k: set(v) for k, v in prereqs_d.items()}
    while prereqs:
        ready = [k for k, v in prereqs.items() if v <= done]
        if not ready:
            raise ValueError("cycle in the prerequisite graph")
        for k in ready:
            seq.append(k)
            done.add(k)
            del prereqs[k]
    return seq


class Singleton:
    """Classes inheriting from this have a single instance: construction
    always returns the same object, equality is class identity (reference
    ``utils.py Singleton``)."""

    __instance = None

    def __new__(cls):
        if cls.__instance is None or type(cls.__instance) is not cls:
            cls.__instance = super().__new__(cls)
        return cls.__instance

    def __str__(self):
        return self.__class__.__name__

    def __eq__(self, other):
        return type(self) is type(other)

    def __hash__(self):
        return hash(type(self))


class DefaultOrderedDict(dict):
    """Ordered dict with a default factory (reference
    ``utils.py DefaultOrderedDict``; plain dicts are ordered on 3.7+)."""

    def __init__(self, default_factory=None, *args, **kwargs):
        if default_factory is not None and not callable(default_factory):
            raise TypeError("first argument must be callable")
        super().__init__(*args, **kwargs)
        self.default_factory = default_factory

    def __missing__(self, key):
        if self.default_factory is None:
            raise KeyError(key)
        self[key] = value = self.default_factory()
        return value

    def copy(self):
        return type(self)(self.default_factory, self)
