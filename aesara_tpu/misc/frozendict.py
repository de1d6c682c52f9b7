"""Immutable mapping (reference ``aesara/misc/frozendict.py``)."""

from collections import OrderedDict
from collections.abc import Mapping

__all__ = ["frozendict", "FrozenOrderedDict"]


class frozendict(Mapping):
    """Hashable read-only dict."""

    def __init__(self, *args, **kwargs):
        self._dict = dict(*args, **kwargs)
        self._hash = None

    def __getitem__(self, key):
        return self._dict[key]

    def __contains__(self, key):
        return key in self._dict

    def copy(self, **add_or_replace):
        return type(self)(self._dict, **add_or_replace)

    def __iter__(self):
        return iter(self._dict)

    def __len__(self):
        return len(self._dict)

    def __repr__(self):
        return f"<{type(self).__name__} {self._dict!r}>"

    def __hash__(self):
        if self._hash is None:
            h = 0
            for key, value in self._dict.items():
                h ^= hash((key, value))
            self._hash = h
        return self._hash


class FrozenOrderedDict(frozendict):
    """Insertion-ordered frozendict."""

    def __init__(self, *args, **kwargs):
        self._dict = OrderedDict(*args, **kwargs)
        self._hash = None
