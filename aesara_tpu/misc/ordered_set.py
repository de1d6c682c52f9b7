"""OrderedSet (reference ``aesara/misc/ordered_set.py``) — dict-backed."""

from collections.abc import MutableSet


class OrderedSet(MutableSet):
    def __init__(self, iterable=()):
        self._d = dict.fromkeys(iterable)

    def __contains__(self, v):
        return v in self._d

    def __iter__(self):
        return iter(self._d)

    def __len__(self):
        return len(self._d)

    def add(self, v):
        self._d[v] = None

    def discard(self, v):
        self._d.pop(v, None)

    def union(self, other):
        res = OrderedSet(self)
        for v in other:
            res.add(v)
        return res

    def copy(self):
        return OrderedSet(self)
