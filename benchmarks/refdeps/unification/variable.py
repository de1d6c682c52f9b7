"""Minimal `unification.variable`.

Contract notes: the reference's ``ConstrainedVar``
(`/root/reference/aesara/graph/rewriting/unify.py:36-58`) subclasses this
``Var`` and uses its INTERNALS — the ``Var._id`` token counter, the
``cls._refs`` interning dict, ``__slots__``-based attributes, and
construction happening entirely in ``__new__`` (so ``__init__`` must
tolerate arbitrary subclass signatures).
"""


class Var:
    """A logic variable, equal by (type, token), interned."""

    __slots__ = ("token",)

    _id = 1
    _refs: dict = {}

    def __new__(cls, *args, **kwargs):
        token = args[0] if args else kwargs.get("token")
        if token is None:
            token = f"_{Var._id}"
            Var._id += 1
        key = (cls, token)
        obj = cls._refs.get(key, None)
        if obj is None:
            obj = object.__new__(cls)
            obj.token = token
            cls._refs[key] = obj
        return obj

    def __init__(self, *args, **kwargs):
        # state is set in __new__ (subclasses construct there too)
        pass

    def __eq__(self, other):
        if type(self) is type(other):
            return self.token == other.token
        return NotImplemented

    def __hash__(self):
        return hash((type(self), self.token))

    def __str__(self):
        return f"~{self.token}"

    __repr__ = __str__


def var(token=None):
    return Var(token) if token is not None else Var()


def isvar(x):
    return isinstance(x, Var)
