"""Minimal `etuples.core`: lazily-evaluated expression tuples.

What the reference exercises
(`/root/reference/aesara/graph/rewriting/unify.py`,
`graph/rewriting/basic.py:1620-1650`):

- ``etuple(op, *args, evaled_obj=orig)`` construction
- slicing (``x_e[1:]``) producing fresh ExpressionTuples
- ``ExpressionTuple.evaled_obj``: evaluate rator/rands recursively, then
  ``apply(rator, rands)`` — with ``apply.add((Op, ExpressionTuple), ...)``
  routing to ``op.make_node`` for graph rebuild
- ``etuplize(x, shallow=True)`` decomposing via cons ``_car``/``_cdr``
"""

from cons.core import ConsError, _car, _cdr


class _Sentinel:
    def __repr__(self):
        return "<unevaluated>"


_UNSET = _Sentinel()


class _ApplyDispatcher:
    """(rator_type, rands_type) dispatcher; default calls rator(*rands)."""

    def __init__(self):
        self._handlers = []

    def add(self, sig, fn):
        self._handlers.insert(0, (sig, fn))

    def register(self, *sig):
        def deco(fn):
            self.add(sig, fn)
            return fn

        return deco

    def __call__(self, rator, rands):
        for (tr, ta), fn in self._handlers:
            if isinstance(rator, tr) and isinstance(rands, ta):
                return fn(rator, rands)
        if callable(rator):
            return rator(*rands)
        raise TypeError(f"cannot apply {rator!r}")


apply = _ApplyDispatcher()


class ExpressionTuple(tuple):
    """A tuple (rator, rand...) evaluating lazily through ``apply``."""

    _evaled_obj = _UNSET

    def __new__(cls, seq=()):
        return super().__new__(cls, seq)

    @property
    def evaled_obj(self):
        if self._evaled_obj is not _UNSET:
            return self._evaled_obj
        if not len(self):
            raise ValueError("cannot evaluate an empty ExpressionTuple")

        def ev(x):
            return x.evaled_obj if isinstance(x, ExpressionTuple) else x

        rator = ev(self[0])
        rands = etuple(*(ev(r) for r in self[1:]))
        res = apply(rator, rands)
        self._evaled_obj = res
        return res

    # keep eval laziness through slicing: a slice is a NEW expression
    def __getitem__(self, key):
        res = super().__getitem__(key)
        if isinstance(key, slice):
            return ExpressionTuple(res)
        return res

    def __add__(self, other):
        return ExpressionTuple(tuple(self) + tuple(other))

    def __radd__(self, other):
        return ExpressionTuple(tuple(other) + tuple(self))

    def __repr__(self):
        return f"e({', '.join(map(repr, self))})"


def etuple(*args, evaled_obj=_UNSET, **kwargs):
    et = ExpressionTuple(args)
    if evaled_obj is not _UNSET:
        et._evaled_obj = evaled_obj
    return et


def etuplize(x, shallow=False, return_bad_args=False):
    """Decompose ``x`` into an ExpressionTuple via cons car/cdr."""
    if isinstance(x, ExpressionTuple):
        return x
    try:
        op = _car(x)
        args = _cdr(x)
    except ConsError:
        if return_bad_args:
            return x
        raise TypeError(f"{x!r} is not etuplize-able")
    if not shallow:
        new_args = []
        for a in args:
            try:
                new_args.append(etuplize(a, shallow=False))
            except TypeError:
                new_args.append(a)
        args = new_args
    return etuple(op, *args, evaled_obj=x)
