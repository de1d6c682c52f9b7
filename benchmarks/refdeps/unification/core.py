"""Minimal `unification.core`: the dispatch + generator-trampoline
protocol the reference's handlers use
(`/root/reference/aesara/graph/rewriting/unify.py:150-255`):

- ``_unify.add((TypeU, TypeV, Mapping), handler)`` / ``@_unify.register``
  with tuple-of-types union slots
- handlers are generator functions yielding either a result (mapping /
  ``False``) or another ``_unify(...)`` call to delegate to — the
  trampoline in ``unify`` resolves the chain
- fallback semantics: walk, logic-variable assoc, same-length sequence
  zip-unify, then equality (``False`` on failure, never ``None``)
"""

from types import GeneratorType

from unification.utils import transitive_get as walk
from unification.variable import Var, isvar


def assoc(s, key, value):
    s2 = dict(s)
    s2[key] = value
    return s2


class _Dispatcher3:
    """(u, v, s) dispatcher: most-specific registration wins, measured by
    summed MRO distance; union slots via tuples of types."""

    def __init__(self, name, driver):
        self.name = name
        self._handlers = []
        self._driver = driver

    def add(self, sig, fn):
        sig = tuple(t if isinstance(t, tuple) else (t,) for t in sig)
        self._handlers.insert(0, (sig, fn))

    def register(self, *sig):
        def deco(fn):
            self.add(sig, fn)
            return fn

        return deco

    def dispatch(self, *types):
        best = None
        best_score = None
        for sig, fn in self._handlers:
            score = 0
            for t, alts in zip(types, sig):
                d = None
                for alt in alts:
                    if issubclass(t, alt):
                        try:
                            cand = t.__mro__.index(alt)
                        except ValueError:
                            cand = len(t.__mro__)
                        d = cand if d is None else min(d, cand)
                if d is None:
                    score = None
                    break
                score += d
            if score is not None and (best_score is None or score < best_score):
                best, best_score = fn, score
        return best

    def __call__(self, u, v, s):
        # LAZY: handlers yield _unify(...) calls for the trampoline
        def delegated():
            yield self._driver(u, v, s)

        return delegated()


def _resolve(x):
    while isinstance(x, GeneratorType):
        x = next(x)
    return x


def _unify_driver(u, v, s):
    u = walk(u, s)
    v = walk(v, s)
    if u is v:
        return s
    fn = _unify.dispatch(type(u), type(v), type(s))
    if fn is not None:
        return _resolve(fn(u, v, s))
    if isvar(u):
        return assoc(s, u, v)
    if isvar(v):
        return assoc(s, v, u)
    if isinstance(u, (tuple, list)) and isinstance(v, (tuple, list)):
        if len(u) != len(v):
            return False
        for a, b in zip(u, v):
            s = _unify_driver(a, b, s)
            if s is False:
                return False
        return s
    try:
        if bool(u == v):
            return s
    except Exception:
        pass
    return False


_unify = _Dispatcher3("_unify", _unify_driver)


def _reify_driver(x, s):
    x = walk(x, s)
    fn = _reify.dispatch(type(x), type(s))
    if fn is not None:
        return _resolve(fn(x, s))
    try:
        from etuples.core import ExpressionTuple, etuple

        if isinstance(x, ExpressionTuple):
            return etuple(*(_reify_driver(e, s) for e in x))
    except ImportError:
        pass
    if isinstance(x, (tuple, list)):
        return type(x)(_reify_driver(e, s) for e in x)
    if type(x) is dict:
        return {k: _reify_driver(v, s) for k, v in x.items()}
    return x


class _Dispatcher2(_Dispatcher3):
    def __call__(self, x, s):
        def delegated():
            yield self._driver(x, s)

        return delegated()


_reify = _Dispatcher2("_reify", _reify_driver)


def unify(u, v, s=False):
    if s is False:
        s = {}
    return _unify_driver(u, v, s)


def reify(x, s):
    return _reify_driver(x, s)
