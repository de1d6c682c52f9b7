"""Minimal `cons.core`: the ConsError + car/cdr single-dispatchers the
reference registers Variable/Op/Type handlers on
(`/root/reference/aesara/graph/rewriting/unify.py:83-139`)."""


class ConsError(TypeError):
    """Raised when a value cannot be decomposed as a cons pair."""


class _TypeDispatcher:
    """Single-argument dispatcher with `.add((types,), fn)` registration
    and most-derived-class-first resolution (the multipledispatch subset
    the reference's registrations need)."""

    def __init__(self, name):
        self.name = name
        self._handlers = []  # (type, fn), later registrations first

    def add(self, sig, fn):
        (t,) = sig
        self._handlers.insert(0, (t, fn))

    def register(self, *sig):
        def deco(fn):
            self.add(sig, fn)
            return fn

        return deco

    def __call__(self, x):
        best = None
        best_depth = None
        for t, fn in self._handlers:
            if isinstance(x, t):
                try:
                    depth = type(x).__mro__.index(t)
                except ValueError:  # virtual subclass (ABC register)
                    depth = len(type(x).__mro__)
                if best_depth is None or depth < best_depth:
                    best, best_depth = fn, depth
        if best is None:
            return self._default(x)
        return best(x)

    def _default(self, x):
        if isinstance(x, (tuple, list)) and len(x):
            if self.name == "car":
                return x[0]
            return type(x)(x[1:])
        raise ConsError(f"{x!r} is not a cons pair")


_car = _TypeDispatcher("car")
_cdr = _TypeDispatcher("cdr")


def car(x):
    return _car(x)


def cdr(x):
    return _cdr(x)


def cons(h, t):
    if isinstance(t, (tuple, list)):
        return type(t)((h,) + tuple(t))
    raise ConsError(f"cannot cons onto {t!r}")
