"""Structural unification over expression graphs
(reference ``aesara/graph/rewriting/unify.py``; the reference delegates to
the external miniKanren stack — not available here, so this is a
self-contained first-order unification engine with the same roles:
logic variables, constrained variables, unify/reify over Apply graphs).
"""

from __future__ import annotations

import itertools
from typing import Any, Optional

from aesara_tpu.graph.ir import Apply, Constant, Variable

import numpy as np


_var_ids = itertools.count()


class Var:
    """A logic variable."""

    __slots__ = ("token",)

    def __init__(self, token=None):
        self.token = token if token is not None else f"_{next(_var_ids)}"

    def __repr__(self):
        return f"~{self.token}"

    def __eq__(self, other):
        return type(other) is Var and self.token == other.token

    def __hash__(self):
        return hash((Var, self.token))


def var(token=None):
    return Var(token)


class ConstrainedVar(Var):
    """Logic variable with a predicate (reference ``unify.py:36``)."""

    __slots__ = ("constraint",)

    def __init__(self, constraint, token=None):
        super().__init__(token)
        self.constraint = constraint

    def __repr__(self):
        return f"~{self.token}:{getattr(self.constraint, '__name__', '?')}"


def walk(x, s: dict):
    while isinstance(x, Var) and x in s:
        x = s[x]
    return x


def unify(u, v, s: Optional[dict] = None):
    """Return an extended substitution or None (failure)."""
    if s is None:
        s = {}
    u = walk(u, s)
    v = walk(v, s)
    if isinstance(u, Var) and isinstance(v, Var) and u == v:
        return s
    if isinstance(u, Var):
        return _assign(u, v, s)
    if isinstance(v, Var):
        return _assign(v, u, s)
    # graph structure: expression = (op, *inputs)
    if isinstance(u, Variable) and isinstance(v, Variable):
        if u is v:
            return s
        if isinstance(u, Constant) or isinstance(v, Constant):
            if isinstance(u, Constant) and isinstance(v, Constant):
                try:
                    if np.array_equal(np.asarray(u.data), np.asarray(v.data)):
                        return s
                except Exception:
                    pass
            return None
        if u.owner is None or v.owner is None:
            return s if u is v else None
        return unify(etuplize(u), etuplize(v), s)
    # a pattern tuple matches a Variable through its Apply structure
    if isinstance(u, (tuple, list)) and isinstance(v, Variable):
        if v.owner is None:
            return None
        v = etuplize(v)
    if isinstance(v, (tuple, list)) and isinstance(u, Variable):
        if u.owner is None:
            return None
        u = etuplize(u)
    if isinstance(u, (tuple, list)) and isinstance(v, (tuple, list)):
        if len(u) != len(v):
            return None
        for a, b in zip(u, v):
            s = unify(a, b, s)
            if s is None:
                return None
        return s
    if u == v or (
        not isinstance(u, (Variable, tuple, list))
        and not isinstance(v, (Variable, tuple, list))
        and _scalar_eq(u, v)
    ):
        return s
    return None


def _scalar_eq(u, v):
    try:
        return bool(u == v)
    except Exception:
        return False


def _assign(lv: Var, val, s: dict):
    if isinstance(lv, ConstrainedVar):
        probe = walk(val, s)
        if not isinstance(probe, Var) and not lv.constraint(probe):
            return None
    s2 = dict(s)
    s2[lv] = val
    return s2


def etuplize(v: Variable):
    """Variable → (op, input...) expression tuple (the reference's
    car/cdr dispatch, ``unify.py:75-139``)."""
    if v.owner is None:
        return v
    return (v.owner.op,) + tuple(v.owner.inputs)


def reify(x, s: dict):
    """Substitute logic variables structurally.

    PURE: expression tuples stay tuples (the reference reifies to
    ExpressionTuples the same way) — graph construction is an explicit
    step via ``eval_if_etuple``, so tuple-shaped queries like
    ``run(n, (op_lv, args_lv), ...)`` report structure instead of
    accidentally applying the op."""
    x = walk(x, s)
    if isinstance(x, Var):
        return x
    if isinstance(x, list):
        # lists are OUTPUT COLLECTIONS (multi-output replacement), tuples
        # are expressions — preserve the distinction through reify
        return [reify(e, s) for e in x]
    if isinstance(x, tuple):
        return tuple(reify(e, s) for e in x)
    return x


# --- goal composition (microKanren core) --------------------------------------
# The reference delegates to the external miniKanren package
# (``/root/reference/aesara/graph/rewriting/kanren.py:13`` builds arbitrary
# composed goals with eq/conso/conde).  This is a self-contained goal
# engine with the same algebra: a *goal* is ``substitution -> iterator of
# substitutions``; ``eq`` is the primitive, ``lall``/``lany``/``conde``
# compose, ``fresh`` introduces scoped logic variables, ``run`` reifies.


def succeed(s):
    yield s


def fail(s):
    return
    yield  # pragma: no cover


def eq(u, v):
    """Primitive goal: unify u with v."""

    def goal(s):
        s2 = unify(u, v, s)
        if s2 is not None:
            yield s2

    return goal


def lall(*goals):
    """Logical conjunction (kanren ``lall``)."""
    if not goals:
        return succeed

    def goal(s):
        def emit(i, s):
            if i == len(goals):
                yield s
                return
            for s2 in goals[i](s):
                yield from emit(i + 1, s2)

        yield from emit(0, s)

    return goal


def lany(*goals):
    """Logical disjunction (kanren ``lany``): ordered alternatives."""

    def goal(s):
        for g in goals:
            yield from g(s)

    return goal


def conde(*clauses):
    """Each clause is a sequence of goals: conjunction within a clause,
    disjunction across clauses (kanren ``conde``)."""
    return lany(*[lall(*c) for c in clauses])


def fresh(f):
    """Introduce len(signature(f)) fresh logic variables scoped to the
    goal f returns (kanren's ``fresh``)."""
    import inspect

    n = len(inspect.signature(f).parameters)

    def goal(s):
        yield from f(*(var() for _ in range(n)))(s)

    return goal


def conso(h, t, l):
    """Goal: l is the pair (h . t) — over expression tuples, l == (h,) + t.

    Graph Variables on either side decompose through ``etuplize``, so
    ``conso(op_lv, args_lv, in_expr)`` splits an Apply into its op and
    input list exactly like the reference's cons-based decomposition.
    """

    def goal(s):
        l_w = walk(l, s)
        if isinstance(l_w, Variable) and l_w.owner is not None:
            l_w = etuplize(l_w)
        if isinstance(l_w, (tuple, list)):
            if not len(l_w):
                return
            s2 = unify(h, l_w[0], s)
            if s2 is None:
                return
            s3 = unify(t, tuple(l_w[1:]), s2)
            if s3 is not None:
                yield s3
            return
        h_w = walk(h, s)
        t_w = walk(t, s)
        if isinstance(t_w, (tuple, list)) and not isinstance(l_w, Variable):
            s2 = unify(l, (h_w,) + tuple(t_w), s)
            if s2 is not None:
                yield s2

    return goal


def heado(h, l):
    return fresh(lambda t: conso(h, t, l))


def tailo(t, l):
    return fresh(lambda h: conso(h, t, l))


def condp(pred):
    """Goal succeeding iff ``pred(substitution)`` — an escape hatch for
    side conditions over already-bound variables."""

    def goal(s):
        if pred(s):
            yield s

    return goal


def run(n, q, *goals):
    """Reified values of ``q`` for the first ``n`` solutions (``n=None``
    → a lazy iterator over all of them, matching ``kanren.run``)."""
    goal = lall(*goals)
    results = (reify(q, s) for s in goal({}))
    if n is None:
        return results
    return list(itertools.islice(results, n))


# --- reference car/cdr dispatch names (rewriting/unify.py) --------------------
# our unification is self-contained (no `cons` dependency); these helpers
# expose the same decomposition the reference registers with cons.core

def car_Variable(x):
    if x.owner is None:
        raise ValueError("a leaf variable has no car")
    return x.owner.op


def cdr_Variable(x):
    if x.owner is None:
        raise ValueError("a leaf variable has no cdr")
    return list(x.owner.inputs)


def car_Op(x):
    return type(x)


def cdr_Op(x):
    props = getattr(x, "__props__", ()) or ()
    return [getattr(x, p) for p in props]


def car_Type(x):
    return type(x)


def cdr_Type(x):
    props = getattr(x, "__props__", ()) or ()
    return [getattr(x, p, None) for p in props]


def apply_Op_ExpressionTuple(op, args):
    """Rebuild an application from (op, inputs) (reference
    ``apply_Op_ExpressionTuple``)."""
    return op(*args)


def eval_if_etuple(x):
    """Evaluate an expression-tuple-like value (reference helper): here
    (op, args) tuples."""
    if isinstance(x, tuple) and x and callable(x[0]):
        return x[0](*[eval_if_etuple(a) for a in x[1:]])
    return x


def convert_strs_to_vars(x, var_map=None):
    """Turn string placeholders into unification Vars (reference
    ``convert_strs_to_vars``)."""
    var_map = {} if var_map is None else var_map
    if isinstance(x, str):
        if x not in var_map:
            var_map[x] = var(x)
        return var_map[x]
    if isinstance(x, (tuple, list)):
        return type(x)(convert_strs_to_vars(e, var_map) for e in x)
    return x
