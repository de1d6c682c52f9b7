"""Comparator-driven scheduling toolkit (reference ``aesara/graph/sched.py``:
posort:159, sort_apply_nodes:226, sort_schedule_fn:253).

The reference used these to order MPI sends early and waits late; the
TPU build keeps them for custom linker schedules (e.g. ordering host
callbacks around device dispatch)."""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Sequence

from aesara_tpu.graph.ir import Apply, Variable, io_toposort


def make_depends():
    def depends(pair):
        """True if a depends on b."""
        a, b = pair
        return any(
            inp.owner is b for inp in a.inputs
        ) or any(
            _transitive(inp.owner, b, set()) for inp in a.inputs if inp.owner
        )

    def _transitive(node, target, seen):
        if node is None or id(node) in seen:
            return False
        seen.add(id(node))
        if node is target:
            return True
        return any(
            _transitive(i.owner, target, seen) for i in node.inputs if i.owner
        )

    return depends


def make_dependence_cmp():
    """Comparator: -1 if a must run before b (reference ``:139``)."""
    depends = make_depends()

    def dependence(a, b):
        if depends((a, b)):
            return 1
        if depends((b, a)):
            return -1
        return 0

    return dependence


def posort(elements: Sequence, *cmps: Callable) -> list:
    """Partial-order sort: a stable toposort honoring a chain of
    comparators (reference ``sched.py:159``)."""
    elements = list(elements)
    n = len(elements)
    # build precedence edges from the comparator chain (first nonzero wins)
    preds = defaultdict(set)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            for cmp_fn in cmps:
                c = cmp_fn(elements[i], elements[j])
                if c:
                    if c < 0:
                        preds[j].add(i)
                    else:
                        preds[i].add(j)
                    break
    result = []
    emitted = set()
    while len(result) < n:
        progressed = False
        for i in range(n):
            if i in emitted:
                continue
            if preds[i] <= emitted:
                result.append(elements[i])
                emitted.add(i)
                progressed = True
        if not progressed:
            raise ValueError("comparator cycle in posort")
    return result


def sort_apply_nodes(inputs, outputs, cmps) -> list:
    """Toposort refined by extra comparators (reference ``:226``)."""
    base = io_toposort(inputs, outputs)
    dependence = make_dependence_cmp()
    return posort(base, dependence, *cmps)


def sort_schedule_fn(*cmps):
    """Scheduler factory for linkers (reference ``:253``)."""

    def schedule(fgraph):
        return sort_apply_nodes(fgraph.inputs, fgraph.outputs, cmps)

    return schedule


def key_to_cmp(key):
    def key_cmp(a, b):
        ka, kb = key(a), key(b)
        return -1 if ka < kb else (1 if ka > kb else 0)

    return key_cmp


def reverse_dict(d: dict) -> dict:
    """{a: set(children)} → {child: set(parents)} (reference helper)."""
    out: dict = {}
    for k, vals in d.items():
        for v in vals:
            out.setdefault(v, set()).add(k)
    return out


def memodict(fn):
    """Single-argument memoizer (reference ``memodict``)."""
    cache: dict = {}

    def wrapped(x):
        if x not in cache:
            cache[x] = fn(x)
        return cache[x]

    wrapped.cache = cache
    return wrapped
