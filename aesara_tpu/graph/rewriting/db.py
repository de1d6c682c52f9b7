"""Tag-indexed rewrite databases and queries.

Re-design of the reference's ``aesara/graph/rewriting/db.py``
(RewriteDatabase:17, RewriteDatabaseQuery:180, EquilibriumDB:292,
SequenceDB:369, LocalGroupDB:476, TopoDB:502, ProxyDB:523).  A database
maps names/tags to rewriters; a :class:`RewriteDatabaseQuery` selects a
subset by include/exclude/require tags; :class:`SequenceDB` orders its
members by float positions — this ordering IS the compiler pass pipeline
(SURVEY §2.3).
"""

from __future__ import annotations

import copy
import math
from functools import cmp_to_key
from typing import Iterable, Optional, Sequence, Union


class RewriteDatabase:
    """Name/tag registry of rewriters (ref ``db.py:17``)."""

    def __init__(self):
        self.__db__: dict = {}
        self._names: set = set()
        self.name: Optional[str] = None

    def register(self, name: str, rewriter, *tags, use_db_name_as_tag: bool = True, **kwargs):
        if not isinstance(name, str):
            raise TypeError(f"rewrite name must be a str, got {type(name)}")
        if name in self.__db__ and name in self._names:
            raise ValueError(f"rewrite name {name!r} already registered")
        if use_db_name_as_tag and self.name is not None:
            tags = tags + (self.name,)
        rewriter.name = name
        self.__db__.setdefault(name, set()).add(rewriter)
        self._names.add(name)
        self.__db__.setdefault(rewriter.__class__.__name__, set()).add(rewriter)
        for tag in tags:
            if not isinstance(tag, str):
                raise TypeError(f"tags must be str, got {type(tag)}")
            self.__db__.setdefault(tag, set()).add(rewriter)
        self.add_tags(name)  # allow subclasses to hook (no-op here)

    def add_tags(self, name: str, *tags) -> None:
        if not tags:
            return
        rewriters = self.__db__[name]
        for tag in tags:
            for rw in rewriters:
                self.__db__.setdefault(tag, set()).add(rw)

    def remove_tags(self, name: str, *tags) -> None:
        rewriters = self.__db__[name]
        for tag in tags:
            if tag in self.__db__:
                self.__db__[tag] -= rewriters

    def __query__(self, q: "RewriteDatabaseQuery") -> set:
        selected: set = set()
        for tag in q.include:
            selected |= self.__db__.get(tag, set())
        for tag in q.require:
            selected &= self.__db__.get(tag, set())
        for tag in q.exclude:
            selected -= self.__db__.get(tag, set())
        # apply per-rewriter sub-queries; the compiled result inherits the
        # sub-db's registered name so SequenceDB position lookup still works
        remove, add = set(), set()
        for rw in selected:
            if isinstance(rw, RewriteDatabase):
                remove.add(rw)
                sub = rw.query(q)
                if sub is not None:
                    if getattr(sub, "name", None) is None:
                        sub.name = rw.name
                    add.add(sub)
        return (selected - remove) | add

    def query(self, *tags, **kwtags):
        """Accepts a RewriteDatabaseQuery or '+tag'/'-tag' strings."""
        if len(tags) == 1 and isinstance(tags[0], RewriteDatabaseQuery):
            return self.__query__(tags[0])
        include = [t[1:] for t in tags if t.startswith("+")]
        exclude = [t[1:] for t in tags if t.startswith("-")]
        require = [t[1:] for t in tags if t.startswith("&")]
        plain = [t for t in tags if t[:1] not in "+-&"]
        include += plain
        return self.__query__(
            RewriteDatabaseQuery(include=include, require=require, exclude=exclude, **kwtags)
        )

    def __getitem__(self, name: str):
        variants = self.__db__[name]
        if len(variants) != 1:
            raise KeyError(f"{name!r} is ambiguous or missing")
        return next(iter(variants))

    def __contains__(self, name: str) -> bool:
        return name in self.__db__

    def print_summary(self, stream=None):
        import sys

        stream = stream or sys.stdout
        print(f"{self.__class__.__name__} (id {id(self)})", file=stream)
        print(f"  names {sorted(self._names)}", file=stream)
        print(f"  db {sorted(self.__db__)}", file=stream)


class RewriteDatabaseQuery:
    """Tag selector (ref ``db.py:180``)."""

    def __init__(
        self,
        include: Iterable[str] = (),
        require: Iterable[str] = (),
        exclude: Iterable[str] = (),
        subquery: Optional[dict] = None,
        position_cutoff: float = math.inf,
        extra_rewrites: Sequence = (),
    ):
        self.include = frozenset(include)
        self.require = frozenset(require)
        self.exclude = frozenset(exclude)
        self.subquery = subquery or {}
        self.position_cutoff = position_cutoff
        self.extra_rewrites = tuple(extra_rewrites)

    def including(self, *tags) -> "RewriteDatabaseQuery":
        return RewriteDatabaseQuery(
            self.include | set(tags), self.require, self.exclude,
            self.subquery, self.position_cutoff, self.extra_rewrites,
        )

    def excluding(self, *tags) -> "RewriteDatabaseQuery":
        return RewriteDatabaseQuery(
            self.include, self.require, self.exclude | set(tags),
            self.subquery, self.position_cutoff, self.extra_rewrites,
        )

    def requiring(self, *tags) -> "RewriteDatabaseQuery":
        return RewriteDatabaseQuery(
            self.include, self.require | set(tags), self.exclude,
            self.subquery, self.position_cutoff, self.extra_rewrites,
        )

    def register(self, *rewrites) -> "RewriteDatabaseQuery":
        return RewriteDatabaseQuery(
            self.include, self.require, self.exclude,
            self.subquery, self.position_cutoff,
            self.extra_rewrites + tuple(rewrites),
        )

    def __str__(self):
        return (
            f"RewriteDatabaseQuery(inc={sorted(self.include)}, "
            f"req={sorted(self.require)}, exc={sorted(self.exclude)}, "
            f"cutoff={self.position_cutoff})"
        )


class EquilibriumDB(RewriteDatabase):
    """Database whose query result is an EquilibriumGraphRewriter running
    all members to fixed point (ref ``db.py:292``)."""

    def __init__(self, ignore_newtrees: bool = True, tracks_on_change_inputs: bool = False):
        super().__init__()
        self.ignore_newtrees = ignore_newtrees
        self.tracks_on_change_inputs = tracks_on_change_inputs
        self.__final__: dict = {}
        self.__cleanup__: dict = {}

    def register(self, name, rewriter, *tags, final_rewriter=False, cleanup=False, **kwargs):
        super().register(name, rewriter, *tags, **kwargs)
        self.__final__[name] = final_rewriter
        self.__cleanup__[name] = cleanup

    def query(self, *tags, **kwtags):
        from aesara_tpu.graph.rewriting.basic import EquilibriumGraphRewriter

        rewriters = super().query(*tags, **kwtags)
        if not rewriters:
            return None
        names = {getattr(r, "name", None): r for r in rewriters}
        final = [r for n, r in names.items() if self.__final__.get(n)]
        cleanup = [r for n, r in names.items() if self.__cleanup__.get(n)]
        core = [r for r in rewriters if r not in final and r not in cleanup]
        return EquilibriumGraphRewriter(
            core,
            max_use_ratio=10.0,
            ignore_newtrees=self.ignore_newtrees,
            tracks_on_change_inputs=self.tracks_on_change_inputs,
            final_rewriters=final or None,
            cleanup_rewriters=cleanup or None,
        )


class SequenceDB(RewriteDatabase):
    """Database ordered by float positions; query returns a
    SequentialGraphRewriter (ref ``db.py:369``)."""

    seq_rewriter_type = None  # set lazily to SequentialGraphRewriter

    def __init__(self, failure_callback=None):
        super().__init__()
        self.__position__: dict = {}
        self.failure_callback = failure_callback

    def register(self, name, rewriter, *tags, position: Union[float, str] = "last", **kwargs):
        super().register(name, rewriter, *tags, **kwargs)
        if position == "last":
            position = max(self.__position__.values(), default=0.0) + 1.0
        if not isinstance(position, (int, float)):
            raise TypeError(f"position must be numeric or 'last', got {position!r}")
        self.__position__[name] = float(position)

    def query(self, *tags, position_cutoff: Optional[float] = None, **kwtags):
        from aesara_tpu.graph.rewriting.basic import SequentialGraphRewriter

        q = tags[0] if len(tags) == 1 and isinstance(tags[0], RewriteDatabaseQuery) else None
        if position_cutoff is None:
            position_cutoff = q.position_cutoff if q is not None else math.inf

        rewriters = RewriteDatabase.query(self, *tags, **kwtags)
        picked = [
            (self.__position__.get(getattr(r, "name", None), math.inf), r)
            for r in rewriters
        ]
        picked = [(p, r) for p, r in picked if p < position_cutoff]
        if q is not None and q.extra_rewrites:
            for rw, pos in q.extra_rewrites:
                if pos < position_cutoff:
                    picked.append((float(pos), rw))
        picked.sort(key=lambda pr: (pr[0], str(getattr(pr[1], "name", ""))))
        kwargs = {}
        if self.failure_callback:
            kwargs["failure_callback"] = self.failure_callback
        return SequentialGraphRewriter(*[r for _, r in picked], **kwargs)

    def print_summary(self, stream=None):
        import sys

        stream = stream or sys.stdout
        positions = sorted(self.__position__.items(), key=lambda kv: kv[1])
        print(f"SequenceDB (id {id(self)})", file=stream)
        for name, pos in positions:
            print(f"  {pos:7.3f}  {name}", file=stream)


class LocalGroupDB(SequenceDB):
    """Sequence of node rewriters applied as one local pass (ref ``db.py:476``)."""

    def __init__(self, apply_all_rewrites: bool = False, profile: bool = False):
        super().__init__()
        self.apply_all_rewrites = apply_all_rewrites

    def register(self, name, rewriter, *tags, position="last", **kwargs):
        super().register(name, rewriter, *tags, position=position, **kwargs)

    def query(self, *tags, **kwtags):
        from aesara_tpu.graph.rewriting.basic import SequentialNodeRewriter

        q = tags[0] if len(tags) == 1 and isinstance(tags[0], RewriteDatabaseQuery) else None
        rewriters = RewriteDatabase.query(self, *tags, **kwtags)
        picked = sorted(
            rewriters,
            key=lambda r: self.__position__.get(getattr(r, "name", None), math.inf),
        )
        return SequentialNodeRewriter(*picked, apply_all_rewrites=self.apply_all_rewrites)


class TopoDB(RewriteDatabase):
    """Wraps a db of node rewriters into one topological walking pass
    (ref ``db.py:502``)."""

    def __init__(self, db, order: str = "in_to_out", ignore_newtrees: bool = False,
                 failure_callback=None):
        super().__init__()
        self.db = db
        self.order = order
        self.ignore_newtrees = ignore_newtrees
        self.failure_callback = failure_callback

    def query(self, *tags, **kwtags):
        from aesara_tpu.graph.rewriting.basic import WalkingGraphRewriter

        node_rw = self.db.query(*tags, **kwtags)
        if node_rw is None:
            return None
        return WalkingGraphRewriter(
            node_rw,
            order=self.order,
            ignore_newtrees=self.ignore_newtrees,
            failure_callback=self.failure_callback,
        )

    def register(self, name, rewriter, *tags, **kwargs):
        self.db.register(name, rewriter, *tags, **kwargs)


class ProxyDB(RewriteDatabase):
    """Delegates queries to another db (ref ``db.py:523``)."""

    def __init__(self, db):
        super().__init__()
        self.db = db

    def query(self, *tags, **kwtags):
        return self.db.query(*tags, **kwtags)
