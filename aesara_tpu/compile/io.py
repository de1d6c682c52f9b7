"""``In``/``Out`` specs for compiled-function arguments
(reference ``aesara/compile/io.py:108,227``)."""

from __future__ import annotations

from typing import Any, Optional

from aesara_tpu.graph.ir import Variable


class SymbolicInput:
    """One input slot of a compiled function (reference ``io.py:30``)."""

    def __init__(
        self,
        variable: Variable,
        name: Optional[str] = None,
        update: Optional[Variable] = None,
        mutable: Optional[bool] = None,
        strict: bool = False,
        allow_downcast=None,
        autoname: bool = True,
        implicit: bool = False,
        value: Any = None,
        shared: bool = False,
    ):
        self.variable = variable
        self.name = name if name is not None else (variable.name if autoname else None)
        self.update = update
        if update is not None:
            self.update = variable.type.filter_variable(update, allow_convert=True)
        self.mutable = mutable if mutable is not None else (update is not None)
        self.strict = strict
        self.allow_downcast = allow_downcast
        self.implicit = implicit
        self.value = value
        self.shared = shared

    def __str__(self):
        if self.update is not None:
            return f"In({self.variable} -> {self.update})"
        return f"In({self.variable})"

    __repr__ = __str__


class In(SymbolicInput):
    """User-facing input spec (reference ``io.py:108``)."""

    def __init__(
        self,
        variable: Variable,
        name: Optional[str] = None,
        value: Any = None,
        update: Optional[Variable] = None,
        mutable: Optional[bool] = None,
        strict: bool = False,
        allow_downcast=None,
        autoname: bool = True,
        implicit: Optional[bool] = None,
        borrow: Optional[bool] = None,
        shared: bool = False,
        batched: Optional[bool] = None,
        seq_bucketed: Optional[int] = None,
    ):
        if borrow is None:
            borrow = mutable if mutable is not None else False
        if implicit is None:
            implicit = value is not None and isinstance(value, Variable)
        super().__init__(
            variable, name=name, update=update, mutable=mutable, strict=strict,
            allow_downcast=allow_downcast, autoname=autoname, implicit=implicit,
            value=value, shared=shared,
        )
        self.borrow = borrow
        #: dynamic-shape bucketing role (compile/bucketing.py):
        #: True  — this input's leading dim IS the batch to pad;
        #: False — never pad this input;
        #: None  — heuristic (padded iff its leading dim is typed None,
        #:         unless any input in the function is marked True)
        self.batched = batched
        #: second bucketed dim (compile/bucketing.py, sequence-length
        #: policy): the AXIS of this input that carries a dynamic sequence
        #: length, ZERO-padded up to the shape_buckets bucket.  Declaring
        #: it asserts the graph is pad-tolerant at that axis (masked
        #: attention / explicit-length semantics) — the driver pads and
        #: re-slices, the graph author owns masking.  None — not a
        #: sequence input.
        self.seq_bucketed = seq_bucketed


class SymbolicOutput:
    """One output slot (reference ``io.py:227`` Out)."""

    def __init__(self, variable: Variable, borrow: bool = False):
        self.variable = variable
        self.borrow = borrow

    def __str__(self):
        return f"Out({self.variable})"

    __repr__ = __str__


Out = SymbolicOutput
