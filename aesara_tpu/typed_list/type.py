"""TypedListType (reference ``aesara/typed_list/type.py:147``)."""

from __future__ import annotations

from aesara_tpu.graph.ir import Type, Variable


class TypedListType(Type):
    """A list whose elements all admit ``ttype``."""

    def __init__(self, ttype: Type, depth: int = 0):
        if depth < 0:
            raise ValueError("negative depth")
        self.ttype = TypedListType(ttype, depth - 1) if depth > 0 else ttype

    def filter(self, data, strict=False, allow_downcast=None):
        if not isinstance(data, list):
            raise TypeError(f"expected a list, got {type(data)}")
        return [self.ttype.filter(e, strict, allow_downcast) for e in data]

    def values_eq(self, a, b):
        return len(a) == len(b) and all(
            self.ttype.values_eq(x, y) for x, y in zip(a, b)
        )

    def __eq__(self, other):
        return type(other) is TypedListType and self.ttype == other.ttype

    def __hash__(self):
        return hash((TypedListType, self.ttype))

    def __str__(self):
        return f"TypedList<{self.ttype}>"

    def get_depth(self) -> int:
        if isinstance(self.ttype, TypedListType):
            return self.ttype.get_depth() + 1
        return 0


class TypedListVariable(Variable):
    def __getitem__(self, index):
        from aesara_tpu.typed_list.basic import getitem

        return getitem(self, index)

    def append(self, elem):
        from aesara_tpu.typed_list.basic import append

        return append(self, elem)

    def extend(self, other):
        from aesara_tpu.typed_list.basic import extend

        return extend(self, other)


TypedListType.variable_type = TypedListVariable
