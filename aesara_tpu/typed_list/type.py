"""TypedListType (reference ``aesara/typed_list/type.py:147``)."""

from __future__ import annotations

from aesara_tpu.graph.ir import Constant, Type, Variable


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
    """Variable of a TypedListType (reference name; full operator
    sugar).  Method bodies lazy-import the ops to avoid the
    type↔ops circular import — this is the ONE definition; basic.py
    re-exports it (review finding: a weaker duplicate used to be
    silently shadowed depending on import order)."""

    def __getitem__(self, index):
        from aesara_tpu.typed_list.basic import getitem

        return getitem(self, index)

    def __len__(self):
        raise TypeError("use typed_list.length(x) for the symbolic length")

    def append(self, elem):
        from aesara_tpu.typed_list.basic import append

        return append(self, elem)

    def extend(self, other):
        from aesara_tpu.typed_list.basic import extend

        return extend(self, other)

    def insert(self, index, new):
        from aesara_tpu.typed_list.basic import insert

        return insert(self, index, new)

    def remove(self, v):
        from aesara_tpu.typed_list.basic import remove

        return remove(self, v)

    def reverse(self):
        from aesara_tpu.typed_list.basic import reverse

        return reverse(self)

    def count(self, v):
        from aesara_tpu.typed_list.basic import count

        return count(self, v)

    def ind(self, v):
        # named `ind` like the reference: `index` is the Variable slot
        # recording this variable's position among its owner's outputs
        from aesara_tpu.typed_list.basic import index_

        return index_(self, v)

    ttype = property(lambda self: self.type.ttype)


class TypedListConstant(TypedListVariable, Constant):
    pass


TypedListType.variable_type = TypedListVariable
TypedListType.constant_type = TypedListConstant
