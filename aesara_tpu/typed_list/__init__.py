"""Typed variable-length lists (reference ``aesara/typed_list/``:
type.py:147, basic.py:69-645).  Host-side containers: list ops run on the
py path (XLA has no ragged buffers; use static-shape stacking for device
code)."""

from aesara_tpu.typed_list.type import TypedListType
from aesara_tpu.typed_list.basic import (
    Append,
    Count,
    Extend,
    GetItem,
    Index,
    Insert,
    Length,
    MakeList,
    Remove,
    Reverse,
    append,
    count,
    extend,
    getitem,
    index_,
    insert,
    length,
    make_list,
    remove,
    reverse,
)
from aesara_tpu.typed_list import rewriting  # noqa: F401
