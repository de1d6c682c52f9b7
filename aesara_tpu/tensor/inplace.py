"""Reference-parity ``tensor/inplace.py``.

The reference exposes ~100 destructive op instances (``neg_inplace``,
``add_inplace``, ...) that C linkers use to reuse input storage.  Under
whole-graph XLA the same storage reuse is expressed as *buffer
donation* (the DestroyHandler legality pass + donate_argnums), so the
``*_inplace`` names here resolve to the pure ops — identical values,
with in-place execution decided by the donation analysis instead of the
op instance.  ``from aesara_tpu.tensor.inplace import neg_inplace``
therefore keeps reference code importable and correct.
"""

from __future__ import annotations

import aesara_tpu.tensor.basic as _basic
import aesara_tpu.tensor.math as _math


def __getattr__(name):
    if name.endswith("_inplace"):
        base = name[: -len("_inplace")]
        for mod in (_math, _basic):
            fn = getattr(mod, base, None)
            if fn is not None:
                return fn
        raise AttributeError(
            f"tensor.inplace: no base op {base!r} for {name!r}"
        )
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    names = set()
    for mod in (_math, _basic):
        for n in dir(mod):
            if not n.startswith("_") and callable(getattr(mod, n, None)):
                names.add(n + "_inplace")
    return sorted(names)
