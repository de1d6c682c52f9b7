"""Tensor-layer helpers (reference ``tensor/utils.py``)."""

from __future__ import annotations

import numpy as np

__all__ = ["hash_from_ndarray", "shape_of_variables", "as_list"]


def hash_from_ndarray(data) -> str:
    """Content hash of an ndarray: dtype + shape + buffer (reference
    ``hash_from_ndarray``; used for constant signatures and cache keys)."""
    import hashlib

    arr = np.ascontiguousarray(data)
    h = hashlib.sha256()
    h.update(str((arr.dtype, arr.shape)).encode())
    h.update(arr.tobytes())
    return h.hexdigest()


def shape_of_variables(fgraph, input_shapes):
    """{variable: concrete shape tuple} for every variable in ``fgraph``
    given concrete input shapes (reference ``shape_of_variables``,
    tensor/utils.py:34) — evaluates the ShapeFeature's symbolic shape
    graphs numerically.  ``input_shapes`` must be keyed by
    ``fgraph.inputs`` (FunctionGraph clones by default — pass
    ``clone=False`` or use the cloned inputs, as the reference warns).

    .. warning:: attaches a ShapeFeature to ``fgraph``; not pure.
    """
    from aesara_tpu.compile.function import function
    from aesara_tpu.graph.ir import clone_replace
    from aesara_tpu.tensor.rewriting.shape import ShapeFeature
    from aesara_tpu.tensor.type import TensorType

    if any(i not in fgraph.inputs for i in input_shapes):
        raise ValueError(
            "input_shapes keys aren't in fgraph.inputs. FunctionGraph "
            "clones its graph by default; pass clone=False or key by "
            "the cloned inputs."
        )
    if not hasattr(fgraph, "shape_feature"):
        fgraph.attach_feature(ShapeFeature())
    sf = fgraph.shape_feature

    input_dims = [
        dim for inp in fgraph.inputs
        for dim in (sf.shape_of.get(inp) or ())
    ]
    out_list = list({
        dim: None
        for dims in sf.shape_of.values() if dims is not None
        for dim in dims
    })
    # shape entries are graphs OVER the fgraph inputs, not roots: clone
    # the shape graphs with fresh int64 roots standing in for each
    # input-dimension entry
    fresh = [TensorType("int64", ())() for _ in input_dims]
    replaced = clone_replace(out_list, replace=dict(zip(input_dims, fresh)))
    compute = function(fresh, replaced, on_unused_input="ignore", mode="PY")
    flat_vals = [
        np.asarray(s, dtype="int64")
        for inp in fgraph.inputs
        for s in input_shapes[inp]
    ]
    numeric = compute(*flat_vals)
    value_of = dict(zip(out_list, numeric))
    return {
        var: tuple(np.asarray(value_of[d]) for d in dims)
        for var, dims in sf.shape_of.items()
        if dims is not None
    }


def as_list(x):
    """Wrap non-list/tuple in a list (reference ``as_list``)."""
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]
