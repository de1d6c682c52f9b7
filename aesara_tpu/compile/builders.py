"""``OpFromGraph``: encapsulate a subgraph as a reusable Op
(reference ``aesara/compile/builders.py:188``, construct_nominal_fgraph
:85, inline rewrite :1047)."""

from __future__ import annotations

import itertools

from typing import Callable, List, Optional, Sequence, Union

import numpy as np

from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Apply, Constant, Variable, clone_replace, graph_inputs
from aesara_tpu.graph.op import HasInnerGraph, Op


__all__ = ["OpFromGraph", "construct_nominal_fgraph"]


def construct_nominal_fgraph(inputs, outputs):
    """Clone (inputs, outputs) into an isolated inner graph, lifting any
    extra leaves (shared vars, closure captures) into hidden inputs
    (reference ``builders.py:85``)."""
    extra = [
        v for v in graph_inputs(outputs)
        if v not in inputs and not isinstance(v, Constant)
    ]
    all_inputs = list(inputs) + extra
    replace = {v: v.type() for v in all_inputs}
    for old, new in replace.items():
        new.name = getattr(old, "name", None)
    new_outputs = clone_replace(outputs, replace=replace)
    new_inputs = [replace[v] for v in all_inputs]
    fgraph = FunctionGraph(new_inputs, new_outputs, clone=False)
    return fgraph, len(extra), extra


class OpFromGraph(Op, HasInnerGraph):
    """A subgraph packaged as an op, with optional custom grad/R_op."""

    def __init__(
        self,
        inputs: Sequence[Variable],
        outputs: Sequence[Variable],
        inline: bool = False,
        lop_overrides="default",
        grad_overrides="default",
        rop_overrides="default",
        connection_pattern=None,
        name: Optional[str] = None,
        **kwargs,
    ):
        if not isinstance(inputs, (list, tuple)) or not isinstance(outputs, (list, tuple)):
            raise TypeError("inputs and outputs must be lists")
        for i in inputs:
            if isinstance(i, Constant):
                raise TypeError("OpFromGraph inputs cannot be constants")
        self.fgraph, self.n_extra, self.extra_outer = construct_nominal_fgraph(
            list(inputs), list(outputs)
        )
        self.is_inline = bool(inline)
        self.lop_overrides = lop_overrides if lop_overrides != "default" else (
            grad_overrides if grad_overrides != "default" else "default"
        )
        self.rop_overrides = rop_overrides
        self._connection_pattern = connection_pattern
        self.name = name or "OpFromGraph"
        self.n_explicit = len(inputs)
        self._perform_fn = None

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    @property
    def fn(self):
        return self._make_perform_fn()

    @property
    def inner_inputs(self):
        return self.fgraph.inputs

    @property
    def inner_outputs(self):
        return self.fgraph.outputs

    def clone(self):
        import copy

        new = copy.copy(self)
        new.fgraph = self.fgraph.clone(check_integrity=False)
        new._perform_fn = None
        return new

    def make_node(self, *inputs) -> Apply:
        if len(inputs) == self.n_explicit:
            inputs = list(inputs) + list(self.extra_outer)
        if len(inputs) != len(self.fgraph.inputs):
            raise ValueError(
                f"{self.name} expected {self.n_explicit} inputs, got {len(inputs)}"
            )
        coerced = [
            iv.type.filter_variable(v, allow_convert=True)
            for iv, v in zip(self.fgraph.inputs, inputs)
        ]
        return Apply(self, coerced, [o.type() for o in self.fgraph.outputs])

    def _make_perform_fn(self):
        if self._perform_fn is None:
            from aesara_tpu.link.basic import PerformLinker

            linker = PerformLinker(allow_gc=False)
            linker.accept(self.fgraph.clone(check_integrity=False))
            fn, in_c, out_c = linker.make_thunk()

            def run(*vals):
                for c, v in zip(in_c, vals):
                    c.storage[0] = v
                fn()
                return [c.storage[0] for c in out_c]

            self._perform_fn = run
        return self._perform_fn

    def perform(self, node, inputs, output_storage):
        res = self._make_perform_fn()(*inputs)
        for storage, r in zip(output_storage, res):
            storage[0] = r

    def infer_shape(self, fgraph, node, input_shapes):
        # propagate through the inner graph symbolically, then re-express
        # the resulting shape graphs over the OUTER inputs (clone_replace
        # re-embeds any inner intermediates they reference)
        inner_shapes = infer_shape(
            list(self.fgraph.outputs), list(self.fgraph.inputs), input_shapes
        )
        repl = dict(zip(self.fgraph.inputs, node.inputs))
        flat, spans = [], []
        for sh in inner_shapes:
            if sh is None:
                spans.append(None)
            else:
                spans.append((len(flat), len(flat) + len(sh)))
                flat.extend(sh)
        cloned = clone_replace(flat, replace=repl) if flat else []
        out = []
        for o, span in zip(node.outputs, spans):
            if span is None:
                from aesara_tpu.tensor.shape import shape as tshape

                out.append(
                    tuple(tshape(o)[d] for d in range(o.type.ndim))
                    if hasattr(o.type, "ndim") else None
                )
            else:
                out.append(tuple(cloned[span[0]: span[1]]))
        return out

    def connection_pattern(self, node):
        if self._connection_pattern is not None:
            return self._connection_pattern
        from aesara_tpu.graph.ir import io_connection_pattern

        return io_connection_pattern(self.fgraph.inputs, self.fgraph.outputs)

    def L_op(self, inputs, outputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType, NullType, grad as sym_grad

        if callable(self.lop_overrides):
            return self.lop_overrides(inputs, output_grads)
        if isinstance(self.lop_overrides, (list, tuple)):
            raise NotImplementedError("per-input lop overrides land later")

        inner_in = self.fgraph.inputs
        inner_out = self.fgraph.outputs
        known = {}
        g_placeholders = []
        for o, g in zip(inner_out, output_grads):
            if isinstance(g.type, (DisconnectedType, NullType)):
                g_placeholders.append(None)
                continue
            ph = o.type()
            known[o] = ph
            g_placeholders.append(ph)
        inner_grads = sym_grad(
            None, list(inner_in), known_grads=known,
            disconnected_inputs="ignore", return_disconnected="zero",
        )
        if not isinstance(inner_grads, list):
            inner_grads = [inner_grads]
        replace = dict(zip(inner_in, inputs))
        for ph, g in zip(g_placeholders, output_grads):
            if ph is not None:
                replace[ph] = g
        safe = [
            g for g in inner_grads
            if not isinstance(getattr(g, "type", None), (DisconnectedType, NullType))
        ]
        cloned = clone_replace(safe, replace=replace)
        it = iter(cloned)
        return [
            g if isinstance(getattr(g, "type", None), (DisconnectedType, NullType))
            else next(it)
            for g in inner_grads
        ]

    def R_op(self, inputs, eval_points):
        if callable(self.rop_overrides):
            return self.rop_overrides(inputs, eval_points)
        raise NotImplementedError("use gradient.Rop (double-backward)")

    def __str__(self):
        return self.name


# ---------------------------------------------------------------------------
# inline expansion (reference compile/builders.py:1047 inline_ofg_expansion)
# ---------------------------------------------------------------------------

def _inline_ofg_node(fgraph, node):
    """Replace an ``OpFromGraph(inline=True)`` application with its inner
    graph, substituting the outer inputs — lets XLA fuse across the
    encapsulation boundary."""
    op = node.op
    if not isinstance(op, OpFromGraph) or not op.is_inline:
        return False
    from aesara_tpu.graph.ir import clone_replace

    return clone_replace(
        list(op.inner_outputs), replace=dict(zip(op.inner_inputs, node.inputs))
    )


def _register_inline_ofg():
    # called from aesara_tpu/__init__ once the optdb exists (the direct
    # import here would be circular: mode -> jax linker -> builders)
    from aesara_tpu.compile.mode import register_specialize
    from aesara_tpu.graph.rewriting.basic import node_rewriter

    rw = node_rewriter([OpFromGraph])(_inline_ofg_node)
    rw.__name__ = "inline_ofg_expansion"
    rw.name = "inline_ofg_expansion"
    register_specialize(rw, name="inline_ofg_expansion")


#: reference rewrite-name export (the registered pass defined above)
inline_ofg_expansion = _inline_ofg_node


def infer_shape(outs, inputs, input_shapes):
    """Compute output shapes of a graph given symbolic input shapes
    WITHOUT compiling it (reference ``builders.py:32``).

    Seeds a detached ``ShapeFeature`` with ``input_shapes`` and walks
    the graph backward from ``outs``, running each op's ``infer_shape``
    rule; returns one tuple of int64 scalar Variables per output (or
    ``None`` for non-tensor outputs).
    """
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.tensor.rewriting.shape import ShapeFeature

    for inp, shp in zip(inputs, input_shapes):
        if (
            shp is not None
            and hasattr(inp.type, "ndim")
            and len(shp) != inp.type.ndim
        ):
            raise ValueError(
                f"input shape {shp} has {len(shp)} dims for "
                f"{inp.type.ndim}-d input {inp}"
            )

    shape_feature = ShapeFeature()
    dummy_fgraph = FunctionGraph([], [], clone=False)
    shape_feature.on_attach(dummy_fgraph)
    for inp, shp in zip(inputs, input_shapes):
        shape_feature.set_shape(inp, shp)

    def traverse(out):
        # iterative post-order: shapes of a node's inputs before the node
        stack = [out]
        while stack:
            v = stack[-1]
            if v in shape_feature.shape_of:
                stack.pop()
                continue
            if v.owner is None:
                shape_feature.init_r(v)
                stack.pop()
                continue
            pending = [
                i for i in v.owner.inputs if i not in shape_feature.shape_of
            ]
            if pending:
                stack.extend(pending)
            else:
                shape_feature.on_import(dummy_fgraph, v.owner, "infer_shape")
                stack.pop()

    ret = []
    for o in outs:
        traverse(o)
        ret.append(shape_feature.shape_of.get(o))
    return ret


# ---------------------------------------------------------------------------
# Rematerialization (the SURVEY "jax.checkpoint" lever, graph-level)
# ---------------------------------------------------------------------------

class RematBarrier(Op):
    """Identity whose XLA lowering is ``lax.optimization_barrier`` —
    XLA's CSE cannot merge computation behind it with an identical
    subgraph outside it.  The ``nonce`` prop keeps the graph-level
    MergeOptimizer from unifying two barriers either."""

    __props__ = ("nonce",)
    view_map = {0: [0]}

    def __init__(self, nonce: int):
        self.nonce = int(nonce)

    def make_node(self, x):
        from aesara_tpu.tensor.basic import as_tensor_variable

        x = as_tensor_variable(x)
        return Apply(self, [x], [x.type()])

    def perform(self, node, inputs, output_storage):
        output_storage[0][0] = inputs[0]

    def infer_shape(self, fgraph, node, input_shapes):
        return [input_shapes[0]]

    def grad(self, inputs, output_grads):
        return [output_grads[0]]

    def R_op(self, inputs, eval_points):
        return [eval_points[0]]

    def __str__(self):
        return f"RematBarrier{{{self.nonce}}}"


_remat_nonce = itertools.count()


class Remat(OpFromGraph):
    """OpFromGraph whose GRADIENT recomputes the forward instead of
    sharing its intermediates — rematerialization, trading FLOPs for
    activation memory (the role ``jax.checkpoint`` plays for jax AD;
    here the recompute is symbolic and fenced from the graph merger and
    from XLA CSE by :class:`RematBarrier` — the same
    ``optimization_barrier`` mechanism ``jax.checkpoint`` itself uses.
    Accelerator pipelines honor it; the CPU pipeline may elide the
    barrier late and fold the recompute back, which only costs the
    memory saving where memory was not scarce anyway).

    Build through :func:`remat`.
    """

    def L_op(self, inputs, outputs, output_grads):
        from aesara_tpu.gradient import DisconnectedType, Lop
        from aesara_tpu.graph.ir import clone_replace

        nonce = next(_remat_nonce)
        fenced = [RematBarrier(nonce)(i) for i in inputs]
        inner_ins = list(self.fgraph.inputs)
        inner_outs = list(self.fgraph.outputs)
        recomputed = clone_replace(
            inner_outs, replace=dict(zip(inner_ins, fenced))
        )
        live = [
            (r, g) for r, g in zip(recomputed, output_grads)
            if not isinstance(getattr(g, "type", None), DisconnectedType)
        ]
        if not live:
            return [DisconnectedType()() for _ in inputs]
        outs_l, grads_l = zip(*live)
        # VJP wrt the FENCED variables — they are independent roots.
        # Differentiating wrt the node inputs directly would double-count
        # whenever one input is an ancestor of another (e.g. a captured
        # shared feeding the explicit input), because the recompute graph
        # reaches the ancestor through BOTH.
        res = Lop(list(outs_l), fenced, list(grads_l),
                  disconnected_inputs="ignore")
        return list(res) if isinstance(res, (list, tuple)) else [res]


def remat(inputs, outputs, name=None):
    """Package ``outputs = f(inputs)`` as a rematerializing op: the
    backward pass rebuilds the forward subgraph (behind an optimization
    barrier) rather than keeping its intermediates alive — the
    symbolic-AD equivalent of ``jax.checkpoint``.  Use on memory-heavy
    blocks (e.g. each transformer layer) to trade ~33% more FLOPs for
    O(layers) less activation HBM::

        h_out = remat([h, w1, w2], [layer_forward(h, w1, w2)])(h, w1, w2)
    """
    single = not isinstance(outputs, (list, tuple))
    outs = [outputs] if single else list(outputs)
    op = Remat(list(inputs), outs, inline=False,
               name=name or "remat")
    return op
