"""The ``Op`` contract: node construction, eager evaluation, autodiff hooks,
and shape inference.

TPU-native re-design of the reference's ``aesara/graph/op.py:147``.  The
reference's C-codegen hooks (``c_code`` & friends) are replaced by a
per-op XLA lowering registry (``aesara_tpu.link.jax.dispatch.jax_funcify``)
— SURVEY §2.10 / §7 stage 3.  ``perform`` stays as the NumPy reference
semantics used by the py-mode oracle and differential tests.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

from aesara_tpu.graph.ir import Apply, Constant, Variable
from aesara_tpu.utils import MethodNotDefined, TestValueError, add_tag_trace


__all__ = [
    "Op",
    "HasInnerGraph",
    "COp",
    "compute_test_value",
    "get_test_value",
    "get_test_values",
    "missing_test_message",
]


class Op:
    """A symbolic operation.

    Contract (mirrors reference ``graph/op.py``):

    - ``make_node(*inputs) -> Apply`` — validate/coerce inputs, build output
      Variables with inferred Types (ref ``:210``).
    - ``__call__(*inputs)`` — make_node + return default output(s) (ref ``:252``).
    - ``perform(node, inputs, output_storage)`` — NumPy evaluation used by
      the py linker / test oracle (ref ``:416``).
    - ``grad / L_op / R_op`` — symbolic autodiff (ref ``:320,363,392``).
    - ``infer_shape(fgraph, node, input_shapes)`` — symbolic shape rule.
    - ``view_map / destroy_map`` — aliasing metadata; on TPU this feeds the
      buffer-donation legality pass instead of in-place C code.
    """

    #: names of __props__ define equality/hash for parametrized ops
    __props__: tuple = None

    default_output: Optional[int] = None
    view_map: dict = {}
    destroy_map: dict = {}
    itypes: Optional[Sequence] = None
    otypes: Optional[Sequence] = None

    def make_node(self, *inputs: Variable) -> Apply:
        if self.itypes is None or self.otypes is None:
            raise NotImplementedError(
                f"{type(self).__name__} must implement make_node or itypes/otypes"
            )
        if len(inputs) != len(self.itypes):
            raise ValueError(
                f"{self} expected {len(self.itypes)} inputs, got {len(inputs)}"
            )
        coerced = [it.filter_variable(inp) for it, inp in zip(self.itypes, inputs)]
        return Apply(self, coerced, [ot() for ot in self.otypes])

    def __call__(self, *inputs, name=None, return_list=False, **kwargs):
        """Build the Apply node and return its output(s) (ref ``:252``).

        Also propagates test values when ``config.compute_test_value`` is on.
        """
        node = self.make_node(*inputs, **kwargs)
        if name is not None:
            if len(node.outputs) == 1:
                node.outputs[0].name = name
            else:
                for i, o in enumerate(node.outputs):
                    o.name = f"{name}_{i}"
        for o in node.outputs:
            add_tag_trace(o)

        from aesara_tpu.config import config

        if config.compute_test_value != "off":
            compute_test_value(node)

        if self.default_output is not None:
            rval = node.outputs[self.default_output]
            return [rval] if return_list else rval
        if len(node.outputs) == 1 and not return_list:
            return node.outputs[0]
        return node.outputs

    # --- evaluation -------------------------------------------------------
    def perform(
        self, node: Apply, inputs: Sequence[Any], output_storage: Sequence[list]
    ) -> None:
        """NumPy-semantics evaluation: write results into
        ``output_storage[i][0]``."""
        raise MethodNotDefined(f"{type(self).__name__}.perform")

    # --- autodiff ---------------------------------------------------------
    def grad(self, inputs: Sequence[Variable], output_grads: Sequence[Variable]):
        raise NotImplementedError(f"{type(self).__name__}.grad")

    def L_op(self, inputs, outputs, output_grads):
        """VJP given outputs too; defaults to ``grad`` (ref ``:363``)."""
        return self.grad(inputs, output_grads)

    def R_op(self, inputs, eval_points):
        """JVP (forward mode) (ref ``:392``)."""
        raise NotImplementedError(f"{type(self).__name__}.R_op")

    def connection_pattern(self, node: Apply) -> List[List[bool]]:
        """[n_in][n_out] booleans: which inputs influence which outputs."""
        return [[True for _ in node.outputs] for _ in node.inputs]

    # --- shape / folding ----------------------------------------------------
    def infer_shape(self, fgraph, node: Apply, input_shapes):
        raise NotImplementedError(f"{type(self).__name__}.infer_shape")

    def do_constant_folding(self, fgraph, node: Apply) -> bool:
        return True

    # --- thunks (py path) ---------------------------------------------------
    def make_py_thunk(
        self, node, storage_map, compute_map, no_recycling, debug: bool = False
    ) -> Callable:
        """Build a closure that evaluates this node from/to storage cells
        (reference ``graph/op.py:512``)."""
        node_inputs = [storage_map[i] for i in node.inputs]
        node_outputs = [storage_map[o] for o in node.outputs]
        node_compute = [compute_map[o] for o in node.outputs]
        perform = self.perform

        def thunk():
            perform(node, [cell[0] for cell in node_inputs], node_outputs)
            for c in node_compute:
                c[0] = True

        thunk.inputs = node_inputs
        thunk.outputs = node_outputs
        thunk.lazy = False
        return thunk

    def make_thunk(self, node, storage_map, compute_map, no_recycling, impl=None):
        return self.make_py_thunk(node, storage_map, compute_map, no_recycling)

    def prepare_node(self, node, storage_map, compute_map, impl) -> None:
        pass

    # --- identity -----------------------------------------------------------
    def __eq__(self, other):
        if self is other:
            return True
        props = getattr(self, "__props__", None)
        if props is None or type(self) is not type(other):
            return NotImplemented if props is None else False
        return all(getattr(self, p) == getattr(other, p) for p in props)

    def __hash__(self):
        props = getattr(self, "__props__", None)
        if props is None:
            return id(self)
        return hash((type(self),) + tuple(getattr(self, p) for p in props))

    def __str__(self):
        props = getattr(self, "__props__", None)
        name = type(self).__name__
        if props:
            args = ", ".join(f"{p}={getattr(self, p)!r}" for p in props)
            return f"{name}{{{args}}}"
        return name

    def __repr__(self):
        return str(self)


class COp(Op):
    """Compatibility alias: in the reference, ``COp`` adds C-codegen hooks
    (``link/c/op.py:47``).  On TPU the native path is the XLA lowering
    registry, so this is just ``Op``; kept so user code subclassing COp
    ports over unchanged."""


class HasInnerGraph:
    """Mixin for ops owning an inner FunctionGraph (Scan, OpFromGraph;
    reference ``graph/op.py:634``)."""

    @property
    def fn(self):
        raise NotImplementedError

    @property
    def inner_inputs(self):
        return self.fgraph.inputs

    @property
    def inner_outputs(self):
        return self.fgraph.outputs

    def clone(self):
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Test-value machinery (reference graph/op.py:68-140, 708)
# ---------------------------------------------------------------------------

def missing_test_message(msg: str) -> None:
    from aesara_tpu.config import config

    action = config.compute_test_value
    if action == "raise":
        raise TestValueError(msg)
    elif action == "warn":
        import warnings

        warnings.warn(msg, stacklevel=2)
    else:
        assert action in ("ignore", "off")


def get_test_value(v):
    """Return the test value attached to variable ``v`` — constants fold
    to their data, shared variables to their current value, tagged
    values are FILTERED through the variable's type so an impossible tag
    (wrong ndim/dtype) errors at the op that consumes it (reference
    ``op.py:?get_test_value`` filters the same way)."""
    if isinstance(v, Constant):
        return v.data
    if not isinstance(v, Variable):
        return v
    if hasattr(v.tag, "test_value"):
        return v.type.filter(v.tag.test_value, strict=False)
    get_value = getattr(v, "get_value", None)
    if get_value is not None:  # SharedVariable: live state IS the value
        return get_value(borrow=True)
    raise TestValueError(f"{v} has no test value")


def get_test_values(*args):
    """Return test values for all args, or [] if any is missing (mirrors
    reference semantics: under 'off' returns [], else raises/warns)."""
    from aesara_tpu.config import config

    if config.compute_test_value == "off":
        return []
    vals = []
    for a in args:
        try:
            vals.append(get_test_value(a))
        except TestValueError:
            missing_test_message(f"no test value for {a}")
            return []
    if len(args) == 1:
        return vals
    return [vals]


def compute_test_value(node: Apply) -> None:
    """Eagerly evaluate ``node`` on its inputs' test values and attach the
    results as the outputs' test values (reference ``graph/op.py:68``)."""
    input_vals = []
    for inp in node.inputs:
        try:
            input_vals.append(get_test_value(inp))
        except TestValueError:
            missing_test_message(f"no test value for input {inp} of {node.op}")
            return
    storage = [[None] for _ in node.outputs]
    try:
        node.op.perform(node, input_vals, storage)
    except MethodNotDefined:
        return
    for out, cell in zip(node.outputs, storage):
        out.tag.test_value = cell[0]


#: thunk-callable marker (reference ``ThunkType``/``is_thunk_type``: the
#: C machinery tagged compiled thunks; here any callable qualifies)
ThunkType = type(lambda: None)


def is_thunk_type(fn):
    return callable(fn)
