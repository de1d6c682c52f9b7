"""Core graph IR: ``Type``, ``Variable``, ``Apply``, ``Constant`` and the
traversal/clone/toposort toolkit.

This is the TPU-native re-design of the reference's graph core
(``aesara/graph/basic.py`` — Apply:80, Variable:318, Constant:725;
``aesara/graph/type.py:14``).  The IR is a bipartite DAG: ``Apply`` nodes
(an ``Op`` applied to input Variables producing output Variables) and
``Variable`` nodes.  Unlike the reference, every ``Type`` may carry a
``sharding`` annotation slot from day one so that mesh partitioning is a
first-class property of the IR (SURVEY §7 stage 1).
"""

from __future__ import annotations

import itertools
from collections import deque
from typing import Any, Callable, Iterable, Optional, Sequence, Union

from aesara_tpu.utils import Scratchpad, add_tag_trace


__all__ = [
    "Type",
    "Variable",
    "AtomicVariable",
    "NominalVariable",
    "Constant",
    "Apply",
    "Node",
    "walk",
    "ancestors",
    "graph_inputs",
    "explicit_graph_inputs",
    "vars_between",
    "applys_between",
    "orphans_between",
    "truncated_graph_inputs",
    "clone",
    "clone_get_equiv",
    "clone_replace",
    "general_toposort",
    "io_toposort",
    "equal_computations",
    "as_string",
    "io_connection_pattern",
    "list_of_nodes",
    "get_var_by_name",
]


class Type:
    """The contract a value must satisfy to inhabit a :class:`Variable`.

    Mirrors the reference contract (``aesara/graph/type.py:14``): ``filter``
    validates/converts raw data, ``filter_variable`` coerces other
    variables, ``is_super``/``in_same_class`` define the subtyping lattice
    used by rewrites, and ``values_eq(_approx)`` define value equality for
    testing.  C-codegen hooks are replaced by per-op XLA lowering rules
    registered in ``aesara_tpu.link.jax.dispatch``.
    """

    #: class of variables this type produces; subclasses may override
    variable_type: type = None  # set after Variable is defined
    constant_type: type = None  # set after Constant is defined

    def filter(self, data: Any, strict: bool = False, allow_downcast=None) -> Any:
        """Validate/convert ``data`` into a value of this type, or raise
        ``TypeError``."""
        raise NotImplementedError(f"{type(self).__name__}.filter")

    def filter_inplace(self, value, storage, strict=False, allow_downcast=None):
        raise NotImplementedError()

    def is_valid_value(self, data: Any, strict: bool = True) -> bool:
        try:
            self.filter(data, strict=strict)
            return True
        except (TypeError, ValueError):
            return False

    def filter_variable(self, other: Any, allow_convert: bool = True) -> "Variable":
        """Coerce ``other`` (a Variable or raw data) into a Variable of this
        type, inserting a conversion if legal."""
        if not isinstance(other, Variable):
            other = self.constant_type(type=self, data=other)
        if other.type == self or self.is_super(other.type):
            return other
        if allow_convert:
            converted = self.convert_variable(other)
            if converted is not None:
                return converted
        raise TypeError(
            f"Cannot convert Variable of type {other.type} into type {self}."
        )

    def convert_variable(self, var: "Variable") -> Optional["Variable"]:
        """Return an equivalent Variable of this type, or None."""
        if self.is_super(var.type):
            return var
        return None

    def is_super(self, otype: "Type") -> bool:
        """True if any value of ``otype`` is also a valid value of self."""
        return self == otype

    def in_same_class(self, otype: "Type") -> bool:
        return self == otype

    def values_eq(self, a, b) -> bool:
        return a == b

    def values_eq_approx(self, a, b) -> bool:
        return self.values_eq(a, b)

    def make_variable(self, name: Optional[str] = None) -> "Variable":
        return self.variable_type(self, None, None, name=name)

    def make_constant(self, value, name: Optional[str] = None) -> "Constant":
        return self.constant_type(type=self, data=value, name=name)

    def __call__(self, name: Optional[str] = None) -> "Variable":
        return add_tag_trace(self.make_variable(name))

    def clone(self, **kwargs) -> "Type":
        return self

    # --- optional protocol interfaces (reference graph/type.py:265,278)
    # Types exposing a numpy-style dtype define ``.dtype``; types exposing a
    # static shape define ``.shape`` (tuple with None for unknown dims).


class HasDataType:
    """Mixin marker: the Type has a ``dtype`` attribute."""


class HasShape:
    """Mixin marker: the Type has ``shape`` and ``ndim`` attributes."""


class Node:
    """Common base for Apply and Variable (both live in the bipartite DAG)."""

    name: Optional[str]

    def get_parents(self) -> list:
        raise NotImplementedError


_apply_epoch = itertools.count()


class Apply(Node):
    """One application of an :class:`Op` to input Variables, producing
    output Variables (reference ``aesara/graph/basic.py:80``).

    ``epoch`` is a process-wide monotone creation stamp; ``scan`` uses
    it to tell nodes built while tracing the loop body apart from
    captured pre-existing graphs (the reference gets this for free by
    cutting non-sequences at outer variables).
    """

    __slots__ = ("op", "inputs", "outputs", "tag", "epoch")

    def __init__(self, op, inputs: Sequence["Variable"], outputs: Sequence["Variable"]):
        self.op = op
        self.inputs = list(inputs)
        self.outputs = list(outputs)
        self.tag = Scratchpad()
        self.epoch = next(_apply_epoch)
        for v in self.inputs:
            if not isinstance(v, Variable):
                raise TypeError(f"Apply inputs must be Variables, got {type(v)}")
        for i, v in enumerate(self.outputs):
            if not isinstance(v, Variable):
                raise TypeError(f"Apply outputs must be Variables, got {type(v)}")
            if v.owner is not None and v.owner is not self:
                raise ValueError("Variable already owned by another Apply")
            v.owner = self
            v.index = i

    @property
    def nin(self) -> int:
        return len(self.inputs)

    @property
    def nout(self) -> int:
        return len(self.outputs)

    @property
    def out(self) -> "Variable":
        """The single output (error if multi-output)."""
        if len(self.outputs) != 1:
            raise ValueError(f"{self} has {len(self.outputs)} outputs, not 1")
        return self.outputs[0]

    @property
    def params_type(self):
        return None

    def default_output(self) -> "Variable":
        idx = getattr(self.op, "default_output", None)
        if callable(idx):
            idx = None
        if idx is None:
            if len(self.outputs) == 1:
                return self.outputs[0]
            raise ValueError(f"Multi-output node {self} has no default output")
        return self.outputs[idx]

    def get_parents(self) -> list:
        return list(self.inputs)

    def clone(self, clone_inner_graph: bool = False) -> "Apply":
        op = self.op
        if clone_inner_graph and hasattr(op, "fgraph"):
            op = op.clone()
        new = Apply(op, self.inputs, [o.clone() for o in self.outputs])
        new.tag = Scratchpad().__update__(self.tag)
        return new

    def clone_with_new_inputs(
        self, inputs: Sequence["Variable"], strict: bool = True, clone_inner_graph=False
    ) -> "Apply":
        """Rebuild this node over new inputs.  With ``strict`` the new
        inputs' types must be compatible; otherwise ``make_node`` re-runs."""
        assert len(inputs) == len(self.inputs)
        remake = False
        coerced = list(inputs)
        for i, (cur, new) in enumerate(zip(self.inputs, inputs)):
            if not cur.type.is_super(new.type):
                if strict:
                    conv = cur.type.convert_variable(new)
                    if conv is None:
                        raise TypeError(
                            f"Cannot convert {new} of type {new.type} to {cur.type}"
                        )
                    coerced[i] = conv
                else:
                    remake = True
        op = self.op
        if clone_inner_graph and hasattr(op, "fgraph"):
            op = op.clone()
        if remake:
            new_node = op.make_node(*coerced)
        else:
            new_node = Apply(op, coerced, [o.clone() for o in self.outputs])
            new_node.tag = Scratchpad().__update__(self.tag)
        return new_node

    def __str__(self) -> str:
        return f"{self.op}({', '.join(map(str, self.inputs))})"

    def __repr__(self) -> str:
        return str(self)


class Variable(Node):
    """A typed node in the expression graph (reference
    ``aesara/graph/basic.py:318``).  ``owner`` is the Apply that computes it
    (None for graph inputs); ``index`` its position in ``owner.outputs``."""

    # not __slots__: rewrites stash arbitrary attrs on variables' tags

    def __init__(
        self,
        type: Type,
        owner: Optional[Apply] = None,
        index: Optional[int] = None,
        name: Optional[str] = None,
    ):
        self.type = type
        self.owner = owner
        self.index = index
        self.name = name
        self.tag = Scratchpad()
        self.auto_name = f"auto_{next(_var_counter)}"

    def get_parents(self) -> list:
        return [self.owner] if self.owner is not None else []

    def clone(self, **kwargs) -> "Variable":
        cp = self.__class__(
            type=kwargs.pop("type", self.type),
            owner=None,
            index=None,
            name=kwargs.pop("name", self.name),
        )
        cp.tag = Scratchpad().__update__(self.tag)
        return cp

    def eval(self, inputs_to_values: Optional[dict] = None, **kwargs):
        """Compile (with caching) and evaluate this variable.

        Reference: ``Variable.eval`` in ``aesara/graph/basic.py``.
        ``inputs_to_values`` maps input Variables (or their names) to values.
        """
        from aesara_tpu.compile.function import function

        if inputs_to_values is None:
            inputs_to_values = {}
        resolved = {}
        for var, value in inputs_to_values.items():
            if isinstance(var, str):
                candidates = [
                    v for v in explicit_graph_inputs([self]) if v.name == var
                ]
                if len(candidates) != 1:
                    raise ValueError(f"{len(candidates)} inputs named {var!r}")
                var = candidates[0]
            resolved[var] = value
        cache = getattr(self, "_fn_cache", None)
        if cache is None:
            cache = self._fn_cache = {}
        inputs = tuple(sorted(resolved.keys(), key=id))
        key = (inputs, tuple(sorted(kwargs.items())))
        try:
            fn = cache[key]
        except (KeyError, TypeError):
            fn = function(list(inputs), self, on_unused_input="ignore", **kwargs)
            try:
                cache[key] = fn
            except TypeError:
                pass
        return fn(*(resolved[i] for i in inputs))

    def __str__(self) -> str:
        if self.name is not None:
            return self.name
        if self.owner is not None:
            op = self.owner.op
            if len(self.owner.outputs) == 1:
                return f"{op}.out"
            return f"{op}.{self.index}"
        return f"<{self.type}>"

    def __repr__(self) -> str:
        return str(self)

    # pickling must not drag the compiled-function cache along
    def __getstate__(self):
        d = self.__dict__.copy()
        d.pop("_fn_cache", None)
        return d


_var_counter = itertools.count()


class AtomicVariable(Variable):
    """A Variable with no owner by construction (reference ``basic.py:627``)."""

    def __init__(self, type: Type, name: Optional[str] = None, **kwargs):
        super().__init__(type=type, owner=None, index=None, name=name, **kwargs)

    @property
    def owner(self):
        return None

    @owner.setter
    def owner(self, value):
        if value is not None:
            raise ValueError("AtomicVariable cannot have an owner")

    @property
    def index(self):
        return None

    @index.setter
    def index(self, value):
        if value is not None:
            raise ValueError("AtomicVariable cannot have an index")

    def signature(self):
        raise NotImplementedError

    def merge_signature(self):
        return self.signature()

    def equals(self, other):
        return self == other


class NominalVariable(AtomicVariable):
    """A named placeholder bound inside an inner graph (Scan/OpFromGraph
    bodies), identified by (id, type) (reference ``basic.py:672``)."""

    _instances: dict = {}

    def __new__(cls, id: int, typ: Type, **kwargs):
        key = (id, typ)
        if key not in cls._instances:
            inst = super().__new__(cls)
            inst._init(id, typ)
            cls._instances[key] = inst
        return cls._instances[key]

    def _init(self, id: int, typ: Type):
        super().__init__(type=typ, name=f"*{id}-{typ}")
        self.id = id

    def __init__(self, id: int, typ: Type, **kwargs):
        pass  # handled in __new__/_init

    def clone(self, **kwargs):
        return self

    def __eq__(self, other):
        return self is other or (
            isinstance(other, NominalVariable)
            and self.id == other.id
            and self.type == other.type
        )

    def __hash__(self):
        return hash((type(self), self.id, self.type))

    def signature(self):
        return (self.type, self.id)

    def __str__(self):
        return f"*{self.id}-{self.type}"

    def __reduce__(self):
        return (self.__class__, (self.id, self.type))


class Constant(AtomicVariable):
    """A Variable with a fixed value (reference ``basic.py:725``)."""

    def __init__(self, type: Type, data: Any, name: Optional[str] = None):
        super().__init__(type, name=name)
        self.data = type.filter(data)

    def get_test_value(self):
        return self.data

    def signature(self):
        return (self.type, _constant_signature(self.data))

    def equals(self, other):
        return isinstance(other, Constant) and self.signature() == other.signature()

    def __str__(self) -> str:
        if self.name is not None:
            return self.name
        s = repr(self.data)
        return s if len(s) <= 20 else s[:17] + "..."

    def clone(self, **kwargs) -> "Constant":
        return self

    @property
    def value(self):
        return self.data


def _constant_signature(data):
    import numpy as np

    if isinstance(data, np.ndarray):
        return (data.shape, str(data.dtype), data.tobytes())
    return data


Type.variable_type = Variable
Type.constant_type = Constant


# ---------------------------------------------------------------------------
# Traversal toolkit (reference aesara/graph/basic.py:777-1700)
# ---------------------------------------------------------------------------

def walk(
    nodes: Iterable[Node],
    expand: Callable[[Node], Optional[Iterable[Node]]],
    bfs: bool = True,
    return_children: bool = False,
):
    """Generic graph walk from ``nodes`` through ``expand`` (ref ``:777``)."""
    q: deque = deque(nodes)
    seen: set = set()
    pop = q.popleft if bfs else q.pop
    while q:
        node = pop()
        if id(node) in seen:
            continue
        seen.add(id(node))
        children = expand(node)
        if children:
            q.extend(children)
        if return_children:
            yield node, children
        else:
            yield node


def ancestors(graphs: Iterable[Variable], blockers=None) -> list:
    """All Variables reachable (backwards) from ``graphs`` (ref ``:839``)."""
    blockers = set(map(id, blockers)) if blockers else set()

    def expand(v):
        if v.owner is not None and id(v) not in blockers:
            return reversed(v.owner.inputs)
        return None

    return [v for v in walk(graphs, expand, bfs=False)]


def graph_inputs(graphs: Iterable[Variable], blockers=None) -> list:
    """Ownerless Variables the graphs depend on (ref ``:868``)."""
    return [v for v in ancestors(graphs, blockers) if v.owner is None]


def explicit_graph_inputs(graphs) -> list:
    """Non-constant root inputs (the ones a user must feed)."""
    if isinstance(graphs, Variable):
        graphs = [graphs]
    return [v for v in graph_inputs(graphs) if not isinstance(v, Constant)]


def vars_between(ins: Iterable[Variable], outs: Iterable[Variable]) -> list:
    """All Variables on paths from ``ins`` to ``outs`` (ref ``:891``)."""
    ins = set(ins)

    def expand(v):
        if v.owner is not None and v not in ins:
            return reversed(v.owner.inputs + v.owner.outputs)
        return None

    return list(walk(outs, expand))


def applys_between(ins: Iterable[Variable], outs: Iterable[Variable]) -> list:
    """Apply nodes on paths from ``ins`` to ``outs``, excluding the owners
    of the ``ins`` themselves (reference ``basic.py:947`` contract)."""
    ins_set = set(ins)
    seen: set = set()
    nodes: list = []
    for v in vars_between(ins_set, outs):
        node = v.owner
        if node is not None and v not in ins_set and id(node) not in seen:
            seen.add(id(node))
            nodes.append(node)
    return nodes


def orphans_between(ins, outs) -> list:
    """Ownerless variables used by the subgraph but not in ``ins``."""
    ins = set(ins)
    return [v for v in vars_between(ins, outs) if v.owner is None and v not in ins]


def truncated_graph_inputs(
    outputs: Sequence[Variable], ancestors_to_include: Optional[Sequence[Variable]] = None
) -> list:
    """Variables that cut the graph upstream of ``outputs`` at
    ``ancestors_to_include`` (reference ``basic.py`` same name)."""
    if ancestors_to_include is None:
        return graph_inputs(outputs)
    include = set(ancestors_to_include)

    # memoized "does v depend on (or belong to) the include set?", iterative
    # so deep chain graphs don't overflow the recursion limit
    reach: dict = {}

    def reaches_include(root) -> bool:
        stack = [root]
        while stack:
            v = stack[-1]
            if v in reach:
                stack.pop()
                continue
            if v in include:
                reach[v] = True
                stack.pop()
                continue
            if v.owner is None:
                reach[v] = False
                stack.pop()
                continue
            pending = [i for i in v.owner.inputs if i not in reach]
            if pending:
                stack.extend(pending)
            else:
                reach[v] = any(reach[i] for i in v.owner.inputs)
                stack.pop()
        return reach[root]

    truncated: list = []
    seen: set = set()
    q = deque(outputs)
    while q:
        v = q.popleft()
        if id(v) in seen:
            continue
        seen.add(id(v))
        if v in include or v.owner is None:
            if v not in truncated:
                truncated.append(v)
        elif reaches_include(v):
            q.extend(v.owner.inputs)
        elif v not in truncated:
            truncated.append(v)
    return truncated


def clone_get_equiv(
    inputs: Sequence[Variable],
    outputs: Sequence[Variable],
    copy_inputs: bool = True,
    copy_orphans: bool = True,
    memo: Optional[dict] = None,
    clone_inner_graphs: bool = False,
) -> dict:
    """Clone the subgraph between inputs and outputs, returning the
    old→new mapping (reference ``basic.py:1077``)."""
    if memo is None:
        memo = {}
    for inp in inputs:
        if inp not in memo:
            memo[inp] = inp.clone() if copy_inputs else inp
    for node in io_toposort(inputs, outputs):
        for inp in node.inputs:
            if inp not in memo:
                memo[inp] = inp.clone() if copy_orphans else inp
        if node not in memo:
            new_node = node.clone_with_new_inputs(
                [memo[i] for i in node.inputs],
                strict=False,
                clone_inner_graph=clone_inner_graphs,
            )
            memo[node] = new_node
            for old_o, new_o in zip(node.outputs, new_node.outputs):
                memo.setdefault(old_o, new_o)
    for out in outputs:
        if out not in memo:
            memo[out] = out.clone() if copy_orphans else out
    return memo


def clone(
    inputs: Sequence[Variable],
    outputs: Sequence[Variable],
    copy_inputs: bool = True,
    copy_orphans: Optional[bool] = None,
    clone_inner_graphs: bool = False,
):
    """Copy a subgraph; returns (new_inputs, new_outputs) (ref ``:1019``)."""
    if copy_orphans is None:
        copy_orphans = copy_inputs
    equiv = clone_get_equiv(
        inputs, outputs, copy_inputs, copy_orphans, clone_inner_graphs=clone_inner_graphs
    )
    return [equiv[i] for i in inputs], [equiv[o] for o in outputs]


def clone_replace(
    output,
    replace: Optional[Union[dict, Iterable[tuple]]] = None,
    **kwargs,
):
    """Clone ``output`` substituting Variables per ``replace``
    (reference ``basic.py:1153``)."""
    single = isinstance(output, Variable)
    outputs = [output] if single else list(output)
    items = list(replace.items()) if isinstance(replace, dict) else list(replace or [])
    memo = {}
    for old, new in items:
        new = old.type.filter_variable(new, allow_convert=True)
        memo[old] = new
    inputs = graph_inputs(outputs, blockers=list(memo))
    equiv = clone_get_equiv(inputs, outputs, copy_inputs=False, copy_orphans=False, memo=memo, **kwargs)
    result = [equiv[o] for o in outputs]
    return result[0] if single else result


def general_toposort(
    outputs: Iterable[Node],
    deps: Callable[[Node], Iterable[Node]],
    compute_deps_cache: Optional[Callable] = None,
    deps_cache: Optional[dict] = None,
    clients: Optional[dict] = None,
) -> list:
    """Kahn's-algorithm topological sort over an arbitrary dependency
    relation (reference ``basic.py:1200``).  Raises ValueError on cycles."""
    if deps_cache is None:
        deps_cache = {}

    def _deps(obj):
        if obj not in deps_cache:
            if compute_deps_cache is not None:
                d = compute_deps_cache(obj)
            else:
                d = deps(obj)
            deps_cache[obj] = list(d) if d else []
        return deps_cache[obj]

    # collect all nodes
    all_nodes = []
    seen = set()
    stack = list(outputs)
    while stack:
        obj = stack.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        all_nodes.append(obj)
        stack.extend(_deps(obj))

    # count in-degrees (number of deps)
    indeg = {}
    rdeps: dict = {}
    for obj in all_nodes:
        ds = _deps(obj)
        indeg[id(obj)] = len(ds)
        for d in ds:
            rdeps.setdefault(id(d), []).append(obj)
            if clients is not None:
                clients.setdefault(d, []).append(obj)

    ready = deque(obj for obj in reversed(all_nodes) if indeg[id(obj)] == 0)
    order = []
    while ready:
        obj = ready.popleft()
        order.append(obj)
        for client in rdeps.get(id(obj), ()):
            indeg[id(client)] -= 1
            if indeg[id(client)] == 0:
                ready.append(client)
    if len(order) != len(all_nodes):
        raise ValueError("graph contains cycles")
    return order


def io_toposort(
    inputs: Iterable[Variable],
    outputs: Iterable[Variable],
    orderings: Optional[dict] = None,
    clients: Optional[dict] = None,
) -> list:
    """Topologically sorted list of Apply nodes between inputs and outputs
    (reference ``basic.py:1306``)."""
    iset = set(inputs)
    if not orderings:
        # fast path: iterative DFS post-order over Apply nodes
        seen_vars = set(map(id, iset))
        visited: set = set()
        result: list = []
        work = [
            (o.owner, False)
            for o in outputs
            if o.owner is not None and id(o) not in seen_vars
        ]
        while work:
            node, processed = work.pop()
            if processed:
                result.append(node)
                continue
            if id(node) in visited:
                continue
            visited.add(id(node))
            work.append((node, True))
            for inp in reversed(node.inputs):
                if id(inp) not in seen_vars and inp.owner is not None:
                    if id(inp.owner) not in visited:
                        work.append((inp.owner, False))
        return result

    # orderings path: use general_toposort with extended deps
    def compute_deps(obj):
        rval = []
        if isinstance(obj, Variable):
            if obj not in iset and obj.owner is not None:
                rval.append(obj.owner)
        else:  # Apply
            rval.extend(i for i in obj.inputs if i not in iset)
        rval.extend(orderings.get(obj, ()))
        return rval

    order = general_toposort(list(outputs), deps=compute_deps, clients=clients)
    return [o for o in order if isinstance(o, Apply)]


def equal_computations(
    xs: Sequence[Variable],
    ys: Sequence[Variable],
    in_xs: Optional[Sequence[Variable]] = None,
    in_ys: Optional[Sequence[Variable]] = None,
) -> bool:
    """Structural equality of two graphs (reference ``basic.py:1645``).

    Raises ``ValueError`` when ``xs``/``ys`` (or ``in_xs``/``in_ys``) have
    mismatched lengths, matching the reference contract.
    """
    import numpy as np

    if len(xs) != len(ys):
        raise ValueError("xs and ys must have the same length")
    in_xs = in_xs or []
    in_ys = in_ys or []
    if len(in_xs) != len(in_ys):
        raise ValueError("in_xs and in_ys must have the same length")
    for ix, iy in zip(in_xs, in_ys):
        if ix.type != iy.type:
            return False
    common = {(x, y) for x, y in zip(in_xs, in_ys)}

    def vars_equal(x, y, memo) -> bool:
        if (x, y) in memo or (x, y) in common:
            return True
        if x is y and x.owner is None:
            return True
        if isinstance(x, Constant) and isinstance(y, Constant):
            if x.type != y.type:
                return False
            try:
                return bool(np.array_equal(np.asarray(x.data), np.asarray(y.data)))
            except Exception:
                return x.data == y.data
        if isinstance(x, Constant) or isinstance(y, Constant):
            return False
        if (x.owner is None) != (y.owner is None):
            return False
        if x.owner is None:
            return False  # distinct free inputs
        nx, ny = x.owner, y.owner
        if x.index != y.index:
            return False
        if (nx, ny) in node_memo:
            return node_memo[(nx, ny)]
        if nx.op != ny.op or len(nx.inputs) != len(ny.inputs):
            node_memo[(nx, ny)] = False
            return False
        node_memo[(nx, ny)] = True  # tentative (cycles impossible in DAG)
        ok = all(vars_equal(a, b, memo) for a, b in zip(nx.inputs, ny.inputs))
        node_memo[(nx, ny)] = ok
        if ok:
            memo.add((x, y))
        return ok

    node_memo: dict = {}
    memo: set = set()
    return all(vars_equal(x, y, memo) for x, y in zip(xs, ys))


def list_of_nodes(inputs, outputs) -> list:
    """Apply nodes between inputs and outputs (convenience)."""
    return io_toposort(inputs, outputs)


def io_connection_pattern(inputs, outputs):
    """Boolean connectivity matrix [n_in][n_out] (reference ``basic.py:1409``)."""
    inner_nodes = io_toposort(inputs, outputs)
    # map each variable to the set of input indices it depends on
    connect: dict = {inp: {i} for i, inp in enumerate(inputs)}
    for node in inner_nodes:
        op_pattern = None
        if hasattr(node.op, "connection_pattern"):
            try:
                op_pattern = node.op.connection_pattern(node)
            except NotImplementedError:
                op_pattern = None
        for oi, out in enumerate(node.outputs):
            s: set = set()
            for ii, inp in enumerate(node.inputs):
                if op_pattern is not None and not op_pattern[ii][oi]:
                    continue
                s |= connect.get(inp, set())
            connect[out] = s
    return [
        [i in connect.get(out, set()) for out in outputs] for i in range(len(inputs))
    ]


def get_var_by_name(graphs, target_var_id: str) -> tuple:
    """Find variables by name/auto_name in graphs (reference helper)."""
    found = []
    for v in vars_between(graph_inputs(graphs), graphs):
        if target_var_id in (v.name, v.auto_name):
            found.append(v)
    return tuple(found)


def as_string(inputs, outputs) -> list:
    """Very small debugging pretty-printer: one expression string per output."""

    def render(v, depth=0):
        if depth > 12:
            return "..."
        if v in inputs or v.owner is None:
            return str(v)
        node = v.owner
        args = ", ".join(render(i, depth + 1) for i in node.inputs)
        base = f"{node.op}({args})"
        if len(node.outputs) > 1:
            base += f"[{v.index}]"
        return base

    inputs = list(inputs)
    return [render(o) for o in outputs]


# --- reference graph/basic.py long-tail helpers -------------------------------

def view_roots(var: Variable):
    """Walk view-op chains back to the underlying storage roots
    (reference ``view_roots``)."""
    node = var.owner
    if node is None:
        return [var]
    vmap = getattr(node.op, "view_map", {}) or {}
    for out_idx, in_idxs in vmap.items():
        if node.outputs[out_idx] is var:
            return view_roots(node.inputs[in_idxs[0]])
    return [var]


def is_in_ancestors(l_apply: "Apply", f_node: "Apply") -> bool:
    """True iff ``f_node`` is an ancestor apply of ``l_apply``
    (reference ``is_in_ancestors``)."""
    return f_node in applys_between([], l_apply.outputs)


def op_as_string(i, op, leaf_formatter=str, node_formatter=None):
    """Render one apply as a string (reference ``op_as_string``)."""
    strs = [leaf_formatter(inp) if inp in i or inp.owner is None
            else op_as_string(i, inp.owner, leaf_formatter, node_formatter)
            for inp in op.inputs]
    if node_formatter is not None:
        return node_formatter(op, strs)
    return default_node_formatter(op, strs)


def default_node_formatter(op: "Apply", argstrings) -> str:
    return f"{op.op}({', '.join(argstrings)})"


def clone_node_and_cache(node: "Apply", clone_d: dict, **kwargs) -> Optional["Apply"]:
    """Clone one apply, reusing/recording clones in ``clone_d``
    (reference ``clone_node_and_cache``)."""
    if node in clone_d:
        return clone_d[node]
    new_inputs = [clone_d.get(i, i) for i in node.inputs]
    new_node = node.clone_with_new_inputs(new_inputs, **kwargs) \
        if hasattr(node, "clone_with_new_inputs") else Apply(
            node.op, new_inputs, [o.type() for o in node.outputs])
    clone_d[node] = new_node
    for old_o, new_o in zip(node.outputs, new_node.outputs):
        clone_d.setdefault(old_o, new_o)
    return new_node


def replace_nominals_with_dummies(inputs, outputs):
    """Swap NominalVariables for fresh regular variables (reference
    ``replace_nominals_with_dummies``) — used when re-wrapping inner
    graphs."""
    replace = {}
    for v in graph_inputs(outputs):
        if isinstance(v, NominalVariable):
            replace[v] = v.type()
    new_outputs = clone_replace(list(outputs), replace=replace)
    new_inputs = [replace.get(i, i) for i in inputs]
    return new_inputs, new_outputs
