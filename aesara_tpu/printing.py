"""Graph printing: ``debugprint``/``dprint``, a pretty-printer, and the
runtime ``Print`` op.

Re-design of the reference's ``aesara/printing.py`` (debugprint:116,
Print op:825, pprint Printer classes:904-1123; pydotprint lands with the
d3viz work).
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence, Union

from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.graph.ir import Apply, Constant, Variable, graph_inputs, io_toposort
from aesara_tpu.graph.op import Op


__all__ = ["debugprint", "dprint", "pp", "pprint", "Print", "char_from_number"]


def debugprint(
    obj,
    depth: int = -1,
    print_type: bool = False,
    file=None,
    id_type: str = "CHAR",
    stop_on_name: bool = False,
    done=None,
    print_storage: bool = False,
    print_op_info: bool = False,
    print_destroy_map: bool = False,
    print_view_map: bool = False,
    print_fgraph_inputs: bool = False,
    _ids_out=None,
):
    """Text dump of a graph, one line per Apply/Variable, children indented
    (reference ``printing.py:116``)."""
    results = []
    if isinstance(obj, (list, tuple)):
        items = list(obj)
    else:
        items = [obj]

    outputs = []
    fgraph = None
    for item in items:
        from aesara_tpu.compile.function import Function

        if isinstance(item, Function):
            fgraph = item.fgraph
            outputs.extend(fgraph.outputs)
        elif isinstance(item, FunctionGraph):
            fgraph = item
            outputs.extend(item.outputs)
        elif isinstance(item, Variable):
            outputs.append(item)
        elif isinstance(item, Apply):
            outputs.extend(item.outputs)
        else:
            raise TypeError(f"debugprint cannot handle {type(item)}")

    _file = file if file not in (None, "str") else (sys.stdout if file is None else None)
    lines: list = []
    ids: dict = {} if _ids_out is None else _ids_out

    def get_id(obj) -> str:
        if id_type == "":
            return ""
        if obj not in ids:
            if id_type == "CHAR":
                ids[obj] = f" [id {char_from_number(len(ids))}]"
            elif id_type == "int":
                ids[obj] = f" [id {len(ids)}]"
            else:
                ids[obj] = f" [id {id(obj)}]"
        return ids[obj]

    printed_nodes: set = set()

    def render_var(v, prefix: str, depth_left: int):
        type_str = f" <{v.type}>" if print_type else ""
        name_str = f" '{v.name}'" if v.name else ""
        if v.owner is None:
            lines.append(f"{prefix}{v}{get_id(v)}{type_str}{name_str}")
            return
        node = v.owner
        op_str = str(node.op)
        idx = f".{v.index}" if len(node.outputs) > 1 else ""
        extras = ""
        if print_destroy_map and node.op.destroy_map:
            extras += f" d={node.op.destroy_map}"
        if print_view_map and node.op.view_map:
            extras += f" v={node.op.view_map}"
        lines.append(f"{prefix}{op_str}{idx}{get_id(v)}{type_str}{name_str}{extras}")
        if depth_left == 0:
            return
        if id(node) in printed_nodes:
            if node.inputs:
                lines.append(f"{prefix} ...")
            return
        if stop_on_name and v.name:
            return
        printed_nodes.add(id(node))
        for inp in node.inputs:
            render_var(inp, prefix + " ", depth_left - 1)

    inner_graphs_printed: set = set()
    inner_graph_ops: list = []

    def collect_inner(v):
        node = v.owner
        if node is None:
            return
        op = node.op
        if hasattr(op, "fgraph") and id(op) not in inner_graphs_printed:
            inner_graphs_printed.add(id(op))
            inner_graph_ops.append(op)

    _orig_render = render_var

    def render_var(v, prefix, depth_left):  # noqa: F811
        collect_inner(v)
        _orig_render(v, prefix, depth_left)

    for out in outputs:
        render_var(out, "", depth)

    # reference behavior: inner graphs (Scan/OpFromGraph/Composite) are
    # appended after the outer dump
    if inner_graph_ops:
        lines.append("")
        lines.append("Inner graphs:")
        for op in inner_graph_ops:
            lines.append("")
            lines.append(f"{op}{get_id(op)}")
            try:
                inner_outs = list(op.fgraph.outputs)
            except Exception:
                continue
            for io_ in inner_outs:
                _orig_render(io_, " >", depth)

    if print_fgraph_inputs and fgraph is not None:
        lines.append("Inputs:")
        for inp in fgraph.inputs:
            lines.append(f"  {inp}{get_id(inp)}")

    text = "\n".join(lines)
    if file == "str":
        return text
    print(text, file=_file or sys.stdout)
    return obj


dprint = debugprint


def char_from_number(number: int) -> str:
    """0→A, 1→B, ..., 26→AB (the reference appends least-significant
    digit FIRST — ``aesara/printing.py char_from_number``; review
    finding: the reversed order diverged from the 27th id onward)."""
    base = 26
    number = int(number)
    if number == 0:
        return "A"
    rval = ""
    while number != 0:
        number, rem = divmod(number, base)
        rval = rval + chr(ord("A") + rem)
    return rval


# ---------------------------------------------------------------------------
# expression pretty-printer (reference printing.py:904-1123, simplified)
# ---------------------------------------------------------------------------

class PPrinter:
    def __call__(self, var, depth: int = 12) -> str:
        return self.process(var, depth)

    def process(self, var, depth: int = 12) -> str:
        if depth <= 0:
            return "..."
        if isinstance(var, Constant):
            return str(var)
        if var.owner is None:
            return str(var)
        node = var.owner
        op = node.op
        printer = special_printers.get(type(op)) or special_printers.get(op)
        if printer is not None:
            return printer.process(var, PrinterState(depth=depth))
        name = getattr(op, "name", None) or str(op)
        from aesara_tpu.tensor.elemwise import Elemwise

        if isinstance(op, Elemwise):
            sname = getattr(op.scalar_op, "name", str(op.scalar_op))
            infix = {"add": " + ", "sub": " - ", "mul": " * ",
                     "true_div": " / ", "pow": " ** "}
            if sname in infix and len(node.inputs) >= 2:
                return "(" + infix[sname].join(
                    self.process(i, depth - 1) for i in node.inputs
                ) + ")"
            if sname == "neg":
                return f"(-{self.process(node.inputs[0], depth - 1)})"
            name = sname
        args = ", ".join(self.process(i, depth - 1) for i in node.inputs)
        return f"{name}({args})"


pp = PPrinter()
pprint = pp


# ---------------------------------------------------------------------------
# extensible Printer registry (reference printing.py Printer classes
# :904-1123): ops register a Printer; PPrinter consults the registry
# before its built-in rules
# ---------------------------------------------------------------------------

class PrinterState:
    """Mutable traversal state handed to printers (reference name)."""

    def __init__(self, **kw):
        defaults = {"precedence": -1000, "depth": 12}
        defaults.update(kw)
        self.__dict__.update(defaults)

    def clone(self, **kw):
        new = PrinterState()
        new.__dict__.update(self.__dict__)
        new.__dict__.update(kw)
        return new


class Printer:
    """Base: ``process(output, pstate) -> str``."""

    def process(self, output, pstate):
        raise NotImplementedError


class LeafPrinter(Printer):
    def process(self, output, pstate):
        return str(output)


class ConstantPrinter(Printer):
    def process(self, output, pstate):
        return str(getattr(output, "data", output))


class DefaultPrinter(Printer):
    def process(self, output, pstate):
        if output.owner is None:
            return str(output)
        args = ", ".join(pp.process(i, pstate.depth - 1)
                         for i in output.owner.inputs)
        return f"{output.owner.op}({args})"


class IgnorePrinter(Printer):
    """Print through to the op's first input (view-like ops)."""

    def process(self, output, pstate):
        return pp.process(output.owner.inputs[0], pstate.depth - 1)


class OperatorPrinter(Printer):
    def __init__(self, operator, precedence, assoc="left"):
        self.operator = operator
        self.precedence = precedence
        self.assoc = assoc

    def process(self, output, pstate):
        parts = [pp.process(i, pstate.depth - 1) for i in output.owner.inputs]
        return "(" + f" {self.operator} ".join(parts) + ")"


class FunctionPrinter(Printer):
    def __init__(self, names):
        self.names = list(names)

    def process(self, output, pstate):
        idx = output.owner.outputs.index(output)
        name = self.names[min(idx, len(self.names) - 1)]
        args = ", ".join(pp.process(i, pstate.depth - 1)
                         for i in output.owner.inputs)
        return f"{name}({args})"


class PatternPrinter(Printer):
    """Format string with %(i0)s-style slots per input (reference)."""

    def __init__(self, *patterns):
        self.patterns = [p if isinstance(p, tuple) else (p, ())
                         for p in patterns]

    def process(self, output, pstate):
        pattern, _prec = self.patterns[0]
        d = {f"i{k}": pp.process(i, pstate.depth - 1)
             for k, i in enumerate(output.owner.inputs)}
        return pattern % d


VALID_ASSOC = {"left", "right", "either"}
default_printer = DefaultPrinter()
constant_printer = ConstantPrinter()
leaf_printer = LeafPrinter()

#: op/type -> Printer registry consulted by PPrinter
special_printers: dict = {}


def register_printer(key, printer: Printer) -> None:
    special_printers[key] = printer


#: color table used by debugprint HTML/terminal renderers (reference)
default_colorCodes = {
    "GpuFromHost": "red", "HostFromGpu": "red", "Scan": "yellow",
    "Shape": "brown", "IfElse": "magenta", "Elemwise": "cyan",
    "Subtensor": "blue", "Alloc": "green", "Dot": "orange",
}

#: debugprint id-style names (reference IDTypesType literal set)
IDTypesType = ("id", "int", "CHAR", "auto", "")



class Print(Op):
    """Runtime value printing as a graph side effect
    (reference ``printing.py:825``).  XLA path uses jax.debug.print."""

    __props__ = ("message", "attrs", "global_fn")
    view_map = {0: [0]}

    def __init__(self, message: str = "", attrs=("__str__",), global_fn=None):
        self.message = message
        self.attrs = tuple(attrs)
        self.global_fn = global_fn

    def make_node(self, xin):
        from aesara_tpu.tensor.basic import as_tensor_variable

        xin = as_tensor_variable(xin)
        return Apply(self, [xin], [xin.type()])

    def perform(self, node, inputs, output_storage):
        (xin,) = inputs
        for attr in self.attrs:
            obj = getattr(xin, attr)
            val = obj() if callable(obj) else obj
            print(f"{self.message} {attr} = {val}")
        output_storage[0][0] = xin

    def infer_shape(self, fgraph, node, input_shapes):
        return input_shapes

    def grad(self, inputs, output_grads):
        return output_grads

    def __str__(self):
        return f"Print{{{self.message}}}"


def pydotprint(
    fct,
    outfile: str = None,
    compact: bool = True,
    format: str = "dot",
    with_ids: bool = False,
    high_contrast: bool = True,
    cond_highlight=None,
    colorCodes=None,
    max_label_size: int = 70,
    scan_graphs: bool = False,
    var_with_name_simple: bool = False,
    print_output_file: bool = True,
    return_image: bool = False,
):
    """Graph → DOT file (reference ``printing.py:1266``).  Emits
    DOT text directly (graphviz-compatible) without needing the graphviz
    binary; use ``aesara_tpu.d3viz.d3viz`` for a self-contained HTML
    rendering."""
    from aesara_tpu.d3viz.formatting import PyDotFormatter

    dot = PyDotFormatter()(fct)
    if return_image or outfile is None:
        return dot
    if not outfile.endswith(".dot"):
        outfile = outfile + ".dot"
    with open(outfile, "w") as f:
        f.write(dot)
    if print_output_file:
        print(f"The output file is available at {outfile}")
    return outfile


# --- remaining reference printing helpers ------------------------------------

import hashlib as _hashlib

pydot_imported = False
pydot_imported_msg = "pydot rendering is emitted as raw .dot text here"
use_ascii = True


def set_precedence(pstate, precedence=-1000):
    """(reference helper): clone traversal state with a new precedence."""
    return pstate.clone(precedence=precedence)


def var_descriptor(v, _cache=None) -> str:
    """Position-independent one-line description of a variable
    (reference ``var_descriptor``)."""
    if v.owner is None:
        return f"{type(v).__name__}{{{v.name or 'unnamed'}:{v.type}}}"
    idx = v.owner.outputs.index(v)
    return f"{v.owner.op}.{idx}"


def position_independent_str(out) -> str:
    """Graph dump whose text does not depend on object ids (reference
    ``position_independent_str``) — usable as a structural fingerprint."""
    from aesara_tpu.graph.ir import io_toposort, graph_inputs

    outs = out if isinstance(out, (list, tuple)) else [out]
    ins = [v for v in graph_inputs(outs)]
    index = {v: f"v{i}" for i, v in enumerate(ins)}
    lines = []
    for node in io_toposort(ins, outs):
        for o in node.outputs:
            index.setdefault(o, f"v{len(index)}")
        args = ", ".join(index.get(i, str(i)) for i in node.inputs)
        outs_s = ", ".join(index[o] for o in node.outputs)
        lines.append(f"{outs_s} = {node.op}({args})")
    return "\n".join(lines)


def hex_digest(x) -> str:
    """Fast content hash of an ndarray (reference ``hex_digest``)."""
    import numpy as _np

    a = _np.asarray(x)
    h = _hashlib.sha256()
    h.update(str(a.shape).encode())
    h.update(str(a.dtype).encode())
    h.update(a.tobytes())
    return h.hexdigest()


def min_informative_str(obj, indent_level: int = 0, _prev=None) -> str:
    """Compact multi-line graph description (reference
    ``min_informative_str``)."""
    pad = "  " * indent_level
    if getattr(obj, "owner", None) is None:
        return f"{pad}{obj}"
    lines = [f"{pad}{obj.owner.op}"]
    for i in obj.owner.inputs:
        lines.append(min_informative_str(i, indent_level + 1))
    return "\n".join(lines)


def get_node_by_id(f_or_fgraph, node_id: str):
    """Find the object labeled ``[id <node_id>]`` by debugprint.

    Ids are assigned in debugprint's own render order (review finding:
    a toposort-order lookup returned the wrong node), so this re-runs
    the same walk and matches the label exactly.  Returns the Apply
    node that produces the labeled variable (or the variable itself for
    graph inputs)."""
    fgraph = getattr(getattr(f_or_fgraph, "maker", None), "fgraph", f_or_fgraph)
    roots = getattr(fgraph, "outputs", fgraph)
    ids: dict = {}
    debugprint(roots, file="str", _ids_out=ids)
    targets = (f" [id {node_id}]",)
    for obj, tag in ids.items():
        if tag in targets:
            owner = getattr(obj, "owner", None)
            return owner if owner is not None else obj
    return None


def op_debug_information(op, node) -> str:
    """Extra per-op debug info hook (ops may override; reference
    ``op_debug_information``)."""
    fn = getattr(op, "debug_information", None)
    return fn(node) if fn else ""
