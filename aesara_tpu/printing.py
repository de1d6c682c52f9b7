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
    ids: dict = {}

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

    for out in outputs:
        render_var(out, "", depth)

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
    """0→A, 1→B, ..., 26→AA (reference helper)."""
    base = 26
    digits = []
    number = int(number)
    while True:
        number, rem = divmod(number, base)
        digits.append(chr(ord("A") + rem))
        if number == 0:
            break
    return "".join(reversed(digits))


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
