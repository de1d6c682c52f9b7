"""Aux-surface behavior: ScanArgs round-trip, printer registry, ifelse
merges, printing helpers (reference scan/utils.py, printing.py,
ifelse.py)."""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.scan.basic import scan


def test_scanargs_roundtrip():
    from aesara_tpu.scan.utils import ScanArgs

    s = at.matrix("s", dtype="float32")
    outs, _ = scan(lambda e, acc: acc + e.sum(), sequences=[s],
                   outputs_info=[at.as_tensor_variable(np.float32(0.0))])
    node = outs.owner
    sa = ScanArgs.from_node(node)
    assert sa.outer_inputs == list(node.inputs)
    assert sa.outer_outputs == list(node.outputs)
    assert sa.inner_inputs == list(node.op.fgraph.inputs)
    assert len(sa.outer_in_seqs) == 1 and len(sa.outer_in_sit_sot) == 1


def test_scan_utils_helpers():
    from aesara_tpu.scan.basic import until
    from aesara_tpu.scan.utils import (get_updates_and_outputs,
                                       reconstruct_graph, safe_new)

    v = safe_new(at.vector("q", dtype="float64"), tag="_copy")
    assert v.name == "q_copy" and v.type.ndim == 1

    x = at.vector("x", dtype="float64")
    e = at.math.exp(x)
    ni, no = reconstruct_graph([x], [e])
    assert ni[0] is not x and no[0].owner.op is e.owner.op

    o, u, c = get_updates_and_outputs((at.scalar("a", dtype="float64"), until(at.scalar("c", dtype="float64") > 0)))
    assert len(o) == 1 and not u and c is not None


def test_cond_remove_identical_registered():
    from aesara_tpu.ifelse import IfElse, ifelse

    c = at.scalar("c", dtype="bool")
    x = at.vector("x", dtype="float64")
    f = atp.function([c, x], ifelse(c, x * 2, x * 2))
    assert not any(isinstance(n.op, IfElse) for n in f.maker.fgraph.toposort())
    xv = np.arange(3.0, dtype="float32")
    assert np.allclose(f(True, xv), xv * 2)
    assert np.allclose(f(False, xv), xv * 2)


def test_cond_merge():
    from aesara_tpu.graph.fg import FunctionGraph
    from aesara_tpu.ifelse import CondMerge, IfElse, ifelse

    c = at.scalar("c", dtype="bool")
    x = at.vector("x", dtype="float64")
    y = at.vector("y", dtype="float64")
    fg = FunctionGraph([c, x, y],
                       [ifelse(c, x * 2, x + 1), ifelse(c, y - 3, y * 5)],
                       clone=False)
    CondMerge().rewrite(fg)
    assert sum(isinstance(n.op, IfElse) for n in fg.toposort()) == 1
    f = atp.function([c, x, y], fg.outputs, mode="PY")
    xv, yv = np.arange(3.0), np.ones(3)
    ra, rb = f(False, xv, yv)
    assert np.allclose(ra, xv + 1) and np.allclose(rb, yv * 5)


def test_printer_registry():
    from aesara_tpu.printing import FunctionPrinter, pp, register_printer
    from aesara_tpu.tensor.special import Softmax

    register_printer(Softmax, FunctionPrinter(["softmax"]))
    x = at.vector("x", dtype="float64")
    assert pp(at.special.softmax(x, axis=-1)) == "softmax(x)"


def test_position_independent_str_stable():
    from aesara_tpu.printing import position_independent_str

    def build():
        v = at.vector("x", dtype="float64")
        return at.math.exp(v) + 1

    assert position_independent_str(build()) == position_independent_str(build())


def test_broadcast_params():
    from aesara_tpu.tensor.random.utils import broadcast_params

    mu = at.as_tensor_variable(np.zeros((3, 1), dtype="float32"))
    sd = at.as_tensor_variable(np.ones((4,), dtype="float32"))
    bmu, bsd = broadcast_params([mu, sd], [0, 0])
    f = atp.function([], [bmu.shape, bsd.shape], mode="PY")
    s1, s2 = f()
    assert list(s1) == [3, 4] and list(s2) == [3, 4]


def test_typed_list_variable_sugar():
    from aesara_tpu.tensor.type import TensorType
    from aesara_tpu.typed_list.basic import TypedListVariable, index_, length
    from aesara_tpu.typed_list.type import TypedListType

    tl_type = TypedListType(TensorType("float64", (None,)))
    lst = tl_type("lst")
    assert isinstance(lst, TypedListVariable)
    v = TensorType("float64", (None,))("v")
    data = [np.arange(3.0), np.ones(2), np.zeros(4)]

    f = atp.function([lst, v], index_(lst, v), mode="PY")
    assert int(f(data, np.ones(2))) == 1

    f2 = atp.function([lst], lst[1], mode="PY")
    assert np.allclose(f2(data), np.ones(2))

    f3 = atp.function([lst, v], length(lst.append(v)), mode="PY")
    assert int(f3(data, np.ones(2))) == 4

    import pytest

    with pytest.raises(ValueError, match="not in"):
        f(data, np.full(5, 7.0))
