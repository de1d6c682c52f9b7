"""Printing-layer behavior corpus.

Behavior specs mirroring the reference printing suite's intents
(``/root/reference/tests/test_printing.py``): debugprint structure
(indentation, ids, shared-subexpression elision, depth limiting,
multi-output suffixes, inner graphs), the Print op's eager side effect,
and the small helpers (char_from_number, min_informative_str).
"""

import io

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.printing import (
    Print,
    char_from_number,
    debugprint,
    min_informative_str,
    pp,
)

floatX = atp.config.floatX


def dp(obj, **kw):
    return debugprint(obj, file="str", **kw)


def test_debugprint_basic_structure():
    x = at.vector("x")
    y = at.vector("y")
    out = (x + y) * 2
    text = dp(out)
    lines = text.splitlines()
    # one root line, children indented one space per level
    assert lines[0].startswith("Elemwise") or "mul" in lines[0].lower()
    assert any(l.startswith(" ") for l in lines)
    assert any("'x'" in l for l in lines)
    assert any("'y'" in l for l in lines)


def test_debugprint_ids_char_int_none():
    x = at.vector("x")
    out = x * 2
    t_char = dp(out, id_type="CHAR")
    t_int = dp(out, id_type="int")
    t_none = dp(out, id_type="")
    assert "[id A]" in t_char
    assert "[id 0]" in t_int
    assert "[id" not in t_none


def test_debugprint_shared_subexpression_elided():
    x = at.vector("x")
    shared_sub = at.exp(x)
    out = shared_sub + shared_sub * 2
    text = dp(out)
    # the second occurrence of the exp node prints "..." instead of
    # re-expanding its children
    assert text.count("Exp") >= 2 or text.count("exp") >= 2
    assert "..." in text


def test_debugprint_depth_limit():
    x = at.vector("x")
    out = at.exp(at.log(at.exp(x)))
    full = dp(out)
    shallow = dp(out, depth=1)
    assert len(shallow.splitlines()) < len(full.splitlines())
    assert "'x'" not in shallow


def test_debugprint_print_type():
    x = at.matrix("x")
    text = dp(x * 2, print_type=True)
    assert "<" in text and ">" in text  # type annotations present


def test_debugprint_stop_on_name():
    x = at.vector("x")
    mid = at.exp(x)
    mid.name = "named_mid"
    out = mid * 2
    text = dp(out, stop_on_name=True)
    assert "named_mid" in text
    assert "'x'" not in text  # traversal stopped at the named variable


def test_debugprint_multi_output_index_suffix():
    import aesara_tpu.tensor.nlinalg as nl

    m = at.matrix("m")
    w, v = nl.eig(m)
    text = dp([w, v])
    assert ".0" in text and ".1" in text


def test_debugprint_scan_inner_graph_section():
    x = at.vector("x")
    result, _ = atp.scan(fn=lambda el, acc: acc + el, sequences=[x],
                         outputs_info=[at.as_tensor(np.asarray(0.0, floatX))])
    text = dp(result)
    assert "Inner graphs:" in text
    assert "Scan" in text


def test_debugprint_opfromgraph_inner_graph():
    a = at.vector("a")
    b = at.vector("b")
    ofg = atp.compile.builders.OpFromGraph([a, b], [a * b + 1])
    x = at.vector("x")
    y = at.vector("y")
    text = dp(ofg(x, y))
    assert "Inner graphs:" in text


def test_debugprint_function_and_fgraph():
    x = at.vector("x")
    f = atp.function([x], x * 3, mode="PY")
    text = dp(f)
    assert text  # prints the compiled fgraph without error
    text2 = dp(f, print_fgraph_inputs=True)
    assert "Inputs:" in text2


def test_debugprint_destroy_view_maps():
    from aesara_tpu.tensor.blas import gemm_inplace

    a = at.matrix("a")
    b = at.matrix("b")
    z = at.matrix("z")
    one = at.as_tensor(np.asarray(1.0, floatX))
    out = gemm_inplace(z, one, a, b, one)
    text = dp(out, print_destroy_map=True)
    assert "d={" in text
    x = at.vector("x")
    text2 = dp(x[1:3], print_view_map=True)
    assert "v={" in text2


def test_debugprint_rejects_junk():
    with pytest.raises(TypeError):
        debugprint(42)


def test_print_op_side_effect(capsys):
    x = at.vector("x")
    printed = Print("my_tag")(x)
    f = atp.function([x], printed * 2, mode="PY")
    res = f(np.ones(2, floatX))
    np.testing.assert_allclose(np.asarray(res), 2 * np.ones(2))
    captured = capsys.readouterr()
    assert "my_tag" in captured.out


def test_char_from_number_sequence():
    assert char_from_number(0) == "A"
    assert char_from_number(1) == "B"
    assert char_from_number(25) == "Z"
    assert len(char_from_number(26)) == 2


def test_pp_renders_expression():
    x = at.scalar("x")
    y = at.scalar("y")
    s = pp(x + y)
    assert "x" in s and "y" in s and "+" in s


def test_min_informative_str_mentions_ops():
    x = at.vector("x")
    s = min_informative_str(at.exp(x) + x)
    assert isinstance(s, str) and s
