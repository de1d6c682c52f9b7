"""Function pickling & copy (reference types.py:1111 _pickle_Function)."""

import pickle

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at


def test_pickle_roundtrip_with_state():
    x = at.vector("x", dtype="float64")
    w = atp.shared(np.arange(3.0), name="w")
    f = atp.function([x], (x * w).sum(), updates={w: w + 1.0})
    assert np.isclose(f(np.ones(3)), 3.0)
    f2 = pickle.loads(pickle.dumps(f))
    # state at pickle time (w = [1,2,3]) travels
    assert np.isclose(f2(np.ones(3)), 6.0)
    np.testing.assert_allclose(f2.shared_vars[0].get_value(), [2, 3, 4])


def test_copy_swap_and_independence():
    x = at.vector("x", dtype="float64")
    w = atp.shared(np.arange(3.0), name="w")
    f = atp.function([x], (x * w).sum(), updates={w: w + 1.0})
    w2 = atp.shared(np.zeros(3), name="w2")
    g = f.copy(swap={w: w2})
    assert np.isclose(g(np.ones(3)), 0.0)
    np.testing.assert_allclose(w.get_value(), [0, 1, 2])  # f untouched
    h = f.copy()
    h(np.ones(3))
    h(np.ones(3))
    np.testing.assert_allclose(h.shared_vars[0].get_value(), [2, 3, 4])
    np.testing.assert_allclose(w.get_value(), [0, 1, 2])


def test_copy_delete_updates():
    x = at.vector("x", dtype="float64")
    w = atp.shared(np.arange(3.0), name="w")
    f = atp.function([x], (x * w).sum(), updates={w: w + 1.0})
    g = f.copy(delete_updates=True)
    g(np.ones(3))
    g(np.ones(3))
    np.testing.assert_allclose(g.shared_vars[0].get_value(), [0, 1, 2])


def test_pydotprint_and_d3viz(tmp_path):
    from aesara_tpu.printing import pydotprint
    from aesara_tpu.d3viz import d3viz, d3write

    x = at.matrix("x", dtype="float64")
    y = at.tanh(at.dot(x, x.T)).sum()
    dot = pydotprint(y, return_image=True)
    assert "digraph" in dot and "->" in dot
    html_path = tmp_path / "graph.html"
    d3viz(y, str(html_path))
    html = html_path.read_text()
    assert "<svg" in html and "graph" in html
    json_path = tmp_path / "graph.json"
    d3write(y, str(json_path))
    import json

    d = json.loads(json_path.read_text())
    assert d["nodes"] and d["edges"]
