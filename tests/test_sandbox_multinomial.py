"""sandbox.multinomial (reference ``tests/sandbox/test_multinomial.py``)."""

import numpy as np

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.sandbox.multinomial import ChoiceFromUniform, MultinomialFromUniform


def test_multinomial_from_uniform_one_hot():
    p = at.matrix("p", dtype="float64")
    u = at.vector("u", dtype="float64")
    m = MultinomialFromUniform("auto")(p, u)
    f = atp.function([p, u], m, mode="PY")
    pv = np.array([[0.1, 0.2, 0.7], [0.6, 0.3, 0.1]])
    uv = np.array([0.05, 0.95])
    out = f(pv, uv)
    # row 0: cum (0.1,0.3,1.0) > 0.05 → outcome 0; row 1: cum (0.6,0.9,1.0) > 0.95 → outcome 2
    assert np.array_equal(out, [[1, 0, 0], [0, 0, 1]])


def test_multinomial_from_uniform_counts():
    p = at.matrix("p", dtype="float64")
    u = at.vector("u", dtype="float64")
    m = MultinomialFromUniform("auto")(p, u, 3)
    f = atp.function([p, u], m, mode="PY")
    pv = np.array([[0.5, 0.5]])
    uv = np.array([0.1, 0.6, 0.9])    # picks 0, 1, 1
    assert np.array_equal(f(pv, uv), [[1.0, 2.0]])


def test_choice_without_replacement_exhausts():
    p = at.matrix("p", dtype="float64")
    u = at.vector("u", dtype="float64")
    c = ChoiceFromUniform("auto", replace=False)(p, u, 3)
    f = atp.function([p, u], c, mode="PY")
    pv = np.array([[0.2, 0.3, 0.5]])
    uv = np.random.RandomState(0).uniform(size=3)
    out = f(pv, uv)
    assert sorted(out.ravel().tolist()) == [0, 1, 2]   # all three picked once


def test_choice_with_replacement_distribution():
    p = at.matrix("p", dtype="float64")
    u = at.vector("u", dtype="float64")
    c = ChoiceFromUniform("auto", replace=True)(p, u, 1000)
    f = atp.function([p, u], c, mode="PY")
    pv = np.array([[0.9, 0.1]])
    uv = np.random.RandomState(1).uniform(size=1000)
    out = f(pv, uv)
    frac0 = (out == 0).mean()
    assert 0.85 < frac0 < 0.95
