"""RV rewrites (reference ``tensor/random/rewriting.py``)."""

import numpy as np

import aesara_tpu.tensor as at
from aesara_tpu.graph.fg import FunctionGraph
from aesara_tpu.tensor.basic import get_vector_length
from aesara_tpu.tensor.random.basic import normal
from aesara_tpu.tensor.random.rewriting import (
    local_dimshuffle_rv_lift,
    local_rv_size_lift,
    local_subtensor_rv_lift,
    random_rewrites_db,
)


def test_rv_size_lift_redundant_size():
    mu = at.as_tensor_variable(np.array([1.0, 2.0, 3.0], dtype="float32"))
    d = normal(mu, 1.0, size=(3,))
    fg = FunctionGraph([], [d], clone=False)
    res = local_rv_size_lift.transform(fg, d.owner)
    assert res
    new = res[d]
    assert get_vector_length(new.owner.inputs[1]) == 0
    assert new.type.shape == d.type.shape


def test_rv_size_lift_skips_real_size():
    # size (2, 3) broadcasts a scalar param — NOT redundant
    d = normal(0.0, 1.0, size=(2, 3))
    fg = FunctionGraph([], [d], clone=False)
    assert not local_rv_size_lift.transform(fg, d.owner)


def test_dimshuffle_rv_lift_permutes_size():
    d = normal(0.0, 1.0, size=(2, 3))
    tr = d.T
    fg = FunctionGraph([], [tr], clone=False)
    res = local_dimshuffle_rv_lift.transform(fg, tr.owner)
    assert res
    new = res[tr]
    # the transpose is gone: output comes straight from an RV
    from aesara_tpu.tensor.random.op import RandomVariable

    assert isinstance(new.owner.op, RandomVariable)


def test_dimshuffle_rv_lift_skips_broadcast_insert():
    d = normal(0.0, 1.0, size=(4,))
    padded = d.dimshuffle("x", 0)
    fg = FunctionGraph([], [padded], clone=False)
    assert not local_dimshuffle_rv_lift.transform(fg, padded.owner)


def test_subtensor_rv_lift_indexes_params():
    mu = at.as_tensor_variable(np.array([1.0, 2.0, 3.0], dtype="float32"))
    sd = at.as_tensor_variable(np.array([1.0, 1.0, 1.0], dtype="float32"))
    d = normal(mu, sd)
    sub = d[1]
    fg = FunctionGraph([], [sub], clone=False)
    res = local_subtensor_rv_lift.transform(fg, sub.owner)
    assert res
    new = res[sub]
    assert new.type.ndim == 0
    # the new RV's mu param is the indexed element
    assert new.owner.inputs[2].type.ndim == 0


def test_subtensor_rv_lift_skips_explicit_size():
    mu = at.as_tensor_variable(np.array([1.0, 2.0, 3.0], dtype="float32"))
    d = normal(mu, 1.0, size=(5, 3))
    sub = d[1]
    fg = FunctionGraph([], [sub], clone=False)
    assert not local_subtensor_rv_lift.transform(fg, sub.owner)


def test_db_queryable():
    from aesara_tpu.graph.rewriting.db import RewriteDatabaseQuery

    result = random_rewrites_db.query(RewriteDatabaseQuery(include=["basic"]))
    assert result is not None


def test_subtensor_rv_lift_advanced_index():
    mu = at.as_tensor_variable(np.arange(5.0, dtype="float32"))
    sd = at.as_tensor_variable(np.ones(5, dtype="float32"))
    d = normal(mu, sd)
    idx = at.as_tensor_variable(np.array([3, 1], dtype="int64"))
    sub = d[idx]
    fg = FunctionGraph([], [sub], clone=False)
    res = local_subtensor_rv_lift.transform(fg, sub.owner)
    assert res
    new = res[sub]
    assert new.type.ndim == 1
    assert new.owner.inputs[2].type.ndim == 1  # mu got indexed, not the draw


def test_subtensor_rv_lift_boolean_mask():
    mu = at.as_tensor_variable(np.arange(6.0, dtype="float32").reshape(2, 3))
    sd = at.as_tensor_variable(np.ones((2, 3), dtype="float32"))
    d = normal(mu, sd)
    mask = at.matrix("mask", dtype="bool")
    sub = d[mask]
    fg = FunctionGraph([mask], [sub], clone=False)
    res = local_subtensor_rv_lift.transform(fg, sub.owner)
    assert res
    new = res[sub]
    from aesara_tpu.tensor.random.op import RandomVariable

    assert isinstance(new.owner.op, RandomVariable)
    # the mu param has been masked: it is now 1-d (data-dependent length)
    assert new.owner.inputs[2].type.ndim == 1
    # value check: masked draw equals drawing from masked params
    from aesara_tpu.compile.function import function

    f = function([mask], new, mode="PY")
    mv = np.array([[True, False, True], [False, True, False]])
    out = f(mv)
    assert out.shape == (3,)


def test_subtensor_rv_lift_boolean_mask_skips_support_dims():
    # masks that would touch support dims (ndim_supp > 0) must not fire
    from aesara_tpu.tensor.random.basic import multivariate_normal

    mean = at.as_tensor_variable(np.zeros((2, 3), dtype="float64"))
    cov = at.as_tensor_variable(np.eye(3))
    d = multivariate_normal(mean, cov)        # batch (2,), support (3,)
    mask = at.matrix("mask", dtype="bool")    # covers batch+support dims
    sub = d[mask]
    fg = FunctionGraph([mask], [sub], clone=False)
    assert not local_subtensor_rv_lift.transform(fg, sub.owner)
