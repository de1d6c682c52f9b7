"""Bounded while-scan with stacked outputs (``padded_while=True``).

SURVEY §7(b)'s bounded-shape strategy: the until-condition folds into a
``done`` carry of a REGULAR scan over the n_steps bound, so stacks are
static-shaped (XLA-compilable), frozen/zeroed after the stop step, and
an int8 validity mask is appended.  Differential-tested py vs XLA,
values and gradients.
"""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.gradient import grad
from aesara_tpu.scan.basic import scan, until


def build_doubling(bound=8):
    return scan(
        lambda p: (p * 2.0, until(p * 2.0 > 10)),
        outputs_info=[at.constant(np.float64(1.0))],
        n_steps=bound,
        padded_while=True,
    )


@pytest.mark.parametrize("mode", ["PY", "JAX"])
def test_values_padded_and_mask(mode):
    (vals, valid), _ = build_doubling()
    f = function([], [vals, valid], mode=mode)
    v, m = f()
    np.testing.assert_allclose(
        np.asarray(v), [2, 4, 8, 16, 16, 16, 16, 16]
    )
    np.testing.assert_array_equal(np.asarray(m), [1, 1, 1, 1, 0, 0, 0, 0])


def test_compiles_to_one_xla_program():
    """The padded form must lower without the while-stack error."""
    (vals, valid), _ = build_doubling()
    f = function([], [vals, valid], mode="JAX")
    v, _ = f()
    assert np.asarray(v).shape == (8,)


def test_unpadded_while_stacks_fall_back_to_py():
    """Without a bound, stacked while outputs stay dynamic-length: the
    JAX mode falls back to the py path (truncated reference semantics)
    instead of compiling."""
    k, _ = scan(
        lambda p: (p * 2.0, until(p * 2.0 > 10)),
        outputs_info=[at.constant(np.float64(1.0))],
        n_steps=100,
    )
    f = function([], k, mode="JAX")
    np.testing.assert_allclose(np.asarray(f()), [2.0, 4.0, 8.0, 16.0])
    # the raw lowering itself still raises the actionable error
    from aesara_tpu.link.jax.scan_dispatch import _jax_while_scan

    with pytest.raises(NotImplementedError, match="padded_while"):
        _jax_while_scan(k.owner.op)


def test_grads_match_and_mask_invalid_rows():
    x = at.vector("x", dtype="float64")
    (h, valid), _ = scan(
        lambda xt, acc: (acc + xt, until(acc + xt > 2.0)),
        sequences=[x],
        outputs_info=[at.constant(np.float64(0.0))],
        n_steps=4,
        padded_while=True,
    )
    cost = (h * valid).sum()
    g = grad(cost, x)
    fp = function([x], [h, valid, g], mode="PY")
    fj = function([x], [h, valid, g], mode="JAX")
    xv = np.array([1.0, 1.5, 1.0, 1.0])  # stops at step 2 (cumsum 2.5 > 2)
    hp, vp, gp = fp(xv)
    hj, vj, gj = fj(xv)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hj))
    np.testing.assert_array_equal(np.asarray(vp), np.asarray(vj))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gj))
    # analytic: valid rows h1=x0, h2=x0+x1 → dcost/dx = [2, 1, 0, 0]
    np.testing.assert_allclose(np.asarray(gp), [2.0, 1.0, 0.0, 0.0])


def test_never_triggering_condition_runs_full_bound():
    x = at.vector("x", dtype="float64")
    (h, valid), _ = scan(
        lambda xt, acc: (acc + xt, until(acc > 1e9)),
        sequences=[x],
        outputs_info=[at.constant(np.float64(0.0))],
        n_steps=3,
        padded_while=True,
    )
    f = function([x], [h, valid], mode="JAX")
    hv, vv = f(np.ones(3))
    np.testing.assert_allclose(np.asarray(hv), [1, 2, 3])
    np.testing.assert_array_equal(np.asarray(vv), [1, 1, 1])


def test_shared_updates_freeze_after_stop():
    s = atp.shared(np.float64(0.0), name="acc")
    k, upd = scan(
        lambda p: (p * 2.0, {s: s + 1.0}, until(p * 2.0 > 10)),
        outputs_info=[at.constant(np.float64(1.0))],
        n_steps=8,
        padded_while=True,
    )
    outs = k if isinstance(k, list) else [k]
    f = function([], outs, updates=upd, mode="JAX")
    f()
    # the counter must stop with the loop: 4 valid steps
    assert np.isclose(s.get_value(), 4.0), s.get_value()


def test_requires_bound_and_condition():
    with pytest.raises(ValueError, match="n_steps"):
        scan(
            lambda xt, p: (p * 2.0, until(p > 10)),
            outputs_info=[at.constant(np.float64(1.0))],
            sequences=[at.vector("x", dtype="float64")],
            padded_while=True,
        )
    with pytest.raises(ValueError, match="until"):
        scan(
            lambda p: p * 2.0,
            outputs_info=[at.constant(np.float64(1.0))],
            n_steps=4,
            padded_while=True,
        )
