"""MRG31k3p stream semantics: same seeds → same draws as the reference
(``aesara/sandbox/rng_mrg.py:715``), validated against an INDEPENDENT
scalar oracle of the published L'Ecuyer & Touzin recurrence plus
matrix-power identities for the stream-jump constants."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function
from aesara_tpu.sandbox.rng_mrg import (
    A1p72,
    A1p134,
    A2p72,
    A2p134,
    M1,
    M2,
    MRG_RandomStream,
    mrg_next_value,
    multMatVect,
)

_M1 = 2147483647
_M2 = 2147462579
_NORM = 4.656612873077392578125e-10


def oracle_next(s):
    """Direct transcription of the published MRG31k3p recurrence."""
    x11, x12, x13, x21, x22, x23 = (int(v) for v in s)
    y1 = (2**22 * x12 + (2**7 + 1) * x13) % _M1
    y2 = (2**15 * x21 + (2**15 + 1) * x23) % _M2
    s[:] = [y1, x11, x12, y2, x21, x22]
    d = (y1 - y2) % _M1
    return (d if d else _M1) * _NORM


def oracle_stream_draws(state6, n):
    s = list(int(v) for v in state6)
    return [oracle_next(s) for _ in range(n)], s


def _matpow_mod(A, e, m):
    R = [[int(i == j) for j in range(3)] for i in range(3)]
    A = [list(map(int, row)) for row in A]

    def mm(X, Y):
        return [
            [sum(X[i][k] * Y[k][j] for k in range(3)) % m for j in range(3)]
            for i in range(3)
        ]

    while e:
        if e & 1:
            R = mm(R, A)
        A = mm(A, A)
        e >>= 1
    return R


def test_jump_matrices_are_true_matrix_powers():
    A1 = [[0, 2**22, 2**7 + 1], [1, 0, 0], [0, 1, 0]]
    A2 = [[2**15, 0, 2**15 + 1], [1, 0, 0], [0, 1, 0]]
    assert _matpow_mod(A1, 2**72, _M1) == A1p72.tolist()
    assert _matpow_mod(A2, 2**72, _M2) == A2p72.tolist()
    assert _matpow_mod(A1, 2**134, _M1) == A1p134.tolist()
    assert _matpow_mod(A2, 2**134, _M2) == A2p134.tolist()


def test_scalar_recurrence_matches_oracle():
    s_mine = np.asarray([12345] * 6, dtype="int64")
    s_oracle = [12345] * 6
    for _ in range(500):
        assert mrg_next_value(s_mine) == oracle_next(s_oracle)
    assert list(s_mine) == [int(v) for v in s_oracle]


def test_substream_spacing_is_2p72():
    rs = MRG_RandomStream(seed=12345)
    states = rs.get_substream_rstates(3, inc_rstate=False)
    jumped = multMatVect(states[0], A1p72, M1, A2p72, M2)
    np.testing.assert_array_equal(states[1], jumped)
    jumped2 = multMatVect(states[1], A1p72, M1, A2p72, M2)
    np.testing.assert_array_equal(states[2], jumped2)


def test_uniform_interleaves_streams_exactly():
    """sample[i] is the next draw of stream i % n_streams — simulate the
    whole op with the oracle and compare elementwise."""
    rs = MRG_RandomStream(seed=12345)
    expected_states = rs.get_substream_rstates(2, inc_rstate=False)

    rs2 = MRG_RandomStream(seed=12345)
    u = rs2.uniform(size=(7,), nstreams=2, dtype="float64")
    f = function([], u, mode="PY")
    got = np.asarray(f())

    d0, _ = oracle_stream_draws(expected_states[0], 4)  # i = 0,2,4,6
    d1, _ = oracle_stream_draws(expected_states[1], 3)  # i = 1,3,5
    want = np.zeros(7)
    want[0::2] = d0
    want[1::2] = d1
    np.testing.assert_array_equal(got, want)


def test_repeated_calls_continue_streams():
    rs = MRG_RandomStream(seed=777)
    base_states = rs.get_substream_rstates(1, inc_rstate=False)

    rs2 = MRG_RandomStream(seed=777)
    u = rs2.uniform(size=(3,), nstreams=1, dtype="float64")
    f = function([], u, mode="PY")
    first = np.asarray(f())
    second = np.asarray(f())
    draws, _ = oracle_stream_draws(base_states[0], 6)
    np.testing.assert_array_equal(np.concatenate([first, second]), draws)


def test_seed_resets_streams():
    rs = MRG_RandomStream(seed=42)
    u = rs.uniform(size=(5,), nstreams=2, dtype="float64")
    f = function([], u, mode="PY")
    a = np.asarray(f()).copy()
    b = np.asarray(f()).copy()
    assert not np.array_equal(a, b)
    rs.seed(42)
    np.testing.assert_array_equal(np.asarray(f()), a)


def test_ops_get_distinct_stream_blocks():
    rs = MRG_RandomStream(seed=99)
    u1 = rs.uniform(size=(4,), nstreams=1, dtype="float64")
    u2 = rs.uniform(size=(4,), nstreams=1, dtype="float64")
    f = function([], [u1, u2], mode="PY")
    a, b = (np.asarray(v) for v in f())
    assert not np.array_equal(a, b)


def test_uniform_range_and_dtype():
    rs = MRG_RandomStream(seed=5)
    u = rs.uniform(size=(1000,), low=-2.0, high=3.0, nstreams=4,
                   dtype="float64")
    f = function([], u, mode="PY")
    v = np.asarray(f())
    assert v.min() > -2.0 and v.max() < 3.0
    assert abs(v.mean() - 0.5) < 0.3


def test_normal_box_muller_reproducible():
    rs = MRG_RandomStream(seed=31)
    z = rs.normal(size=(6, 5), nstreams=3, dtype="float64")
    f = function([], z, mode="PY")
    v1 = np.asarray(f()).copy()
    rs2 = MRG_RandomStream(seed=31)
    z2 = rs2.normal(size=(6, 5), nstreams=3, dtype="float64")
    f2 = function([], z2, mode="PY")
    np.testing.assert_array_equal(v1, np.asarray(f2()))
    big = np.asarray(
        function(
            [],
            MRG_RandomStream(seed=8).normal(
                size=(4000,), nstreams=16, dtype="float64"
            ),
            mode="PY",
        )()
    )
    assert abs(big.mean()) < 0.1 and abs(big.std() - 1.0) < 0.1


def test_binomial():
    rs = MRG_RandomStream(seed=13)
    b = rs.binomial(size=(2000,), p=0.25, nstreams=8)
    f = function([], b, mode="PY")
    v = np.asarray(f())
    assert set(np.unique(v)) <= {0, 1}
    assert abs(v.mean() - 0.25) < 0.05


def test_seed_validation():
    with pytest.raises(ValueError):
        MRG_RandomStream(seed=0)
    with pytest.raises(ValueError):
        MRG_RandomStream(seed=int(M2))
    with pytest.raises(ValueError):
        MRG_RandomStream(seed=[0, 0, 0, 1, 1, 1])
    with pytest.raises(TypeError):
        MRG_RandomStream(seed=[1, 2, 3])


@pytest.mark.parametrize("n,nstreams", [(7, 2), (12, 4), (5, 8), (16, 16)])
def test_py_vs_xla_bit_identity(n, nstreams):
    """The uint32 XLA formulation must produce bit-identical draws and
    final states to the int64 host path."""
    rs_a = MRG_RandomStream(seed=2024)
    u_a = rs_a.uniform(size=(n,), nstreams=nstreams, dtype="float64")
    f_py = function([], u_a, mode="PY")

    rs_b = MRG_RandomStream(seed=2024)
    u_b = rs_b.uniform(size=(n,), nstreams=nstreams, dtype="float64")
    f_jax = function([], u_b, mode="JAX")

    for _ in range(3):
        a = np.asarray(f_py())
        b = np.asarray(f_jax())
        np.testing.assert_array_equal(a, b)
