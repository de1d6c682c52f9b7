"""Continuous batching (`models.serve.ContinuousBatcher`): requests of
different lengths admitted/retired on the fly over shared device state
must reproduce each request's standalone greedy decode token-for-token,
through slot recycling and stale-cache reuse.
"""

import numpy as np
import pytest

from aesara_tpu.models.decoder import DecoderLM
from aesara_tpu.models.serve import ContinuousBatcher

V = 50


@pytest.fixture(scope="module")
def model():
    m = DecoderLM(V, n_layers=2, d_model=16, n_heads=4, d_ff=32, seed=0)
    r = np.random.default_rng(5)
    for p in m.params:
        v = p.get_value()
        p.set_value(v + r.normal(size=v.shape).astype(v.dtype) * 0.8)
    return m


def _drain(srv, queue, n_new):
    rids, results = {}, {}
    while queue or srv.pending():
        while queue and srv.free_slots():
            i, p = queue.pop(0)
            rids[srv.submit(p, max_new=n_new)] = i
        srv.step()
        for rid in list(rids):
            if rid in srv._done:
                results[rids.pop(rid)] = srv.result(rid)
    return results


def test_matches_per_request_decode_with_recycling(model):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, V, size=n).astype("int64")
               for n in (4, 6, 8, 5)]
    n_new = 10
    refs = {
        i: list(np.asarray(
            model.generate_from_prompt_fn(len(p), n_new, 64)(p)
        ))
        for i, p in enumerate(prompts)
    }
    # 2 slots for 4 requests: recycling + staggered depths exercised
    srv = ContinuousBatcher(model, n_slots=2, t_max=64, t_pad=8)
    results = _drain(srv, list(enumerate(prompts)), n_new)
    for i in refs:
        assert results[i] == refs[i], (i, results[i], refs[i])


def test_mid_flight_admission(model):
    rng = np.random.default_rng(1)
    p1 = rng.integers(0, V, size=6).astype("int64")
    p2 = rng.integers(0, V, size=4).astype("int64")
    n_new = 8
    ref1 = list(np.asarray(model.generate_from_prompt_fn(6, n_new, 64)(p1)))
    ref2 = list(np.asarray(model.generate_from_prompt_fn(4, n_new, 64)(p2)))

    srv = ContinuousBatcher(model, n_slots=2, t_max=64, t_pad=8)
    r1 = srv.submit(p1, max_new=n_new)
    # decode a few steps before admitting the second request
    for _ in range(3):
        srv.step()
    r2 = srv.submit(p2, max_new=n_new)
    while srv.pending():
        srv.step()
    assert srv.result(r1) == ref1
    assert srv.result(r2) == ref2


def test_eos_retires_early(model):
    rng = np.random.default_rng(2)
    p = rng.integers(0, V, size=5).astype("int64")
    srv = ContinuousBatcher(model, n_slots=1, t_max=64, t_pad=8)
    ref = list(np.asarray(model.generate_from_prompt_fn(5, 12, 64)(p)))
    eos = ref[3]  # force retirement at the 4th token
    rid = srv.submit(p, max_new=12, eos=eos)
    while srv.pending():
        srv.step()
    got = srv.result(rid)
    assert got == ref[:4]
    assert srv.free_slots() == 1  # slot returned


def test_submit_guards(model):
    srv = ContinuousBatcher(model, n_slots=1, t_max=32, t_pad=8)
    with pytest.raises(ValueError, match="t_pad"):
        srv.submit(list(range(9)), max_new=4)
    with pytest.raises(ValueError, match="t_max"):
        srv.submit([1, 2], max_new=40)
    with pytest.raises(ValueError, match="empty"):
        srv.submit([], max_new=4)
    with pytest.raises(ValueError, match="max_new"):
        srv.submit([1, 2], max_new=0)
    rid = srv.submit([1, 2, 3], max_new=4)
    with pytest.raises(RuntimeError, match="free slot"):
        srv.submit([4, 5], max_new=4)
    while srv.pending():
        srv.step()
    assert len(srv.result(rid)) == 4


@pytest.mark.parametrize("chunk", [3, 8])
def test_chunked_decode_matches(model, chunk):
    # chunk steps per readback (the tunnel-RTT amortization): identical
    # token streams, EOS retirement still exact mid-chunk
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, V, size=n).astype("int64") for n in (4, 7)]
    n_new = 11  # deliberately not a chunk multiple
    refs = {
        i: list(np.asarray(
            model.generate_from_prompt_fn(len(p), n_new, 64)(p)
        ))
        for i, p in enumerate(prompts)
    }
    srv = ContinuousBatcher(model, n_slots=2, t_max=64, t_pad=8, chunk=chunk)
    results = _drain(srv, list(enumerate(prompts)), n_new)
    for i in refs:
        assert results[i] == refs[i]
    # eos mid-chunk
    p = prompts[0]
    ref = refs[0]
    srv2 = ContinuousBatcher(model, n_slots=1, t_max=64, t_pad=8, chunk=chunk)
    eos = ref[4]
    rid = srv2.submit(p, max_new=n_new, eos=eos)
    while srv2.pending():
        srv2.step()
    # retires at the FIRST occurrence of the eos value in the stream
    first = ref.index(eos)
    assert srv2.result(rid) == ref[: first + 1]


def test_prefill_compiles_olog_programs(model):
    """Bucketing v2 integration (VERDICT r3 item 3b): the prefill input
    is In(seq_bucketed=0), so a stream of varying-length prompts compiles
    one XLA program per pow2 rung — O(log t_pad), not O(distinct lengths)."""
    rng = np.random.default_rng(3)
    srv = ContinuousBatcher(model, n_slots=1, t_max=64, t_pad=8)
    refs = {}
    for n in range(1, 9):  # every length 1..8
        p = rng.integers(0, V, size=n).astype("int64")
        refs[n] = (p, list(np.asarray(
            model.generate_from_prompt_fn(n, 3, 64)(p))))
    for n, (p, ref) in refs.items():
        rid = srv.submit(p, max_new=3)
        while rid not in srv._done:
            srv.step()
        assert srv.result(rid) == ref, (n, srv.result(rid), ref)
    cnt = srv._prefill.xla_compile_count
    if cnt is not None:  # None on non-jit paths
        # rungs 1,2,4,8 -> at most 4 programs for lengths 1..8
        assert cnt <= 4, cnt
