"""Coverage for the small/auxiliary modules that had no direct tests:
raise_op, breakpoint, scan views, NullType, compiledir + cache CLI,
may_share_memory, OrderedSet, pkl_utils, fourier alias, compile lock
(reference: tests/test_raise_op.py, tests/scan views coverage,
tests/misc/, tests/compile/test_compiledir)."""

import io
import os
import pickle
import sys

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.compile.function import function

rng = np.random.default_rng(9090)


class TestRaiseOp:
    def test_assert_passes_value_through(self):
        from aesara_tpu.raise_op import Assert

        x = at.vector("x", dtype="float64")
        out = Assert("must be positive")(x, (x > 0).all())
        f = function([x], out * 2, mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.ones(3))), 2 * np.ones(3))

    def test_assert_raises_on_false(self):
        from aesara_tpu.raise_op import Assert

        x = at.vector("x", dtype="float64")
        out = Assert("must be positive")(x, (x > 0).all())
        f = function([x], out, mode="PY")
        with pytest.raises(AssertionError, match="positive"):
            f(np.array([1.0, -1.0]))

    def test_check_and_raise_custom_exception(self):
        from aesara_tpu.raise_op import CheckAndRaise

        x = at.scalar("x", dtype="float64")
        op = CheckAndRaise(ValueError, "too big")
        f = function([x], op(x, x < 10.0), mode="PY")
        assert float(np.asarray(f(3.0))) == 3.0
        with pytest.raises(ValueError, match="too big"):
            f(30.0)

    def test_grad_passes_through_check(self):
        from aesara_tpu.gradient import grad
        from aesara_tpu.raise_op import assert_op

        x = at.vector("x", dtype="float64")
        out = assert_op(x, (x < 100.0).all()).sum()
        g = grad(out, x)
        f = function([x], g, mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.ones(3))), np.ones(3))


class TestBreakpoint:
    def test_condition_false_is_identity(self):
        from aesara_tpu.breakpoint import PdbBreakpoint

        x = at.vector("x", dtype="float64")
        mon = PdbBreakpoint("never")(at.constant(np.int8(0)), x * 2)
        f = function([x], mon, mode="PY")
        np.testing.assert_allclose(np.asarray(f(np.ones(3))), 2 * np.ones(3))


class TestScanViews:
    def test_map(self):
        from aesara_tpu.scan.views import map as scan_map

        X = at.matrix("X", dtype="float64")
        out, _ = scan_map(lambda row: row.sum(), sequences=[X])
        f = function([X], out, mode="FAST_RUN")
        Xv = rng.normal(size=(5, 3))
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv.sum(axis=1),
                                   rtol=1e-10)

    def test_reduce_returns_final_only(self):
        from aesara_tpu.scan.views import reduce as scan_reduce

        X = at.vector("X", dtype="float64")
        out, _ = scan_reduce(lambda x_t, acc: acc * x_t, sequences=[X],
                             outputs_info=at.constant(np.float64(1.0)))
        f = function([X], out, mode="FAST_RUN")
        Xv = rng.uniform(0.5, 1.5, size=7)
        np.testing.assert_allclose(float(np.asarray(f(Xv))), Xv.prod(),
                                   rtol=1e-10)

    def test_foldl_foldr_direction(self):
        from aesara_tpu.scan.views import foldl, foldr

        X = at.vector("X", dtype="float64")
        # subtraction is order-sensitive: foldl((a-b)) != foldr
        l, _ = foldl(lambda x_t, acc: acc - x_t, [X],
                     at.constant(np.float64(0.0)))
        r, _ = foldr(lambda x_t, acc: acc - x_t, [X],
                     at.constant(np.float64(0.0)))
        f = function([X], [l, r], mode="PY")
        Xv = np.array([1.0, 2.0, 4.0])
        lv, rv = f(Xv)
        assert float(np.asarray(lv)) == -7.0
        assert float(np.asarray(rv)) == -7.0  # sum is the same...
        l2, _ = foldl(lambda x_t, acc: acc / 2 + x_t, [X],
                      at.constant(np.float64(0.0)))
        r2, _ = foldr(lambda x_t, acc: acc / 2 + x_t, [X],
                      at.constant(np.float64(0.0)))
        f2 = function([X], [l2, r2], mode="PY")
        a, b = f2(Xv)
        assert float(np.asarray(a)) != float(np.asarray(b))


class TestNullType:
    def test_grad_of_discrete_is_null_and_errors_on_use(self):
        from aesara_tpu.gradient import grad

        x = at.vector("x", dtype="float64")
        out = at.argmax(x)
        with pytest.raises(Exception):
            grad(out, x)

    def test_null_type_repr(self):
        from aesara_tpu.graph.null_type import NullType

        nt = NullType()
        assert "Null" in str(nt) or "null" in str(nt)
        with pytest.raises(Exception):
            nt.filter(1.0)


class TestCompiledirAndCLI:
    def test_print_compiledir_content(self, capsys):
        from aesara_tpu.compile.compiledir import print_compiledir_content

        print_compiledir_content()
        out = capsys.readouterr().out
        assert "compiledir" in out or os.sep in out or out  # non-crash

    def test_cache_cli_list(self, capsys, monkeypatch):
        from aesara_tpu.bin.cache_cli import main

        monkeypatch.setattr(sys, "argv", ["aesara-tpu-cache", "list"])
        rc = main()
        assert rc in (0, None)

    def test_cache_cli_unknown_command(self, monkeypatch, capsys):
        from aesara_tpu.bin.cache_cli import main

        monkeypatch.setattr(sys, "argv", ["aesara-tpu-cache", "bogus"])
        rc = main()
        assert rc not in (0, None) or "usage" in capsys.readouterr().out.lower()

    def test_compile_lock_acquire_release(self, tmp_path):
        from aesara_tpu.link.c.build import lock_ctx

        lock_dir = str(tmp_path / "locks" / "one.lock")
        with lock_ctx(lock_dir):
            assert os.path.isdir(lock_dir)
        assert not os.path.exists(lock_dir)

    def test_compile_lock_stale_recovery(self, tmp_path):
        from aesara_tpu.link.c.build import lock_ctx

        lock_dir = str(tmp_path / "locks" / "stale.lock")
        os.makedirs(lock_dir)
        old = 1.0
        os.utime(lock_dir, (old, old))  # ancient mtime: stale
        with lock_ctx(lock_dir, timeout=5.0):
            pass
        assert not os.path.exists(lock_dir)


class TestMisc:
    def test_may_share_memory(self):
        from aesara_tpu.misc.may_share_memory import may_share_memory

        a = np.zeros(4)
        assert may_share_memory(a, a[1:])
        assert not may_share_memory(a, np.zeros(4))
        # non-array types: raise_other=False returns False
        assert not may_share_memory("x", a, raise_other_type=False)
        with pytest.raises(TypeError):
            may_share_memory("x", a)

    def test_ordered_set(self):
        from aesara_tpu.misc.ordered_set import OrderedSet

        s = OrderedSet([3, 1, 2, 1])
        assert list(s) == [3, 1, 2]
        s.add(1)
        s.add(7)
        assert list(s) == [3, 1, 2, 7]
        s2 = s - OrderedSet([1])
        assert 1 not in s2 and 3 in s2

    def test_pkl_utils_dump_load_dedupes_arrays(self, tmp_path):
        from aesara_tpu.misc.pkl_utils import dump, load

        w = atp.shared(rng.normal(size=(3, 3)), name="w")
        obj = {"a": w, "b": [w, np.arange(4)]}
        p = tmp_path / "state.zip"
        with open(p, "wb") as fh:
            dump(obj, fh)
        with open(p, "rb") as fh:
            back = load(fh)
        np.testing.assert_allclose(
            np.asarray(back["a"].get_value()), np.asarray(w.get_value())
        )
        np.testing.assert_array_equal(back["b"][1], np.arange(4))

    def test_strip_pickler_drops_excluded(self):
        from aesara_tpu.misc.pkl_utils import StripPickler

        buf = io.BytesIO()
        x = at.vector("x", dtype="float64")
        StripPickler(buf, protocol=2).dump(x)
        assert buf.tell() > 0


class TestFourierAlias:
    def test_rfft_matches_numpy(self):
        from aesara_tpu.tensor.fourier import irfft, rfft

        x = at.matrix("x", dtype="float64")
        f = function([x], rfft(x), mode="PY")
        Xv = rng.normal(size=(4, 8))
        got = np.asarray(f(Xv))
        want = np.fft.rfft(Xv)
        np.testing.assert_allclose(got[..., 0], want.real, rtol=1e-9,
                                   atol=1e-12)
        np.testing.assert_allclose(got[..., 1], want.imag, rtol=1e-9,
                                   atol=1e-12)

    def test_roundtrip(self):
        from aesara_tpu.tensor.fourier import irfft, rfft

        x = at.matrix("x", dtype="float64")
        f = function([x], irfft(rfft(x)), mode="PY")
        Xv = rng.normal(size=(3, 8))
        np.testing.assert_allclose(np.asarray(f(Xv)), Xv, rtol=1e-9,
                                   atol=1e-12)


class TestDestroyHandlerDirect:
    def test_illegal_double_destroy_rejected(self):
        """Two destructive consumers of one variable can't both run."""
        from aesara_tpu.graph.destroyhandler import DestroyHandler
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.graph.features import ReplaceValidate
        from aesara_tpu.tensor.subtensor import IncSubtensor

        x = at.vector("x", dtype="float64")
        inc = IncSubtensor([slice(None)], inplace=True)
        a = inc(x, at.ones_like(x))
        b = inc(x, at.ones_like(x))
        fg = FunctionGraph([x], [a + b], clone=True)
        fg.attach_feature(ReplaceValidate())
        with pytest.raises(Exception):
            fg.attach_feature(DestroyHandler())
            fg.validate()

    def test_legal_chain_accepted(self):
        from aesara_tpu.graph.destroyhandler import DestroyHandler
        from aesara_tpu.graph.fg import FunctionGraph
        from aesara_tpu.tensor.subtensor import IncSubtensor

        x = at.vector("x", dtype="float64")
        inc = IncSubtensor([slice(None)], inplace=True)
        mid = at.exp(x)
        out = inc(mid, at.ones_like(x))
        fg = FunctionGraph([x], [out], clone=True)
        fg.attach_feature(DestroyHandler())
        fg.validate() if hasattr(fg, "validate") else None


class TestD3VizDeepFeatures:
    def _scan_function(self, profile=False):
        import aesara_tpu as atp
        import aesara_tpu.tensor as at
        from aesara_tpu.scan.basic import scan

        X = at.tensor3("X", dtype="float64")
        h, _ = scan(lambda xt, htm1: at.tanh(htm1 + xt),
                    sequences=[X],
                    outputs_info=[at.zeros_like(X[0])])
        return atp.function([X], (h[-1] ** 2).sum(), mode="PY",
                            profile=profile)

    def test_subgraph_nested_in_dict(self):
        from aesara_tpu.d3viz.formatting import graph_to_dict

        f = self._scan_function()
        d = graph_to_dict(f)
        scans = [n for n in d["nodes"] if "subgraph" in n]
        assert scans, "Scan node should carry its inner graph"
        inner = scans[0]["subgraph"]
        assert inner["nodes"] and inner["edges"]

    def test_profile_heat_in_dict_and_dot(self):
        import numpy as np

        from aesara_tpu.d3viz.formatting import PyDotFormatter, graph_to_dict

        f = self._scan_function(profile=True)
        f(np.ones((3, 2, 2), dtype="float32"))
        d = graph_to_dict(f)
        timed = [n for n in d["nodes"] if "time_frac" in n]
        assert timed, "profiled function should carry time shares"
        assert abs(sum(n["time_frac"] for n in timed) - 1.0) < 1e-6
        dot = PyDotFormatter()(f)
        assert "#ff" in dot  # heat ramp fill
        assert "peripheries=2" in dot  # double border marks inner graphs

    def test_html_has_navigation(self, tmp_path):
        from aesara_tpu.d3viz.d3viz import d3viz

        f = self._scan_function()
        out = tmp_path / "g.html"
        d3viz(f, str(out))
        html = out.read_text()
        assert "subgraph" in html and "back" in html
