"""Coverage gap-fillers: fft (reference tests/tensor/test_fft.py),
xlogx, debugprint-of-scan (tests/scan/test_printing.py), d3viz render,
casting corners (tests/tensor/test_casting.py)."""

import numpy as np
import pytest

import aesara_tpu as atp
import aesara_tpu.tensor as at
from aesara_tpu.gradient import verify_grad


class TestFFT:
    def _unpack(self, packed):
        return packed[..., 0] + 1j * packed[..., 1]

    def test_rfft_matches_numpy(self):
        from aesara_tpu.tensor.fft import rfft

        x = at.matrix("x", dtype="float64")
        f = atp.function([x], rfft(x), mode="PY")
        xv = np.random.default_rng(0).normal(size=(4, 8)).astype("float32")
        got = self._unpack(np.asarray(f(xv), dtype="float64"))
        expect = np.fft.rfftn(xv, axes=(1,))
        assert np.allclose(got, expect, atol=1e-4)

    def test_irfft_roundtrip(self):
        from aesara_tpu.tensor.fft import irfft, rfft

        x = at.matrix("x", dtype="float64")
        rt = irfft(rfft(x))
        f = atp.function([x], rt, mode="PY")
        xv = np.random.default_rng(1).normal(size=(3, 8)).astype("float32")
        assert np.allclose(f(xv), xv, atol=1e-4)

    def test_rfft_jit_matches_py(self):
        from aesara_tpu.tensor.fft import rfft

        x = at.matrix("x", dtype="float64")
        fp = atp.function([x], rfft(x), mode="PY")
        fj = atp.function([x], rfft(x))
        xv = np.random.default_rng(2).normal(size=(2, 16)).astype("float32")
        assert np.allclose(np.asarray(fj(xv)), fp(xv), atol=1e-4)

    def test_rfft_grad(self):
        from aesara_tpu.tensor.fft import rfft

        rng = np.random.RandomState(3)
        verify_grad(lambda v: rfft(v).sum(), [rng.randn(2, 8)], rng=rng,
                    abs_tol=1e-4, rel_tol=1e-4)


class TestXlogx:
    def test_values_and_limit(self):
        from aesara_tpu.tensor.xlogx import xlogx, xlogy0

        x = at.vector("x", dtype="float64")
        f = atp.function([x], xlogx(x), mode="PY")
        xv = np.array([0.0, 1.0, 2.0], dtype="float64")
        got = f(xv)
        assert got[0] == 0.0  # 0*log(0) == 0 by convention
        assert np.allclose(got[1:], xv[1:] * np.log(xv[1:]))

        y = at.vector("y", dtype="float64")
        g = atp.function([x, y], xlogy0(x, y), mode="PY")
        assert g(np.array([0.0]), np.array([0.0]))[0] == 0.0

    def test_grad(self):
        from aesara_tpu.tensor.xlogx import xlogx

        rng = np.random.RandomState(4)
        verify_grad(lambda v: xlogx(v).sum(), [np.array([0.5, 2.0, 3.0])],
                    rng=rng)


class TestPrinting:
    def test_debugprint_scan_shows_inner_graph(self):
        import io

        from aesara_tpu.printing import debugprint
        from aesara_tpu.scan.basic import scan

        x0 = at.scalar("x0", dtype="float64")
        outs, _ = scan(lambda a: a * 2.0, outputs_info=[x0], n_steps=4)
        buf = io.StringIO()
        debugprint(outs, file=buf)
        text = buf.getvalue()
        assert "Scan" in text
        assert "mul" in text or "inner" in text  # inner body rendered

    def test_pydotprint_emits_dot(self, tmp_path):
        from aesara_tpu.printing import pydotprint

        x = at.vector("x", dtype="float64")
        f = atp.function([x], at.math.exp(x) * 2)
        path = tmp_path / "g.dot"
        pydotprint(f, outfile=str(path))
        content = path.read_text()
        assert "digraph" in content and "Elemwise" in content

    def test_d3viz_html(self, tmp_path):
        from aesara_tpu.d3viz import d3viz

        x = at.vector("x", dtype="float64")
        f = atp.function([x], at.math.tanh(x))
        out = tmp_path / "viz.html"
        d3viz(f, str(out))
        html = out.read_text()
        assert "<html" in html.lower() and "tanh" in html


class TestCasting:
    def test_cast_chain(self):
        x = at.vector("x", dtype="float64")
        f = atp.function([x], at.cast(at.cast(x, "int32"), "float32"),
                         mode="PY")
        assert np.allclose(f(np.array([1.7, -2.3])), [1.0, -2.0])

    def test_bool_roundtrip(self):
        x = at.vector("x", dtype="bool")
        f = atp.function([x], at.cast(x, "int8") + 1, mode="PY")
        assert np.array_equal(f(np.array([True, False])), [2, 1])

    def test_complex_cast(self):
        x = at.vector("x", dtype="float32")
        f = atp.function([x], at.cast(x, "complex64"), mode="PY")
        out = f(np.array([1.0, 2.0], dtype="float32"))
        assert out.dtype == np.complex64 and np.allclose(out, [1 + 0j, 2 + 0j])
