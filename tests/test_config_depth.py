"""Config-system depth wave (VERDICT r4 item 4; reference
``tests/test_config.py``, 318 LoC): typed-param validation, the
change_flags context/decorator forms incl. nesting and exception
unwinding, env-var parsing, immutability, and the printable dump.
"""

import os
import subprocess
import sys
import warnings

import numpy as np
import pytest

from aesara_tpu.config import (
    BoolParam,
    ConfigParam,
    EnumStr,
    FloatParam,
    IntParam,
    StrParam,
    change_flags,
    config,
)


class TestTypedParams:
    def test_enum_rejects_unknown_value(self):
        with pytest.raises((ValueError, TypeError)):
            config.floatX = "float128"

    def test_enum_accepts_all_declared(self):
        old = config.floatX
        try:
            for v in ("float64", "float32", "bfloat16", "float16"):
                config.floatX = v
                assert config.floatX == v
        finally:
            config.floatX = old

    def test_bool_param_parses_strings(self):
        p = BoolParam(False)
        assert p.validate("True") in (True, 1)
        assert p.validate("False") in (False, 0)
        assert p.validate(1) in (True, 1)

    def test_int_param_coerces(self):
        p = IntParam(3)
        assert p.validate("7") == 7
        with pytest.raises((ValueError, TypeError)):
            p.validate("seven")

    def test_float_param_coerces(self):
        p = FloatParam(0.5)
        assert p.validate("0.25") == 0.25

    def test_unknown_flag_read_raises_attribute_error(self):
        with pytest.raises(AttributeError):
            _ = config.definitely_not_a_flag

    def test_unknown_flag_write_raises(self):
        with pytest.raises(AttributeError):
            config.definitely_not_a_flag = 1

    def test_validation_happens_on_write(self):
        old = config.optimizer_verbose
        try:
            config.optimizer_verbose = "True"
            assert config.optimizer_verbose in (True, 1)
        finally:
            config.optimizer_verbose = old


class TestChangeFlags:
    def test_context_restores_on_exit(self):
        old = config.floatX
        with config.change_flags(floatX="float64"):
            assert config.floatX == "float64"
        assert config.floatX == old

    def test_restores_on_exception(self):
        old = config.floatX
        with pytest.raises(RuntimeError):
            with config.change_flags(floatX="float64"):
                raise RuntimeError("boom")
        assert config.floatX == old

    def test_nested_contexts(self):
        old = config.floatX
        with config.change_flags(floatX="float64"):
            with config.change_flags(floatX="bfloat16"):
                assert config.floatX == "bfloat16"
            assert config.floatX == "float64"
        assert config.floatX == old

    def test_unknown_flag_in_change_flags_raises(self):
        with pytest.raises(AttributeError):
            with config.change_flags(bogus_flag=1):
                pass

    def test_decorator_form(self):
        @change_flags(floatX="float64")
        def probe():
            return config.floatX

        old = config.floatX
        assert probe() == "float64"
        assert config.floatX == old

    def test_multiple_flags_atomically(self):
        old_f, old_v = config.floatX, config.optimizer_verbose
        with config.change_flags(floatX="float64", optimizer_verbose=True):
            assert config.floatX == "float64"
            assert config.optimizer_verbose in (True, 1)
        assert config.floatX == old_f
        assert config.optimizer_verbose == old_v

    def test_value_validated_inside_context(self):
        with pytest.raises((ValueError, TypeError)):
            with config.change_flags(floatX="not-a-dtype"):
                pass

    def test_floatx_drives_construction(self):
        import aesara_tpu.tensor as at

        with config.change_flags(floatX="float64"):
            assert at.matrix("m").type.dtype == "float64"
        with config.change_flags(floatX="float32"):
            assert at.matrix("m").type.dtype == "float32"


class TestConfigDump:
    def test_get_config_string_contains_flags(self):
        s = config.get_config_string(print_doc=False)
        assert "floatX" in s and "mode" in s

    def test_doc_lines_included_when_requested(self):
        s = config.get_config_string(print_doc=True)
        assert "#" in s

    def test_warn_unused_flags(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            config.warn_unused_flags({"tipo": "x"})
        assert any("tipo" in str(x.message) for x in w)


class TestEnvParsing:
    def test_flags_env_var_applies(self):
        """AESARA_TPU_FLAGS (and the reference's THEANO/AESARA spellings)
        set flags at import in a fresh interpreter."""
        code = (
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "from aesara_tpu.config import config\n"
            "print(config.floatX, config.optimizer_verbose)\n"
        )
        env = dict(os.environ)
        env["AESARA_TPU_FLAGS"] = "floatX=float64,optimizer_verbose=True"
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=240)
        assert out.returncode == 0, out.stderr
        assert "float64" in out.stdout and "True" in out.stdout

    def test_bad_env_flag_warns_not_crashes(self):
        code = (
            "import warnings\n"
            "import jax; jax.config.update('jax_platforms', 'cpu')\n"
            "with warnings.catch_warnings(record=True) as w:\n"
            "    warnings.simplefilter('always')\n"
            "    from aesara_tpu.config import config\n"
            "print('imported-ok')\n"
        )
        env = dict(os.environ)
        env["AESARA_TPU_FLAGS"] = "totally_bogus_flag=1"
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=240)
        assert out.returncode == 0, out.stderr
        assert "imported-ok" in out.stdout
