"""Test configuration.

Forces jax onto the host CPU platform with 8 virtual devices so that
multi-chip sharding tests run anywhere (SURVEY §4: the reference's only
distributed test spawns mpiexec; our analogue is an
xla_force_host_platform_device_count mesh).  Also hardens error flags like
the reference's ``conftest.py:6-14``.
"""

import os

# must be set before jax initializes any backend
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import pytest  # noqa: E402

from aesara_tpu.config import config  # noqa: E402

config._set_unchecked("on_opt_error", "raise")
config._set_unchecked("on_shape_error", "raise")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False, help="run slow tests"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="need --runslow option to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: mark test as slow to run")
