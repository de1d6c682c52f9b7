"""Reference import-path alias: ``scalar/basic_scipy.py`` →
``scalar/math.py`` (erf/gamma/bessel special-function scalar ops)."""
from aesara_tpu.scalar.math import *  # noqa: F401,F403
