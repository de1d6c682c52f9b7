"""Reference import-path alias: ``sandbox/fourier.py`` — the DFT ops
live in ``tensor/fft.py`` here (device FFT via jnp.fft)."""
from aesara_tpu.tensor.fft import irfft, rfft  # noqa: F401
