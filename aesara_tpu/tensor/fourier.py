"""Legacy fourier module (reference ``aesara/tensor/fourier.py``) — the
maintained implementation is ``aesara_tpu.tensor.fft``."""

from aesara_tpu.tensor.fft import IRFFTOp, RFFTOp, irfft, rfft  # noqa: F401
