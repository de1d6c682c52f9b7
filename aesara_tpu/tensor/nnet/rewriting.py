"""nnet rewrite registration point (reference ``tensor/nnet/rewriting.py``).

The reference's pack selects C/GEMM conv implementations for
AbstractConv (corr.py CorrMM & friends) — implementation selection that
XLA's conv_general_dilated subsumes entirely on TPU.  The remaining
user-visible rules (sigmoid specializations, conv shape folding) live
in the main packs; this module is the registration point kept for
import parity and future nnet-specific rules.
"""

__all__ = []
