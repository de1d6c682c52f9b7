"""Sparse sandbox (reference ``aesara/sparse/sandbox/``)."""
