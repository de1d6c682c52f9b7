"""Compiled-module cache directory management (reference
``aesara/compile/compiledir.py``: cleanup:21,
print_compiledir_content:104)."""

from __future__ import annotations

import os
import shutil

from aesara_tpu.config import config


def cleanup() -> None:
    """Delete stale/invalid cache entries (reference ``:21``)."""
    d = config.compiledir
    if not os.path.isdir(d):
        return
    for entry in os.listdir(d):
        path = os.path.join(d, entry)
        # drop incomplete builds (leftover .tmp artifacts)
        if entry.endswith(".tmp"):
            try:
                os.unlink(path)
            except OSError:
                pass


def print_compiledir_content() -> None:
    """(reference ``:104``)"""
    d = config.compiledir
    print(f"compiledir: {d}")
    if not os.path.isdir(d):
        print("  (empty)")
        return
    total = 0
    for entry in sorted(os.listdir(d)):
        path = os.path.join(d, entry)
        size = 0
        if os.path.isdir(path):
            for root, _, files in os.walk(path):
                size += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        else:
            size = os.path.getsize(path)
        total += size
        print(f"  {entry}: {size / 1e6:.2f} MB")
    print(f"  total: {total / 1e6:.2f} MB")


def basecompiledir_ls() -> None:
    print_compiledir_content()


def compiledir_purge() -> None:
    d = config.compiledir
    if os.path.isdir(d):
        shutil.rmtree(d)
