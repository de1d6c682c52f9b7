"""Compile-directory locking (reference ``compile/compilelock.py``).

The real lock lives in ``link/c/build.py`` (content-hash cache with a
lock file); this module exposes the reference's public API over it.
"""

import os
from contextlib import contextmanager

from aesara_tpu.config import config
from aesara_tpu.link.c.build import lock_ctx as _lock_ctx

__all__ = ["lock_ctx", "force_unlock"]


@contextmanager
def lock_ctx(lock_dir=None, *, timeout=None):
    """Hold the compilation lock for ``lock_dir`` (default: the
    configured compiledir) within this block (reference ``lock_ctx``)."""
    if lock_dir is None:
        lock_dir = os.path.join(config.compiledir, ".lock")
    kwargs = {} if timeout is None else {"timeout": timeout}
    with _lock_ctx(str(lock_dir), **kwargs):
        yield


def force_unlock(lock_dir=None):
    """Remove a stale lock left by a crashed process (reference
    ``force_unlock``)."""
    if lock_dir is None:
        lock_dir = os.path.join(config.compiledir, ".lock")
    try:
        os.rmdir(str(lock_dir))
    except FileNotFoundError:
        pass
    except NotADirectoryError:
        try:
            os.unlink(str(lock_dir))
        except FileNotFoundError:
            pass
