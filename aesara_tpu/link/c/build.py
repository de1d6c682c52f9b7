"""Runtime C++ module compilation + caching.

TPU-native analogue of the reference's ``link/c/cmodule.py``
(DynamicModule:155, ModuleCache:618, GCC_compiler:2047) and
``compilelock.py:48``: compile a C++ source into ``config.compiledir``
keyed by a content hash, under an inter-process lock, and dlopen it.
The per-op codegen of the reference is gone (XLA owns device codegen);
this builds the host-side runtime pieces (the CVM executor).
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sys
import sysconfig
import time
from contextlib import contextmanager
from typing import Optional

from aesara_tpu.config import config


@contextmanager
def lock_ctx(lock_dir: str, timeout: float = 120.0):
    """Inter-process compile lock (reference ``compilelock.py:48``)."""
    os.makedirs(os.path.dirname(lock_dir), exist_ok=True)
    t0 = time.time()
    while True:
        try:
            os.mkdir(lock_dir)
            break
        except FileExistsError:
            # stale-lock recovery (reference force_unlock behavior)
            try:
                age = time.time() - os.path.getmtime(lock_dir)
                if age > timeout:
                    os.rmdir(lock_dir)
                    continue
            except OSError:
                pass
            if time.time() - t0 > timeout:
                raise TimeoutError(f"compile lock stuck: {lock_dir}")
            time.sleep(0.1)
    try:
        yield
    finally:
        try:
            os.rmdir(lock_dir)
        except OSError:
            pass


def module_hash(source: str, extra: str = "") -> str:
    """Content-addressed cache key (reference ``cmodule_key``
    ``link/c/basic.py:1208``): source + compiler + python ABI."""
    h = hashlib.sha256()
    h.update(source.encode())
    h.update(extra.encode())
    h.update(sys.version.encode())
    h.update(sysconfig.get_config_var("SOABI").encode())
    return h.hexdigest()[:24]


def compile_and_load(name: str, source_path: str, force: bool = False):
    """Compile ``source_path`` into the cache dir (if needed) and import
    it as a module."""
    with open(source_path) as f:
        source = f.read()
    key = module_hash(source)
    cache_dir = os.path.join(config.compiledir, f"cmodule_{name}_{key}")
    ext = sysconfig.get_config_var("EXT_SUFFIX")
    so_path = os.path.join(cache_dir, f"{name}{ext}")

    if force or not os.path.exists(so_path):
        with lock_ctx(os.path.join(config.compiledir, ".lock")):
            if force or not os.path.exists(so_path):
                os.makedirs(cache_dir, exist_ok=True)
                include = sysconfig.get_paths()["include"]
                cxx = os.environ.get("CXX", None) or config.cxx
                cmd = [
                    cxx, "-O2", "-shared", "-fPIC", "-std=c++17",
                    f"-I{include}", source_path, "-o", so_path + ".tmp",
                ]
                proc = subprocess.run(cmd, capture_output=True, text=True)
                if proc.returncode != 0:
                    raise RuntimeError(
                        f"C++ compilation failed:\n{proc.stderr[-4000:]}"
                    )
                os.replace(so_path + ".tmp", so_path)

    spec = importlib.util.spec_from_file_location(name, so_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_cvm_module = None
_cvm_failed = False


def get_cvm_module():
    """The compiled CVM extension, building on first use (the reference's
    lazylinker bootstrap, ``lazylinker_c.py:1-170``); None if no
    toolchain."""
    global _cvm_module, _cvm_failed
    if _cvm_module is None and not _cvm_failed:
        src = os.path.join(os.path.dirname(__file__), "c_code", "cvm.cpp")
        try:
            _cvm_module = compile_and_load("cvm", src)
        except Exception as e:  # no compiler: fall back to python VM
            import warnings

            warnings.warn(f"CVM build failed ({e}); using the python VM")
            _cvm_failed = True
    return _cvm_module
