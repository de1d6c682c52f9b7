"""Serialization helpers (reference ``aesara/misc/pkl_utils.py``:
StripPickler:44, zip-format dump:203/load:263 with deduped ndarrays)."""

from __future__ import annotations

import io
import os
import pickle
import tempfile
import zipfile

import numpy as np


class StripPickler(pickle.Pickler):
    """Pickler dropping heavy/transient attributes (reference :44)."""

    def __init__(self, file, protocol=0, extra_tag_to_remove=None):
        super().__init__(file, protocol)
        self.tag_to_remove = ["trace", "test_value"] + list(extra_tag_to_remove or [])

    def save(self, obj, save_persistent_id=True):
        from aesara_tpu.utils import Scratchpad

        if isinstance(obj, Scratchpad):
            for tag in self.tag_to_remove:
                if hasattr(obj, tag):
                    delattr(obj, tag)
        return super().save(obj, save_persistent_id)


class PersistentNdarrayID:
    """Assigns zip-member names to ndarrays, deduplicating by id."""

    def __init__(self, zip_file):
        self.zip_file = zip_file
        self.count = 0
        self.seen = {}

    def __call__(self, obj):
        if isinstance(obj, np.ndarray):
            if id(obj) not in self.seen:
                name = f"array_{self.count}"
                self.count += 1
                buf = io.BytesIO()
                np.lib.format.write_array(buf, obj)
                self.zip_file.writestr(f"{name}.npy", buf.getvalue())
                self.seen[id(obj)] = f"ndarray.{name}"
            return self.seen[id(obj)]
        return None


class PersistentNdarrayLoad:
    def __init__(self, zip_file):
        self.zip_file = zip_file

    def __call__(self, persid):
        kind, name = persid.split(".", 1)
        assert kind == "ndarray"
        with self.zip_file.open(f"{name}.npy") as f:
            return np.lib.format.read_array(io.BytesIO(f.read()))


def dump(obj, file_handler, protocol=pickle.DEFAULT_PROTOCOL,
         persistent_id=PersistentNdarrayID):
    """Zip-format dump with ndarrays stored as .npy members (ref :203)."""
    with zipfile.ZipFile(file_handler, "w", zipfile.ZIP_STORED,
                         allowZip64=True) as zf:
        buf = io.BytesIO()
        p = pickle.Pickler(buf, protocol)
        p.persistent_id = persistent_id(zf)
        p.dump(obj)
        zf.writestr("pkl", buf.getvalue())


def load(f, persistent_load=PersistentNdarrayLoad):
    """(reference :263)"""
    with zipfile.ZipFile(f, "r") as zf:
        up = pickle.Unpickler(io.BytesIO(zf.read("pkl")))
        up.persistent_load = persistent_load(zf)
        return up.load()


import pickle as _pickle

#: reference exports
Pickler = _pickle.Pickler
min_recursion = 3000


class PersistentSharedVariableID(str):
    """Persistent-ID tag for shared-variable ndarrays in zipped dumps
    (reference ``pkl_utils.PersistentSharedVariableID``)."""


def zipadd(func, zipname, key):
    """Run ``func(tempfile)`` and add the result into a zip under ``key``
    (reference ``pkl_utils.zipadd``)."""
    import os
    import tempfile
    import zipfile

    with tempfile.NamedTemporaryFile(delete=False) as tmp:
        path = tmp.name
    try:
        with open(path, "wb") as fh:
            func(fh)
        with zipfile.ZipFile(zipname, "a") as zf:
            zf.write(path, key)
    finally:
        os.unlink(path)
