"""ctypes wrapper for the native threaded batch loader.

`NativeBatchLoader` streams shuffled fixed-record batches from a
memory-mapped binary file using the C++ worker pool
(native/batch_loader.cc); `write_record_file` serializes numpy arrays into
that format. Falls back transparently to a numpy implementation when the
shared library is unavailable (`native_available()` reports which path is
active). Build with `make -C equiadapt_tpu/native` (done lazily on first
use if g++ is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator

import numpy as np

__all__ = ["NativeBatchLoader", "write_record_file", "native_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libeqt_loader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.eqt_loader_create.restype = ctypes.c_void_p
    lib.eqt_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_ulonglong, ctypes.c_int,
    ]
    lib.eqt_loader_next.restype = ctypes.c_long
    lib.eqt_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.eqt_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def write_record_file(path: str, arrays: Dict[str, np.ndarray]) -> Dict:
    """Serialize aligned arrays (same leading dim) into one record file.

    Returns the spec dict needed to construct a NativeBatchLoader.
    """
    names = sorted(arrays)
    n = arrays[names[0]].shape[0]
    fields = []
    for k in names:
        a = np.ascontiguousarray(arrays[k])
        assert a.shape[0] == n, f"{k} leading dim mismatch"
        fields.append((k, a.dtype.str, a.shape[1:], a.reshape(n, -1)))
    record = np.concatenate(
        [f[3].view(np.uint8).reshape(n, -1) for f in fields], axis=1
    )
    record.tofile(path)
    return {
        "num_records": n,
        "record_bytes": record.shape[1],
        "fields": [(k, dt, shp, arr.shape[1] * np.dtype(dt).itemsize)
                   for k, dt, shp, arr in fields],
    }


class NativeBatchLoader:
    """Shuffled prefetching batch iterator over a record file."""

    def __init__(
        self,
        path: str,
        spec: Dict,
        batch_size: int,
        num_threads: int = 2,
        prefetch_depth: int = 4,
        seed: int = 0,
        shuffle: bool = True,
    ):
        self.spec = spec
        self.batch_size = batch_size
        self._handle = None
        self._lib = _load_lib()
        self._buf = np.empty(batch_size * spec["record_bytes"], np.uint8)
        if self._lib is not None:
            self._handle = self._lib.eqt_loader_create(
                path.encode(), spec["record_bytes"], spec["num_records"],
                batch_size, num_threads, prefetch_depth, seed, int(shuffle),
            )
        if self._handle is None:
            # numpy fallback: mmap + per-epoch permutation
            self._mm = np.memmap(path, np.uint8, "r").reshape(
                spec["num_records"], spec["record_bytes"]
            )
            self._rng = np.random.default_rng(seed)
            self._order = None
            self._pos = 0
            self._shuffle = shuffle

    def next(self) -> Dict[str, np.ndarray]:
        if self._handle is not None:
            rc = self._lib.eqt_loader_next(
                self._handle, self._buf.ctypes.data_as(ctypes.c_void_p)
            )
            if rc < 0:
                raise RuntimeError("native loader stopped")
            raw = self._buf
        else:
            n = self.spec["num_records"]
            per = n // self.batch_size
            if self._order is None or self._pos >= per:
                self._order = (
                    self._rng.permutation(n) if self._shuffle else np.arange(n)
                )
                self._pos = 0
            idx = self._order[
                self._pos * self.batch_size : (self._pos + 1) * self.batch_size
            ]
            self._pos += 1
            raw = np.ascontiguousarray(self._mm[idx]).reshape(-1)
        return self._split(raw)

    def _split(self, raw: np.ndarray) -> Dict[str, np.ndarray]:
        out = {}
        rec = raw.reshape(self.batch_size, self.spec["record_bytes"])
        off = 0
        for name, dt, shp, nbytes in self.spec["fields"]:
            # copy=True: a single-field record slice is already contiguous,
            # so ascontiguousarray would alias the shared reuse buffer
            # self._buf and the array would be overwritten by the next
            # next() call
            field = np.array(rec[:, off : off + nbytes], copy=True)
            out[name] = field.view(np.dtype(dt)).reshape(
                (self.batch_size,) + tuple(shp)
            )
            off += nbytes
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield self.next()

    def close(self) -> None:
        if self._handle is not None and self._lib is not None:
            self._lib.eqt_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
