"""ctypes bindings for the native I/O runtime (``native/spevio.cpp``).

Provides the C++ fast paths — WAV decode/encode, the dataset-prep
trim/normalize hot loop, and a threaded prefetching decoder — with graceful
fallback to the pure-Python implementations in `spev_tpu.utils.wavio` when
the shared library is unavailable.  The library auto-builds with g++ on
first use (`ensure_built`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libspevio.so")

_lib = None


class _WavData(ctypes.Structure):
    _fields_ = [
        ("samples", ctypes.POINTER(ctypes.c_float)),
        ("length", ctypes.c_int64),
        ("sample_rate", ctypes.c_int32),
    ]


def ensure_built(force: bool = False) -> bool:
    """Build libspevio.so with g++ if missing.  Returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    src = os.path.join(_NATIVE_DIR, "spevio.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-pthread", src, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        raise OSError("libspevio.so unavailable and could not be built")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.spev_read_wav.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavData)]
    lib.spev_read_wav.restype = ctypes.c_int
    lib.spev_write_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_int32,
    ]
    lib.spev_write_wav.restype = ctypes.c_int
    lib.spev_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.spev_trim_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.spev_trim_normalize.restype = ctypes.c_int
    lib.spev_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.spev_prefetcher_create.restype = ctypes.c_void_p
    lib.spev_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(_WavData)]
    lib.spev_prefetcher_next.restype = ctypes.c_int
    lib.spev_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def _take_ownership(lib, wd: _WavData) -> np.ndarray:
    arr = np.ctypeslib.as_array(wd.samples, shape=(wd.length,)).copy()
    lib.spev_free(wd.samples)
    return arr


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Native WAV decode → (mono float32, sample_rate); falls back to the
    pure-Python reader on error or when the library is unavailable."""
    try:
        lib = _load()
        wd = _WavData()
        if lib.spev_read_wav(path.encode(), ctypes.byref(wd)) == 0:
            return _take_ownership(lib, wd), int(wd.sample_rate)
    except OSError:
        pass
    from spev_tpu.utils.wavio import read_wav as py_read

    return py_read(path)


def write_wav(path: str, data: np.ndarray, sr: int = 22050) -> None:
    data = np.ascontiguousarray(np.asarray(data, np.float32))
    try:
        lib = _load()
        rc = lib.spev_write_wav(
            path.encode(),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(data),
            sr,
        )
        if rc == 0:
            return
    except OSError:
        pass
    from spev_tpu.utils.wavio import write_wav as py_write

    py_write(path, data, sr)


def trim_normalize(
    y: np.ndarray, top_db: float = 25.0, normalize: bool = True
) -> np.ndarray:
    """Native silence trim + peak normalize (dataset-prep hot loop)."""
    y = np.ascontiguousarray(np.asarray(y, np.float32)).copy()
    lib = _load()
    start = ctypes.c_int64()
    end = ctypes.c_int64()
    lib.spev_trim_normalize(
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(y),
        top_db,
        1 if normalize else 0,
        ctypes.byref(start),
        ctypes.byref(end),
    )
    return y[start.value : end.value]


class PrefetchingReader:
    """Threaded native decoder: a C++ worker reads+decodes ahead into a
    bounded ring buffer (replaces the reference's DataLoader workers for
    dataset preprocessing)."""

    def __init__(self, paths: Sequence[str], capacity: int = 8):
        self._lib = _load()
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = self._lib.spev_prefetcher_create(arr, len(self._paths), capacity)
        self._n = len(paths)

    def __iter__(self) -> Iterator[Tuple[int, Optional[np.ndarray], int]]:
        for _ in range(self._n):
            wd = _WavData()
            idx = self._lib.spev_prefetcher_next(self._handle, ctypes.byref(wd))
            if idx < 0:
                return
            if wd.length == 0 or not wd.samples:
                yield idx, None, 0
            else:
                yield idx, _take_ownership(self._lib, wd), int(wd.sample_rate)

    def close(self) -> None:
        if self._handle:
            self._lib.spev_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
