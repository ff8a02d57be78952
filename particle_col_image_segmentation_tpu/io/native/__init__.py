"""ctypes bindings for the native I/O library (pcis_io.cpp).

The shared library is built on first use with g++ (pybind11 is not available
in this image; the ctypes ABI keeps the boundary dependency-free).  Every
entry point degrades gracefully: ``available()`` is False when no compiler
exists, and unsupported TIFFs make the codec report 0 pages so callers fall
back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "pcis_io.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpcis_io.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


class TiffPageInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("bits_per_sample", ctypes.c_uint32),
        ("samples_per_pixel", ctypes.c_uint32),
    ]


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        try:
            # build to a private temp name, then atomic-rename into place:
            # concurrent processes (test workers, parallel CLIs) must never
            # CDLL a half-written .so
            tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", tmp, "-lz"],
                check=True, capture_output=True,
            )
            os.replace(tmp, _LIB_PATH)
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # stale/corrupt artifact — degrade to the PIL fallback, as the
        # module contract promises
        _build_failed = True
        return None
    lib.pcis_tiff_inspect.argtypes = [ctypes.c_char_p, ctypes.POINTER(TiffPageInfo)]
    lib.pcis_tiff_inspect.restype = ctypes.c_int
    lib.pcis_tiff_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.pcis_tiff_read.restype = ctypes.c_int
    lib.pcis_tiff_write.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_uint32,
    ]
    lib.pcis_tiff_write.restype = ctypes.c_int
    lib.pcis_prefetch_start.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
    ]
    lib.pcis_prefetch_start.restype = ctypes.c_void_p
    lib.pcis_prefetch_wait.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.pcis_prefetch_wait.restype = ctypes.c_uint64
    lib.pcis_prefetch_geom.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(TiffPageInfo),
    ]
    lib.pcis_prefetch_geom.restype = ctypes.c_int
    lib.pcis_prefetch_take.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.pcis_prefetch_take.restype = ctypes.c_int
    lib.pcis_prefetch_free.argtypes = [ctypes.c_void_p]
    lib.pcis_prefetch_free.restype = None
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_tiff(path: str) -> Optional[np.ndarray]:
    """[N,H,W] (or [H,W] single page) for supported TIFFs; None → fall back."""
    lib = get_lib()
    if lib is None:
        return None
    info = TiffPageInfo()
    pages = lib.pcis_tiff_inspect(path.encode(), ctypes.byref(info))
    if pages <= 0:
        return None
    dtype = np.uint8 if info.bits_per_sample == 8 else np.uint16
    out = np.empty((pages, info.height, info.width), dtype)
    rc = lib.pcis_tiff_read(path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes)
    if rc != 0:
        return None
    return out[0] if pages == 1 else out


def write_tiff(path: str, arr: np.ndarray) -> bool:
    """Write a single grayscale plane; False → caller should fall back."""
    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr)
    if arr.ndim != 2 or arr.dtype not in (np.dtype(np.uint8), np.dtype(np.uint16)):
        return False
    bps = 8 if arr.dtype == np.uint8 else 16
    rc = lib.pcis_tiff_write(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p),
        arr.shape[0], arr.shape[1], bps,
    )
    return rc == 0


class NativePrefetcher:
    """Threaded native decode pool over a fixed path list."""

    def __init__(self, paths: List[str], num_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native io unavailable")
        self._lib = lib
        self._paths = paths
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        self._handle = lib.pcis_prefetch_start(arr, len(paths), num_threads)

    def get(self, idx: int) -> Optional[np.ndarray]:
        # geometry is recorded by the decode workers themselves (one mmap
        # parse per file, inside the pool) — no up-front serial inspect pass
        # over the whole path list, and get() never re-reads the file
        if self._handle is None:
            # a NULL handle would segfault inside the C wait, not raise
            raise RuntimeError("NativePrefetcher used after close()")
        if not 0 <= idx < len(self._paths):
            raise IndexError(idx)
        size = self._lib.pcis_prefetch_wait(self._handle, idx)
        info = TiffPageInfo()
        pages = self._lib.pcis_prefetch_geom(self._handle, idx, ctypes.byref(info))
        if size == 0 or pages <= 0:
            return None
        dtype = np.uint8 if info.bits_per_sample == 8 else np.uint16
        out = np.empty((pages, info.height, info.width), dtype)
        if out.nbytes != size:
            return None
        rc = self._lib.pcis_prefetch_take(
            self._handle, idx, out.ctypes.data_as(ctypes.c_void_p), out.nbytes
        )
        if rc != 0:
            return None
        return out[0] if pages == 1 else out

    def close(self):
        if self._handle:
            self._lib.pcis_prefetch_free(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
