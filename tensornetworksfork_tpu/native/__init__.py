"""Native host-IO runtime (C++ via ctypes).

Builds and binds libtnf_io.so: fast idx-ubyte (MNIST-format) and numeric CSV
parsers for the host-side data path. Auto-compiles with g++ on first use and
degrades gracefully (callers fall back to the numpy paths) when no toolchain
is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtnf_io.so")
_lib = None
_tried = False


_SOURCES = ("tnf_io.cpp", "tnf_stream.cpp")


def _build() -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", *srcs, "-o", _LIB_PATH,
             "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    srcs = [os.path.join(_DIR, s) for s in _SOURCES]
    stale = (os.path.exists(_LIB_PATH)
             and any(os.path.exists(s)
                     and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
                     for s in srcs))
    if (not os.path.exists(_LIB_PATH) or stale) and not _build():
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not hasattr(lib, "tnf_stream_open_mem"):
        # stale single-source lib and no toolchain to rebuild: still serve
        # the IO entry points, stream callers fall back to numpy
        pass
    else:
        lib.tnf_stream_open_mem.restype = ctypes.c_long
        lib.tnf_stream_open_mem.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_ulong, ctypes.c_int]
        lib.tnf_stream_open_file.restype = ctypes.c_long
        lib.tnf_stream_open_file.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_ulong, ctypes.c_int]
        lib.tnf_stream_next.restype = ctypes.c_long
        lib.tnf_stream_next.argtypes = [
            ctypes.c_long, ctypes.c_void_p, ctypes.POINTER(ctypes.c_long)]
        lib.tnf_stream_close.restype = None
        lib.tnf_stream_close.argtypes = [ctypes.c_long]
    lib.tnf_read_idx.restype = ctypes.c_long
    lib.tnf_read_idx.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_int)]
    lib.tnf_parse_csv.restype = ctypes.c_long
    lib.tnf_parse_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    _lib = lib
    return _lib


def read_idx(path: str) -> Optional[np.ndarray]:
    """idx ubyte file -> uint8 ndarray, or None if the native lib is
    unavailable (caller falls back to the Python parser)."""
    lib = get_lib()
    if lib is None:
        return None
    shape = (ctypes.c_long * 4)()
    ndim = ctypes.c_int()
    total = lib.tnf_read_idx(path.encode(), None, 0, shape, ctypes.byref(ndim))
    if total < 0:
        return None
    out = np.empty(total, np.uint8)
    got = lib.tnf_read_idx(path.encode(),
                           out.ctypes.data_as(ctypes.c_void_p), total, shape,
                           ctypes.byref(ndim))
    if got != total:
        return None
    return out.reshape(tuple(shape[i] for i in range(ndim.value)))


def parse_csv(path: str, skip_header: bool = True
              ) -> Optional[Tuple[np.ndarray, int]]:
    """Numeric CSV -> (flat float32 array, ncols), or None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    capacity = max(os.path.getsize(path), 1024)  # floats <= bytes
    out = np.empty(capacity, np.float32)
    ncols = ctypes.c_int()
    rows = lib.tnf_parse_csv(path.encode(),
                             out.ctypes.data_as(ctypes.c_void_p), capacity,
                             ctypes.byref(ncols), 1 if skip_header else 0)
    if rows < 0 or ncols.value == 0:
        return None
    return out[: rows * ncols.value].reshape(rows, ncols.value), ncols.value
