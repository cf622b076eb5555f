"""ctypes binding for the native SU trace reader.

Builds ``native/su_reader.cpp`` on demand with g++ (cached .so next
to the source, same pattern as :mod:`data.native_loader`); callers
fall back to the pure-numpy parser in :mod:`data.prep` when no
compiler is available, so the framework never hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libsu_reader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "su_reader.cpp")
_build_lock = threading.Lock()
_lib = None
_lib_tried = False


def _build() -> str | None:
    with _build_lock:
        if os.path.exists(_SO_PATH) and (
                os.path.getmtime(_SO_PATH) >= os.path.getmtime(_SRC_PATH)):
            return _SO_PATH
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 "-o", _SO_PATH, _SRC_PATH],
                check=True, capture_output=True)
            return _SO_PATH
        except (OSError, subprocess.CalledProcessError):
            return None


def _get_lib():
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.su_probe.restype = ctypes.c_int
    lib.su_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int)]
    lib.su_read.restype = ctypes.c_int
    lib.su_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
    _lib = lib
    return lib


def native_available() -> bool:
    return _get_lib() is not None


def read_su_native(path: str):
    """([ntraces, ns] float32, dt_seconds) via the C++ parser, or
    None when the native library is unavailable; raises ValueError on
    malformed files (mirroring the numpy parser's contract)."""
    lib = _get_lib()
    if lib is None:
        return None
    ntr = ctypes.c_int64()
    ns = ctypes.c_int64()
    dt_us = ctypes.c_int64()
    big = ctypes.c_int()
    rc = lib.su_probe(path.encode(), ctypes.byref(ntr),
                      ctypes.byref(ns), ctypes.byref(dt_us),
                      ctypes.byref(big))
    if rc == -1:
        raise ValueError(f"{path}: unreadable / too short for SU")
    if rc != 0:
        raise ValueError(f"{path}: no byte order yields a whole "
                         "number of consistent SU traces")
    out = np.empty((ntr.value, ns.value), np.float32)
    rc = lib.su_read(path.encode(),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                     ntr.value, ns.value, big.value)
    if rc != 0:
        raise ValueError(f"{path}: SU read failed (rc={rc})")
    return out, dt_us.value * 1e-6
