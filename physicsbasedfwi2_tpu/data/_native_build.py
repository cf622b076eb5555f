"""Shared build-on-demand helper for the C++ native libraries.

Used by :mod:`data.native_loader` (threaded npy prefetch) and
:mod:`data.native_su` (SU trace reader).  Guarantees callers a
None-on-ANY-failure contract so their numpy fallbacks always engage:

- compiles to a temp file and atomically renames it, so a concurrent
  process never dlopens a half-written .so;
- wraps `ctypes.CDLL` itself (a stale/corrupt cached object returns
  None instead of raising);
- tolerates a missing source file (e.g. a partial install).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_build_lock = threading.Lock()


def load_native_lib(src_name: str, so_name: str,
                    extra_flags: tuple = ()):
    """Build (if stale) and dlopen native/<src_name> -> CDLL or None."""
    src = os.path.join(_NATIVE_DIR, src_name)
    so = os.path.join(_NATIVE_DIR, so_name)
    with _build_lock:
        try:
            fresh = (os.path.exists(so) and os.path.exists(src)
                     and os.path.getmtime(so) >= os.path.getmtime(src))
        except OSError:
            fresh = False
        if not fresh:
            if not os.path.exists(src):
                return None
            tmp = so + f".tmp{os.getpid()}"
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", tmp, src, *extra_flags],
                    check=True, capture_output=True)
                os.replace(tmp, so)  # atomic: readers see old or new
            except (OSError, subprocess.CalledProcessError):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                return None
        try:
            return ctypes.CDLL(so)
        except OSError:
            return None
