"""Loader for the C++ native runtime library.

Compiles ``native/kanzi_native.cpp`` on first use with g++ -O3 and caches the
shared object next to the sources.  All native entry points are optional:
every caller has a pure-Python/NumPy fallback so the framework still works
(slowly) without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "kanzi_native.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "_build")
_SO = os.path.join(_BUILD_DIR, "libkanzi_native.so")


def _build() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", _SO + ".tmp", _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        # retry without -march=native (portability)
        try:
            cmd.remove("-march=native")
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            os.replace(_SO + ".tmp", _SO)
            return _SO
        except Exception:
            return None


def get_lib():
    """Return the loaded ctypes library, or None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("KANZI_TPU_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.kz_xxhash32.restype = ctypes.c_uint32
        lib.kz_xxhash32.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint32]
        lib.kz_xxhash64.restype = ctypes.c_uint64
        lib.kz_xxhash64.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint64]
        _LIB = lib
        return _LIB
