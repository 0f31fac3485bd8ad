"""Native (C++) runtime components.

``dataload.cpp`` is compiled on first use with the toolchain baked into the
image (g++, libjpeg, libpng) and cached next to the source; no network, no
pip. ``load()`` returns the ctypes handle or raises with the compiler
output. Callers that want a soft fallback use ``available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataload.cpp")
_SO = os.path.join(_DIR, "_dataload.so")

_lib = None
_err: Exception | None = None


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
        _SRC, "-o", _SO + ".tmp", "-ljpeg", "-lpng",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"native dataload build failed:\n{proc.stderr[-2000:]}"
        )
    os.replace(_SO + ".tmp", _SO)
    return _SO


def load() -> ctypes.CDLL:
    """Build (if stale) and load the native library."""
    global _lib, _err
    if _lib is not None:
        return _lib
    if _err is not None:
        raise _err
    try:
        lib = ctypes.CDLL(_build())
    except Exception as e:  # compiler/toolchain missing
        _err = e
        raise
    lib.p2vit_load_batch.restype = ctypes.c_int
    lib.p2vit_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.p2vit_load_batch_u8.restype = ctypes.c_int
    lib.p2vit_load_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.p2vit_decode_resize.restype = ctypes.c_int
    lib.p2vit_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False
