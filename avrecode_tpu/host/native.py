"""ctypes binding for the C++ host library (libavtpu.so).

The native library is the production host path: the same self-verifying
compress/decompress as codec.py, byte-compatible (differential-tested), at
native speed.  Falls back to None when the library isn't built — callers
degrade to the Python implementation.

Build: make -C avrecode_tpu/host  (or `make native` at the repo root).
"""

import ctypes
import os

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libavtpu.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.avtpu_compress_mt.restype = ctypes.c_size_t
    lib.avtpu_compress_mt.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.avtpu_decompress_mt.restype = ctypes.c_size_t
    lib.avtpu_decompress_mt.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.avtpu_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return _LIB


def available():
    return _load() is not None


def compress(data, scope="stream", threads=1):
    """threads: 1=serial, 0=auto (parallel GOPs, gop scope only)."""
    lib = _load()
    assert lib is not None
    scope_id = {"stream": 0, "slice": 1, "gop": 2}.get(scope, scope)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.avtpu_compress_mt(
        bytes(data), len(data), scope_id, threads, ctypes.byref(out)
    )
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.avtpu_free(out)


def decompress(blob, threads=1):
    lib = _load()
    assert lib is not None
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.avtpu_decompress_mt(bytes(blob), len(blob), threads, ctypes.byref(out))
    if not out:
        raise ValueError("native decompress failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.avtpu_free(out)
