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
    lib.avtpu_extract.restype = ctypes.c_size_t
    lib.avtpu_extract.argtypes = [
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


class NativeTrace:
    """Per-slice bin trace from the native extractor (device-stage input).
    Mirrors models/trace.py TraceModel's array surface."""

    __slots__ = ("slots", "bits", "pcabs", "limits")

    def __init__(self, slots, bits, pcabs, limits):
        self.slots = slots
        self.bits = bits
        self.pcabs = pcabs
        self.limits = limits

    def __len__(self):
        return len(self.bits)


def extract(data, scope="slice"):
    """Native host stage of the device pipeline: returns
    (sps_list, pps_list, blocks, traces) matching codec._scan_blocks
    output for the scope.  Slice scope: every slice block carries its
    NativeTrace; GOP scope: the first slice of each GOP carries the GOP
    trace, continuations carry b"" (the container's empty-blob marker)."""
    import numpy as np

    from ..utils.container import KIND_LITERAL, KIND_SLICE, Reader

    lib = _load()
    assert lib is not None
    scope_id = {"slice": 1, "gop": 2}[scope]
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.avtpu_extract(bytes(data), len(data), scope_id, ctypes.byref(out))
    if not out:
        raise ValueError("native extract failed")
    try:
        blob = ctypes.string_at(out, n)
    finally:
        lib.avtpu_free(out)

    r = Reader(blob)
    sps = [r.blob() for _ in range(r.varint())]
    pps = [r.blob() for _ in range(r.varint())]
    blocks = []
    traces = []
    for _ in range(r.varint()):
        kind = r.u8()
        if kind == KIND_LITERAL:
            blocks.append((KIND_LITERAL, r.blob()))
            continue
        nal_size = r.varint()
        head = r.blob()
        mb_count = r.varint()
        drop = r.varint()
        tail = r.blob()
        if not r.u8():  # gop continuation: no trace carried
            blocks.append((KIND_SLICE, nal_size, head, mb_count, drop, tail, b""))
            continue
        n_slots = r.varint()
        limits = np.frombuffer(blob, np.uint8, n_slots, r.pos).astype(np.int32)
        r.pos += n_slots
        n_bins = r.varint()
        slots = np.frombuffer(blob, np.int32, n_bins, r.pos)
        r.pos += 4 * n_bins
        bits = np.frombuffer(blob, np.uint8, n_bins, r.pos)
        r.pos += n_bins
        pcabs = np.frombuffer(blob, np.uint16, n_bins, r.pos)
        r.pos += 2 * n_bins
        t = NativeTrace(slots, bits, pcabs, limits)
        traces.append(t)
        blocks.append((KIND_SLICE, nal_size, head, mb_count, drop, tail, t))
    return sps, pps, blocks, traces


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
