#!/usr/bin/env python
"""Mixing-laboratory driver (host/src/mixlab.h): replay candidate
probability models against the production baseline on corpus files.

Usage: python tools/mixlab.py VARIANT [files...]   (default: data/bench_*)
  variant 0: baseline only  (V0 == production model v4)
  variant 9: round-1 linear mix (historical)
  1-7: see mixlab.h variant docs
"""

import ctypes
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from avrecode_tpu.host import native  # noqa: E402


def run(data, variant, lr=0.02, w_est=3.0, w_cab=3.0, sse_rate=5.0):
    lib = native._load()
    lib.avtpu_mixlab.restype = ctypes.c_int
    lib.avtpu_mixlab.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    p = (ctypes.c_double * 5)(variant, lr, w_est, w_cab, sse_rate)
    o = (ctypes.c_double * 5)()
    if lib.avtpu_mixlab(bytes(data), len(data), p, o):
        raise RuntimeError("mixlab failed")
    return {"bits_base": o[0], "bits_mix": o[1], "bins": int(o[2]),
            "slices_ok": int(o[3]), "slices_failed": int(o[4])}


def main(argv):
    variant = int(argv[0]) if argv else 0
    files = argv[1:] or sorted(glob.glob("data/bench_*.mp4"))
    tb = tm = 0.0
    for f in files:
        data = open(f, "rb").read()
        r = run(data, variant)
        tb += r["bits_base"]
        tm += r["bits_mix"]
        extra = (f"  mix {r['bits_mix'] / 8:9.0f}B "
                 f"({100 * (r['bits_base'] - r['bits_mix']) / r['bits_base']:+.2f}%)"
                 if variant else "")
        print(f"{os.path.basename(f):28} base {r['bits_base'] / 8:9.0f}B"
              f"{extra}")
    if variant and tb:
        print(f"{'TOTAL':28} base {tb / 8:9.0f}B  mix {tm / 8:9.0f}B "
              f"({100 * (tb - tm) / tb:+.2f}%)")


if __name__ == "__main__":
    main(sys.argv[1:])
