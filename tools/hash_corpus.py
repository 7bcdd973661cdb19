#!/usr/bin/env python3
"""Byte-identity guard for host-speed work: compress every corpus file with
the native library and print sha256 of each container.  Run before and after
an optimization; the hashes must not move."""
import hashlib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
from avrecode_tpu.host import native  # noqa: E402

FILES = [
    "mid.mp4", "bench_480p.mp4", "bench_720p_b.mp4", "bench_720p_ipp.mp4",
    "bench_1080p_ms.mp4", "rt_422.mp4", "rt_444.mp4", "rt_bpyr.mp4",
    "mbaff_b.mp4", "rt_ctr.ts", "rt_ctr.mkv", "pcm.264", "paff.264",
]

for name in FILES:
    p = os.path.join(ROOT, "data", name)
    if not os.path.exists(p):
        print(name, "MISSING")
        continue
    data = open(p, "rb").read()
    for scope, threads in ((2, 1), (1, 2)):
        comp = native.compress(data, scope=scope, threads=threads)
        rt = native.decompress(comp, threads=threads)
        ok = rt == data
        print(f"{name} scope={scope} t={threads} "
              f"{hashlib.sha256(comp).hexdigest()[:16]} rt={'OK' if ok else 'FAIL'}")
