#!/usr/bin/env python
"""Ratio-parity table: reference-model replay vs this framework.

Replays the reference recoder's probability model (estimator dynamics,
context keying, out-of-band nnz serialization, EOB elision — see
host/src/refscore.h for the recode.cpp line map) over each corpus file's
CABAC bin stream and charges idealized -log2(p) cost, then compares with
our actual container size.  The replay deliberately favors the reference
(no quantization/carry loss, no protobuf framing, 1-byte flush/slice), so
"ours <= ref" here is a conservative win.

Usage: python tools/refscore.py [dir-or-files...]   (default: data/bench_*)
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from avrecode_tpu.host import native  # noqa: E402


def main(argv):
    paths = []
    for a in argv or sorted(glob.glob("data/bench_*.mp4")):
        if os.path.isdir(a):
            paths += sorted(
                os.path.join(a, f) for f in os.listdir(a)
                if f.endswith((".mp4", ".h264", ".264"))
            )
        else:
            paths.append(a)
    print(f"{'file':28} {'size':>9} {'ours':>9} {'ref':>9} "
          f"{'ours%':>7} {'ref%':>7} {'edge':>7}")
    tot = [0, 0, 0]
    for p in paths:
        data = open(p, "rb").read()
        d = native.refscore(data)
        ours = len(native.compress(data, scope="gop"))
        # for CAVLC files the replay scores nothing (the reference recodes
        # only CABAC): ref_file_bytes == len(data) == literal passthrough
        ref = d["ref_file_bytes"]
        if d["slices_failed"]:
            print(f"{os.path.basename(p):28} SKIP ({d['slices_failed']} "
                  f"failed slices — literal fallback on our side too)")
            continue
        tot[0] += len(data)
        tot[1] += ours
        tot[2] += ref
        print(f"{os.path.basename(p):28} {len(data):9} {ours:9} "
              f"{ref:9.0f} {100*ours/len(data):6.2f}% "
              f"{100*ref/len(data):6.2f}% "
              f"{100*(ref-ours)/len(data):+6.2f}%")
    if tot[0]:
        print(f"{'TOTAL':28} {tot[0]:9} {tot[1]:9} {tot[2]:9.0f} "
              f"{100*tot[1]/tot[0]:6.2f}% {100*tot[2]/tot[0]:6.2f}% "
              f"{100*(tot[2]-tot[1])/tot[0]:+6.2f}%")


if __name__ == "__main__":
    main(sys.argv[1:])
