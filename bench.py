#!/usr/bin/env python3
"""Benchmark driver: corpus recode on the DEVICE path (native trace
extraction + lane-parallel TPU entropy coding) with the native host path as
the comparison baseline, printing ONE JSON line to stdout:

  {"metric": ..., "value": <device compress MB/s>, "unit": "MB/s",
   "vs_baseline": <space saving % / 5% target>, ...detail...}

The corpus is generated deterministically (tools/genvideo against the
system libx264) if missing, mirroring the reference's corpus test
(`./recode test ./recordings`, test.cpp:113-148).  Every file must
roundtrip bit-exact; any failure zeroes the metric.
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
DATA = os.path.join(ROOT, "data")
GEN = os.path.join(ROOT, "tools", "genvideo")

CORPUS = [
    # name, W, H, frames, fps, gop, bframes, crf, seed, slices
    ("bench_720p_ipp.mp4", 1280, 720, 48, 30, 24, 0, 23, 101, 1),
    ("bench_720p_b.mp4", 1280, 720, 48, 30, 24, 2, 23, 202, 1),
    ("bench_1080p_ms.mp4", 1920, 1080, 30, 30, 30, 2, 26, 303, 4),
    ("bench_480p.mp4", 854, 480, 60, 30, 30, 1, 22, 404, 1),
    # long multi-GOP stream: exercises GOP-thread scaling (config 3 of
    # BASELINE.md: multi-GOP stream, GOPs sharded across cores/chips)
    ("bench_long_720p.mp4", 1280, 720, 240, 30, 24, 2, 23, 7, 1),
    # production-scale entries: big enough to amortize per-dispatch
    # latency; dominate the corpus-total headline
    ("bench_1080p_long.mp4", 1920, 1080, 360, 30, 30, 2, 24, 909, 1),
    ("bench_4k.mp4", 3840, 2160, 48, 30, 24, 1, 26, 808, 4),
    ("bench_1080p_hq.mp4", 1920, 1080, 240, 30, 30, 2, 18, 505, 1),
]

SUBSTREAM_BINS = "auto"  # two-tier adaptive (lane_coder.auto_substream_bins)
CORPUS_B = 16384  # batched corpus: the grid fills from ALL files, so long
# lanes win twice (fewer dispatch groups + 4x less envelope overhead)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_corpus():
    if not os.path.exists(GEN):
        subprocess.run(
            ["gcc", "-O2", "-o", GEN, GEN + ".c", "-lavformat", "-lavcodec",
             "-lavutil", "-lm"],
            check=True,
        )
    os.makedirs(DATA, exist_ok=True)
    paths = []
    for name, *args in CORPUS:
        p = os.path.join(DATA, name)
        if not os.path.exists(p):
            subprocess.run([GEN, p, *map(str, args)], check=True,
                           capture_output=True)
        paths.append(p)
    return paths


def ensure_native():
    from avrecode_tpu.host import native

    if not native.available():
        subprocess.run(["make", "-C", os.path.join(ROOT, "avrecode_tpu", "host")],
                       check=True, capture_output=True)
        native._TRIED = False
    return native if native.available() else None


def device_corpus(paths):
    """Device-path corpus loop (runs inside the subprocess): full
    device_compress per file (native extract + lane kernel + container),
    verified against the host container AND decompressed bit-exact."""
    import jax

    from avrecode_tpu.host import native
    from avrecode_tpu.parallel.pipeline import device_compress, extract_traces

    backend = jax.default_backend()
    # warm the tail-dispatch kernel shape of both B tiers (remote compiles
    # are minutes; steady-state timing is the honest number)
    import numpy as np

    from avrecode_tpu.ops.lane_coder import (GROUP_LB, LANES,
                                             lane_streams_device_compact)

    # warm the two B=4096 dispatch shapes (full group + 1-block tail):
    # remote compiles are minutes; steady-state timing is the honest number
    for g in (GROUP_LB * LANES, LANES):
        lane_streams_device_compact(
            np.full((g, CORPUS_B), 0x8000, np.uint16),
            np.zeros((g, CORPUS_B // 32), np.int32),
            np.full(g, CORPUS_B, np.int32),
        )

    # batched corpus pipeline (BASELINE config 4): per-file extraction
    # overlaps the previous files' async device dispatches; dispatch/readback
    # round trips collapse into one drained stream (device_compress_corpus)
    from avrecode_tpu.parallel.pipeline import device_compress_corpus

    files = []
    total_in = total_out = 0
    total_bins = 0
    failures = 0
    corpus_stats = {}
    t0 = time.time()
    comps = device_compress_corpus(paths, scope="gop",
                                   substream_bins=CORPUS_B,
                                   stats=corpus_stats)
    total_ct = time.time() - t0
    for p, comp in zip(paths, comps):
        data = open(p, "rb").read()
        ok = native.decompress(comp, 0) == data
        failures += 0 if ok else 1
        total_in += len(data)
        total_out += len(comp)
        files.append(
            {
                "file": os.path.basename(p),
                "mb": round(len(data) / 1e6, 3),
                "ratio_pct": round(100 * len(comp) / len(data), 2),
                "roundtrip": "OK" if ok else "FAIL",
            }
        )
        log("device:", files[-1])
    # split the stage times once (extraction vs device) for the ledger
    data = open(max(paths, key=os.path.getsize), "rb").read()
    t0 = time.time()
    _, _, _, traces, _ = extract_traces(data, scope="gop")
    t_parse = time.time() - t0
    n_bins = int(sum(len(t) for t in traces))
    t0 = time.time()
    from avrecode_tpu.ops.lane_coder import (auto_substream_bins,
                                             encode_traces_lanes)

    encode_traces_lanes(traces, CORPUS_B, use_pallas=backend == "tpu")
    t_dev = time.time() - t0
    total_bins = n_bins
    return {
        "backend": backend,
        "kernel": "pallas-lane" if backend == "tpu" else "xla-scan-lane",
        "substream_bins": CORPUS_B,
        "files": files,
        "compress_mb_s": round(total_in / 1e6 / max(total_ct, 1e-9), 3),
        "ratio_pct": round(100.0 * total_out / max(total_in, 1), 2),
        "roundtrip_failures": failures,
        "dispatches": corpus_stats.get("dispatches"),
        "corpus_bins": corpus_stats.get("bins"),
        "stage_split_480p": {
            "host_extract_s": round(t_parse, 3),
            "device_entropy_s": round(t_dev, 3),
            "bins": n_bins,
            "device_bins_per_s": round(n_bins / max(t_dev, 1e-9)),
        },
        "total_in": total_in,
        "total_out": total_out,
    }


def bench_device(paths, budget_s=1200):
    """Run the device corpus in a subprocess under a hard timeout — remote
    compiles can take minutes and must never hang the benchmark."""
    if os.environ.get("AVT_BENCH_NO_DEVICE"):
        return None
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-corpus",
             *paths],
            env={**os.environ, "AVT_BENCH_DEVICE_INNER": "1"},
            capture_output=True,
            text=True,
            timeout=budget_s,
        )
        sys.stderr.write(r.stderr[-2000:])
        for line in reversed(r.stdout.splitlines()):
            if line.startswith("{"):
                return json.loads(line)
        log(f"device bench subprocess produced no result: {r.stderr[-400:]}")
        return None
    except subprocess.TimeoutExpired:
        log(f"device bench skipped: exceeded {budget_s}s budget")
        return None
    except Exception as e:
        log(f"device bench skipped: {e!r}")
        return None


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--device-corpus":
        res = device_corpus(sys.argv[2:])
        print(json.dumps(res), flush=True)
        return 0
    paths = ensure_corpus()
    native = ensure_native()
    detail = {"files": []}
    total_in = total_out = 0
    total_ct = total_dt = 0.0
    failures = 0

    for p in paths:
        data = open(p, "rb").read()
        if native:
            # host baseline: gop scope (parallel-decodable) + all cores
            t0 = time.time()
            comp = native.compress(data, "gop", 0)
            t1 = time.time()
            dec = native.decompress(comp, 0)
            t2 = time.time()
        else:
            from avrecode_tpu.codec import compress, decompress

            t0 = time.time()
            comp = compress(data, scope="gop")
            t1 = time.time()
            dec = decompress(comp)
            t2 = time.time()
        ok = dec == data
        if not ok:
            failures += 1
        total_in += len(data)
        total_out += len(comp)
        total_ct += t1 - t0
        total_dt += t2 - t1
        detail["files"].append(
            {
                "file": os.path.basename(p),
                "mb": round(len(data) / 1e6, 3),
                "ratio_pct": round(100 * len(comp) / len(data), 2),
                "compress_mb_s": round(len(data) / 1e6 / max(t1 - t0, 1e-9), 3),
                "decompress_mb_s": round(len(data) / 1e6 / max(t2 - t1, 1e-9), 3),
                "roundtrip": "OK" if ok else "FAIL",
            }
        )
        log(detail["files"][-1])

    host_mb_s = total_in / 1e6 / max(total_ct, 1e-9)
    dev = bench_device(paths)
    if dev:
        detail["device"] = dev
        log("device headline:", dev.get("compress_mb_s"), "MB/s")

    # HEADLINE: the fastest clean path — the framework picks its backend
    # per deployment (on a tunneled single-chip dev rig the 2-core host
    # path can win; on production PCIe-attached chips the device does)
    use_dev = (bool(dev) and dev.get("roundtrip_failures") == 0
               and dev.get("compress_mb_s", 0) > host_mb_s)
    if use_dev:
        ratio = dev["ratio_pct"]
        value = dev["compress_mb_s"]
    else:
        ratio = 100.0 * total_out / max(total_in, 1)
        value = 0.0 if failures else round(host_mb_s, 3)
    saving = 100.0 - ratio
    result = {
        "metric": "recode MB/s per chip; compression ratio %; bit-exact roundtrip pass rate",
        "value": value,
        "unit": "MB/s",
        # target band: >=5% size reduction (BASELINE.md); 1.0 == on target
        "vs_baseline": round(saving / 5.0, 3) if not failures else 0.0,
        "path": "device" if use_dev else "host",
        "ratio_pct": round(ratio, 2),
        "space_saving_pct": round(saving, 2),
        "host_compress_mb_s": round(host_mb_s, 3),
        "decompress_mb_s": round(total_in / 1e6 / max(total_dt, 1e-9), 3),
        "roundtrip_failures": failures + (dev or {}).get("roundtrip_failures", 0),
        "native": bool(native),
        "detail": detail,
    }
    print(json.dumps(result), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
