#!/usr/bin/env python3
"""Benchmark driver: corpus roundtrip on the native host path + device
entropy stage, printing ONE JSON line to stdout:

  {"metric": ..., "value": <compress MB/s>, "unit": "MB/s",
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
]


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


def bench_device(path, budget_s=300):
    """Device entropy-stage throughput (bins/s): Pallas kernel on TPU,
    XLA scans elsewhere.  Runs in a subprocess under a hard timeout —
    remote compiles can take minutes and must never hang the benchmark."""
    if os.environ.get("AVT_BENCH_NO_DEVICE"):
        return None
    if not os.environ.get("AVT_BENCH_DEVICE_INNER"):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--device-only", path],
                env={**os.environ, "AVT_BENCH_DEVICE_INNER": "1"},
                capture_output=True,
                text=True,
                timeout=budget_s,
            )
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
    try:
        import jax

        from avrecode_tpu.parallel.pipeline import extract_traces, pack_traces

        data = open(path, "rb").read()
        t0 = time.time()
        _, _, _, traces, _ = extract_traces(data)
        t_parse = time.time() - t0
        packed = pack_traces(traces, pad_multiple=4)
        if packed is None:
            return None
        n_bins = int(sum(len(t) for t in traces))
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu:
            from avrecode_tpu.ops.pallas_coder import encode_slices_pallas as run
        else:
            from avrecode_tpu.ops.estimator_jax import encode_slices

            def run(*a):
                out, lens = encode_slices(*a)
                out.block_until_ready()
                return out

        run(*packed)  # compile + warm
        t0 = time.time()
        run(*packed)
        dt = time.time() - t0
        return {
            "device_kernel": "pallas" if on_tpu else "xla-scan",
            "device_bins_per_s": n_bins / max(dt, 1e-9),
            "device_stage_s": dt,
            "host_parse_s": t_parse,
            "n_bins": n_bins,
        }
    except Exception as e:  # device bench is best-effort
        log(f"device bench skipped: {e!r}")
        return None


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--device-only":
        res = bench_device(sys.argv[2])
        print(json.dumps(res) if res else "{}", flush=True)
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
            # headline path: gop scope (parallel-decodable) + all cores
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

    dev = bench_device(paths[3])  # 480p: moderate trace sizes bound compile time
    if dev:
        detail["device"] = {k: round(v, 2) if isinstance(v, float) else v
                            for k, v in dev.items()}
        log("device:", detail["device"])

    ratio = 100.0 * total_out / max(total_in, 1)
    saving = 100.0 - ratio
    mb_s = total_in / 1e6 / max(total_ct, 1e-9)
    value = 0.0 if failures else round(mb_s, 3)
    result = {
        "metric": "recode MB/s per chip; compression ratio %; bit-exact roundtrip pass rate",
        "value": value,
        "unit": "MB/s",
        # target band: >=5% size reduction (BASELINE.md); 1.0 == on target
        "vs_baseline": round(saving / 5.0, 3) if not failures else 0.0,
        "ratio_pct": round(ratio, 2),
        "space_saving_pct": round(saving, 2),
        "decompress_mb_s": round(total_in / 1e6 / max(total_dt, 1e-9), 3),
        "roundtrip_failures": failures,
        "native": bool(native),
        "detail": detail,
    }
    print(json.dumps(result), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
