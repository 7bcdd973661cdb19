#!/usr/bin/env python
"""Real-TPU byte-identity verification, recorded as an artifact.

Runs the device compress paths on the REAL chip (run without the test env
vars; tests force JAX_PLATFORMS=cpu) and byte-compares against the host,
then writes TPU_VERIFY.json so on-chip byte-identity is a pinned,
reproducible record rather than bench-time prose.

Usage: python tools/tpu_verify.py [clip.mp4]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)


def main(argv):
    import jax

    from avrecode_tpu import codec
    from avrecode_tpu.host import native
    from avrecode_tpu.parallel.pipeline import device_compress

    clip = argv[0] if argv else os.path.join(ROOT, "data", "mid.mp4")
    if not os.path.exists(clip):
        subprocess.run(
            [os.path.join(ROOT, "tools", "genvideo"), clip,
             "640", "480", "120", "30", "24", "1", "26", "7", "1"],
            check=True, capture_output=True,
        )
    small = os.path.join(ROOT, "data", "rt_gop.mp4")
    if not os.path.exists(small):
        subprocess.run(
            [os.path.join(ROOT, "tools", "genvideo"), small,
             "192", "160", "12", "30", "4", "1", "26", "9", "1"],
            check=True, capture_output=True,
        )
    data = open(clip, "rb").read()
    sdata = open(small, "rb").read()
    out = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "clip": os.path.basename(clip),
        "clip_bytes": len(data),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "checks": {},
    }

    def check(name, fn):
        t0 = time.time()
        try:
            ok = bool(fn())
        except Exception as e:  # record, don't hide
            out["checks"][name] = {"ok": False, "error": repr(e)[:200]}
            return
        out["checks"][name] = {"ok": ok, "s": round(time.time() - t0, 2)}

    host_gop = native.compress(data, scope="gop")
    check("lane_coder_gop_byte_identical", lambda: (
        device_compress(data, scope="gop", substream_bins=4096)
        == codec.compress(data, scope="gop", substream_bins=4096)))
    check("est_pallas_slice_byte_identical", lambda: (
        device_compress(sdata, scope="slice", substream_bins=0)
        == native.compress(sdata, scope="slice")))
    check("device_container_roundtrips_both_decoders", lambda: (
        (lambda c: codec.decompress(c) == data and
         native.decompress(c) == data)(
            device_compress(data, scope="gop", substream_bins=4096))))
    check("lane_decoder_inverts_on_chip", lambda: _lane_decode_check(data))

    def _dev_decompress_check():
        from avrecode_tpu.parallel.pipeline import device_decompress

        blob = codec.compress(sdata, scope="gop", substream_bins=4096)
        return device_decompress(blob) == sdata

    check("device_decompress_end_to_end", _dev_decompress_check)
    # CAVLC streams ride the same device pipelines (round 5)
    cav = os.path.join(ROOT, "data", "cavlc_ipp.mp4")
    if not os.path.exists(cav):
        subprocess.run(
            [os.path.join(ROOT, "tools", "genvideo"), cav,
             "320", "240", "20", "30", "10", "0", "26", "7", "1", "cabac=0"],
            check=True, capture_output=True,
        )
    cdata = open(cav, "rb").read()
    check("cavlc_lane_coder_byte_identical", lambda: (
        device_compress(cdata, scope="gop", substream_bins=4096)
        == codec.compress(cdata, scope="gop", substream_bins=4096)))
    out["all_ok"] = all(c.get("ok") for c in out["checks"].values())
    path = os.path.join(ROOT, "TPU_VERIFY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if out["all_ok"] else 1


def _lane_decode_check(data):
    import jax.numpy as jnp
    import numpy as np

    from avrecode_tpu.ops.lane_coder import (
        finalize_lanes, lane_encode_scan, split_lanes,
    )
    from avrecode_tpu.ops.lane_decoder import decode_streams_lanes
    from avrecode_tpu.parallel.pipeline import extract_traces

    *_, traces, _ = extract_traces(data, scope="gop")
    traces = [t for t in traces if len(t)]
    bitp1, lens, _ = split_lanes(traces, 2048)
    tok, car, ftok, fcar = lane_encode_scan(
        jnp.asarray(bitp1), jnp.asarray(lens))
    streams = finalize_lanes(tok, car, ftok, fcar, lens)
    p1s = np.asarray(bitp1) & 0xFFFF
    bits = np.asarray(decode_streams_lanes(streams, p1s, lens))
    want = (np.asarray(bitp1) >> 16) & 1
    mask = np.arange(bitp1.shape[1])[None, :] < np.asarray(lens)[:, None]
    return np.array_equal(bits * mask, want * mask)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
