"""Streaming container IO (utils/streamio.py): file-to-file compression and
decompression with peak memory bounded by a GOP window — the
productization gap for long streams (BASELINE.md config 5; the reference
mmaps the whole input and buffers the whole protobuf).  Outputs must be
byte-identical to the whole-buffer native path."""

import os
import subprocess
import sys

import pytest

from avrecode_tpu.host import native
from avrecode_tpu.utils.streamio import stream_compress, stream_decompress

ROOT = os.path.join(os.path.dirname(__file__), "..")
DATA = os.path.join(ROOT, "data")


def _clip():
    path = os.path.join(DATA, "mid.mp4")
    if not os.path.exists(path):
        subprocess.run(
            [os.path.join(ROOT, "tools", "genvideo"), path,
             "640", "480", "120", "30", "24", "1", "26", "7", "1"],
            check=True, capture_output=True,
        )
    return path


def test_stream_identical_to_whole(tmp_path):
    src = _clip()
    out = str(tmp_path / "s.avtr")
    dec = str(tmp_path / "s.out")
    stream_compress(src, out, threads=2, window_gops=2)
    whole = native.compress(open(src, "rb").read(), "gop", 0)
    assert open(out, "rb").read() == whole
    stream_decompress(out, dec, threads=2)
    assert open(dec, "rb").read() == open(src, "rb").read()


def test_stream_ts_and_garbage(tmp_path):
    # TS container through the streaming path; garbage input degrades to a
    # literal container that still streams back bit-exact
    remux = os.path.join(ROOT, "tools", "remux")
    if not os.path.exists(remux):
        subprocess.run(["gcc", "-O2", "-o", remux, remux + ".c",
                        "-lavformat", "-lavcodec", "-lavutil"], check=True)
    ts = str(tmp_path / "m.ts")
    subprocess.run([remux, _clip(), ts], check=True, capture_output=True)
    out = str(tmp_path / "t.avtr")
    dec = str(tmp_path / "t.out")
    stream_compress(ts, out, threads=1)
    assert open(out, "rb").read() == native.compress(open(ts, "rb").read(), "gop", 0)
    stream_decompress(out, dec)
    assert open(dec, "rb").read() == open(ts, "rb").read()

    g = str(tmp_path / "g.bin")
    open(g, "wb").write(b"not a video" * 500)
    stream_compress(g, out)
    stream_decompress(out, dec)
    assert open(dec, "rb").read() == open(g, "rb").read()


def test_stream_memory_bounded(tmp_path):
    """Peak RSS of the streaming path must sit well under the whole-buffer
    path on a long multi-GOP stream (measured in python -S subprocesses so
    the preloaded-jax floor doesn't drown the signal)."""
    remux = os.path.join(ROOT, "tools", "remux")
    if not os.path.exists(remux):
        subprocess.run(["gcc", "-O2", "-o", remux, remux + ".c",
                        "-lavformat", "-lavcodec", "-lavutil"], check=True)
    b264 = str(tmp_path / "m.264")
    subprocess.run([remux, _clip(), b264], check=True, capture_output=True)
    long264 = str(tmp_path / "long.264")
    with open(long264, "wb") as f:
        chunk = open(b264, "rb").read()
        for _ in range(60):  # ~10 MB, ~300 GOPs
            f.write(chunk)

    probe = f"""
import sys
sys.path.insert(0, {ROOT!r})
mode = sys.argv[1]
if mode == 'whole':
    from avrecode_tpu.host import native
    data = open({long264!r}, 'rb').read()
    c = native.compress(data, 'gop', 2)
    open({str(tmp_path / 'w.avtr')!r}, 'wb').write(c)
else:
    from avrecode_tpu.utils.streamio import stream_compress
    stream_compress({long264!r}, {str(tmp_path / 's.avtr')!r}, threads=2)
hwm = [l for l in open('/proc/self/status') if l.startswith('VmHWM')][0]
print(int(hwm.split()[1]))  # kB; VmHWM resets on exec (ru_maxrss does not)
"""
    rss = {}
    for mode in ("whole", "stream"):
        r = subprocess.run([sys.executable, "-S", "-c", probe, mode],
                           capture_output=True, text=True, check=True)
        rss[mode] = int(r.stdout.strip().splitlines()[-1])
    assert (open(str(tmp_path / "w.avtr"), "rb").read()
            == open(str(tmp_path / "s.avtr"), "rb").read())
    # whole-buffer peak grows with ~6x input; streaming stays near base +
    # window (file-backed clean pages are dropped between windows)
    assert rss["stream"] < 0.75 * rss["whole"], rss
