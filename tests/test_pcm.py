"""I_PCM macroblock coverage (SURVEY.md C18: the hooked-ffmpeg reference
recodes PCM via its decoder callbacks, recode.cpp:144-235).

x264 never emits I_PCM (measured), so the test stream is hand-authored by
tools/gen_pcm.py using the framework's own spec-exact CABAC writer — the
stream is validated against the libavcodec decode oracle in
test_pcm_stream_is_conformant before anything else relies on it."""

import os
import subprocess
import sys

import pytest

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.host import native

ROOT = os.path.join(os.path.dirname(__file__), "..")
DATA = os.path.join(ROOT, "data")


def _pcm_clip(name="pcm.264", dims="4x3", frames=3):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_pcm.py"),
             path, dims, str(frames)],
            check=True, capture_output=True,
        )
    return open(path, "rb").read()


def test_pcm_stream_is_conformant():
    """The authored stream must decode cleanly in libavcodec with PCM
    macroblocks ('P') exactly where placed — the external conformance
    oracle for our CABAC flush/align/reinit write path."""
    _pcm_clip()
    oracle = os.path.join(ROOT, "tools", "mbtype_oracle")
    if not os.path.exists(oracle):
        subprocess.run(
            ["gcc", "-O2", "-o", oracle, oracle + ".c", "-lavformat",
             "-lavcodec", "-lavutil"],
            check=True,
        )
    r = subprocess.run([oracle, os.path.join(DATA, "pcm.264")],
                       capture_output=True, text=True)
    out = r.stderr
    assert "error" not in out.lower()
    assert out.count("New frame") == 3
    # frame with the whole top row PCM
    assert "P  P  P  P" in out


def test_pcm_roundtrip_no_fallback():
    data = _pcm_clip()
    from avrecode_tpu.h264.stream import StreamWalker
    from avrecode_tpu.codec import _scan_blocks
    from avrecode_tpu.utils.container import SCOPE_STREAM

    stats = {"slices": 0, "recoded": 0, "bins": 0}
    _scan_blocks(bytes(data), SCOPE_STREAM, None, stats, {})
    assert stats["recoded"] == stats["slices"] == 3  # zero literal fallbacks
    comp = compress(data)
    assert decompress(comp) == data


def test_pcm_native_bit_identical():
    data = _pcm_clip("pcm_big.264", "8x6", 6)
    pc = compress(data)
    nc = native.compress(data)
    assert pc == nc
    assert native.decompress(nc) == data
    assert decompress(nc) == data
    for scope in ("slice", "gop"):
        cc = native.compress(data, scope)
        assert cc == compress(data, scope=scope)
        assert native.decompress(cc) == data


def test_pcm_device_pipeline():
    from avrecode_tpu.parallel.pipeline import device_compress

    data = _pcm_clip("pcm_big.264", "8x6", 6)
    dev = device_compress(data, scope="gop", substream_bins=4096)
    host = compress(data, scope="gop", substream_bins=4096)
    assert dev == host
    assert decompress(dev) == data


def test_pcm_mbaff_combined():
    """I_PCM inside MBAFF pairs (field and frame): hand-authored, validated
    by the libavcodec oracle, recoded byte-identically in both impls."""
    path = os.path.join(DATA, "pcm_mbaff.264")
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_pcm.py"),
             path, "4x4", "3", "mbaff"],
            check=True, capture_output=True,
        )
    oracle = os.path.join(ROOT, "tools", "mbtype_oracle")
    if os.path.exists(oracle):
        r = subprocess.run([oracle, path], capture_output=True, text=True)
        assert "error" not in r.stderr.lower()
    data = open(path, "rb").read()
    comp = compress(data)
    assert decompress(comp) == data
    assert native.compress(data) == comp
    assert native.decompress(comp) == data
