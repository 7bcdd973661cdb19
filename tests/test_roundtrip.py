"""End-to-end roundtrip oracle tests (the acceptance test, SURVEY.md §4:
recode.cpp:1601-1640 analog) over generated x264 CABAC clips, plus
garbage-input robustness (everything unparseable must pass through as
literals, bit-exact)."""

import os
import subprocess

import pytest

from avrecode_tpu.codec import compress, decompress, roundtrip

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")


def _clip(name, *args):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        if not os.path.exists(GEN):
            subprocess.run(
                ["gcc", "-O2", "-o", GEN, GEN + ".c", "-lavformat", "-lavcodec", "-lavutil", "-lm"],
                check=True,
            )
        subprocess.run([GEN, path, *map(str, args)], check=True, capture_output=True)
    return open(path, "rb").read()


def test_roundtrip_tiny_ipp():
    data = _clip("rt_tiny.mp4", 160, 128, 8, 30, 4, 0, 26, 11, 1)
    ok, ratio, comp, dec = roundtrip(data)
    assert ok
    assert len(comp) < len(data) * 1.02  # tiny clips may not compress much


def test_roundtrip_bframes():
    data = _clip("rt_b.mp4", 192, 160, 10, 30, 5, 2, 24, 5, 1)
    ok, ratio, comp, dec = roundtrip(data)
    assert ok


def test_roundtrip_multislice():
    data = _clip("rt_ms.mp4", 320, 256, 6, 30, 3, 1, 28, 3, 3)
    ok, ratio, comp, dec = roundtrip(data)
    assert ok


def test_roundtrip_calm_compresses():
    data = _clip("test_calm.mp4", 320, 240, 30, 30, 10, 0, 23, 42, 1)
    ok, ratio, comp, dec = roundtrip(data)
    assert ok
    assert ratio < 96.0  # the headline ratio target band


def test_garbage_passthrough():
    # non-video bytes must roundtrip as pure literals
    for blob in (b"", b"\x00" * 100, bytes(range(256)) * 5, b"not a video"):
        comp = compress(blob)
        assert decompress(comp) == blob


def test_truncated_video_passthrough():
    data = _clip("rt_tiny.mp4", 160, 128, 8, 30, 4, 0, 26, 11, 1)
    for cut in (10, 100, len(data) // 2, len(data) - 3):
        blob = data[:cut]
        comp = compress(blob)
        assert decompress(comp) == blob


def test_roundtrip_stress_variants():
    """Parser coverage across encoder feature space: b-pyramid, many refs,
    weighted prediction, open GOP — all must recode (not just fall back)
    and roundtrip bit-exact."""
    from avrecode_tpu.h264.stream import validate_file

    variants = [
        ("rt_bpyr.mp4", (256, 192, 12, 30, 6, 3, 24, 21, 1, "b-pyramid=normal:ref=5")),
        ("rt_wp.mp4", (256, 192, 10, 30, 5, 2, 24, 22, 1, "weightp=2:weightb=1")),
        ("rt_ogop.mp4", (256, 192, 10, 30, 5, 1, 24, 23, 1, "open-gop=1")),
    ]
    for name, args in variants:
        data = _clip(name, *args)
        stats = validate_file(data)
        assert stats["parsed"] == stats["slices"] > 0, (name, stats["errors"][:2])
        assert stats["byte_exact"] == stats["slices"], (name, stats["errors"][:2])
        ok, ratio, comp, dec = roundtrip(data)
        assert ok, name


def test_roundtrip_422():
    """4:2:2 chroma (High 4:2:2 profile): full recode, not fallback."""
    from avrecode_tpu.h264.stream import validate_file

    data = _clip("rt_422.mp4", 256, 192, 10, 30, 5, 1, 24, 33, 1, "", 422)
    stats = validate_file(data)
    assert stats["byte_exact"] == stats["slices"] > 0, stats["errors"][:2]
    ok, ratio, comp, dec = roundtrip(data)
    assert ok


def test_roundtrip_encoder_matrix_round5():
    """Round-5 validation-independence widening: encoder settings that
    reshape the syntax statistics (trellis RD quantization on/off, AQ
    variance modes, 8x8dct off, slice-max-size splitting, weightb off)
    must fully recode — CABAC and CAVLC both — and roundtrip bit-exact."""
    from avrecode_tpu.h264.stream import validate_file
    from avrecode_tpu.codec import compress, decompress

    cabac_variants = [
        ("rt_trellis0.mp4",
         (256, 192, 10, 30, 5, 2, 24, 41, 1, "trellis=0:aq-mode=0")),
        ("rt_trellis2.mp4",
         (256, 192, 10, 30, 5, 2, 24, 42, 1, "trellis=2:aq-mode=2")),
        ("rt_no8x8.mp4",
         (256, 192, 10, 30, 5, 1, 24, 43, 1, "8x8dct=0:weightb=0")),
        ("rt_slicemax.mp4",
         (320, 240, 8, 30, 4, 0, 24, 44, 1, "slice-max-size=800")),
    ]
    for name, args in cabac_variants:
        data = _clip(name, *args)
        stats = validate_file(data)
        assert stats["byte_exact"] == stats["slices"] > 0, (
            name, stats["errors"][:2])
        ok, ratio, comp, dec = roundtrip(data)
        assert ok, name

    cavlc_variants = [
        ("rt_cv_trellis.mp4",
         (256, 192, 10, 30, 5, 2, 24, 45, 1, "cabac=0:trellis=2:aq-mode=2")),
        ("rt_cv_slicemax.mp4",
         (320, 240, 8, 30, 4, 0, 24, 46, 1, "cabac=0:slice-max-size=800")),
    ]
    for name, args in cavlc_variants:
        data = _clip(name, *args)
        blob = compress(data, scope="gop")
        assert decompress(blob) == data, name
        # real recode, not literal fallback
        assert len(blob) < len(data) * 0.95, (name, len(blob), len(data))
