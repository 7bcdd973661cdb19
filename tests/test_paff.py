"""PAFF field-picture coverage (SURVEY.md C18: the hooked-ffmpeg reference
recodes every CABAC stream its decoder handles, including PAFF field
pictures; x264 emits only MBAFF, so — like I_PCM — the test stream is
hand-authored by tools/gen_paff.py with the framework's own spec-exact
CABAC writer and validated against the libavcodec decode oracle first."""

import os
import subprocess
import sys

from avrecode_tpu.codec import compress, decompress, _scan_blocks
from avrecode_tpu.host import native
from avrecode_tpu.utils.container import SCOPE_STREAM

ROOT = os.path.join(os.path.dirname(__file__), "..")
DATA = os.path.join(ROOT, "data")


def _paff_clip(name="paff.264", dims="4x4", frames=3):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "gen_paff.py"),
             path, dims, str(frames)],
            check=True, capture_output=True,
        )
    return open(path, "rb").read()


def test_paff_stream_is_conformant():
    """libavcodec must decode the authored stream with every MB field-coded
    ('=' markers) and no errors — the external conformance oracle for the
    field-context CABAC write path."""
    _paff_clip()
    oracle = os.path.join(ROOT, "tools", "mbtype_oracle")
    if not os.path.exists(oracle):
        subprocess.run(
            ["gcc", "-O2", "-o", oracle, oracle + ".c",
             "-lavformat", "-lavcodec", "-lavutil"],
            check=True, capture_output=True,
        )
    r = subprocess.run(
        [oracle, os.path.join(DATA, "paff.264")],
        capture_output=True, text=True,
    )
    assert r.returncode == 0
    out = r.stderr
    assert "error" not in out.lower() and "conceal" not in out.lower()
    rows = [ln for ln in out.splitlines() if "] I =" in ln or "] P =" in ln]
    assert len(rows) >= 6  # 3 frames x at least 2 field rows shown
    for ln in rows:  # every MB marker is followed by the '=' field marker
        body = ln.split("] ", 1)[1]
        assert body.count("=") == (body.count("I") + body.count("P"))


def test_paff_recodes_zero_fallbacks():
    data = _paff_clip()
    stats = {"slices": 0, "recoded": 0, "bins": 0}
    _scan_blocks(data, SCOPE_STREAM, None, stats, {})
    assert stats["slices"] == 6
    assert stats["recoded"] == 6  # no literal fallbacks
    out = compress(data)
    assert decompress(out) == data
    assert len(out) < len(data)


def test_paff_native_matches_python():
    data = _paff_clip()
    for scope in ("stream", "gop", "slice"):
        n = native.compress(data, scope=scope)
        assert n == compress(data, scope=scope), scope
        assert native.decompress(n) == data
        assert decompress(n) == data


def test_paff_with_pcm_macroblocks():
    """gen_paff places I_PCM MBs inside field pictures (frames 1-2):
    the PCM escape/flush/re-init path must compose with field coding."""
    data = _paff_clip()
    # PCM sample bytes present: raw 384-byte payloads make the stream
    # bigger than an all-empty one of the same geometry
    lean = _paff_clip("paff_lean.264", "4x4", 1)
    assert len(data) > len(lean) + 2 * 384
    out = native.compress(data, scope="gop")
    assert native.decompress(out) == data
