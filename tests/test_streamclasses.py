"""Rare stream-class tail (SURVEY.md C18 residue): monochrome
(chroma_format_idc 0), separate colour planes (4:4:4 +
separate_colour_plane_flag), and SP/SI switching slices all RECODE —
they no longer raise UnsupportedStream into literal fallback.

x264 cannot emit any of these, so the fixtures are hand-authored by the
framework's own CABAC writer (tools/gen_mono.py / gen_sep.py / gen_sp.py,
the gen_pcm.py method).  Monochrome and the SP frames are validated
against the libavcodec decode oracle; libavcodec itself REFUSES separate
colour planes ("separate color planes are not supported") and folds SI
into plain I parsing (no Table 9-11 prefix bin), so for those two classes
the framework EXCEEDS the reference (whose hooked ffmpeg could never
deliver them) and validation rests on spec-by-construction generation,
Python/C++ byte identity, and bit-exact roundtrips."""

import os
import subprocess
import sys

import pytest

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.h264.stream import validate_file
from avrecode_tpu.host import native

ROOT = os.path.join(os.path.dirname(__file__), "..")
DATA = os.path.join(ROOT, "data")

GENS = {
    "mono.264": ["tools/gen_mono.py", os.path.join(DATA, "mono.264"),
                 "16x12", "6"],
    "sep.264": ["tools/gen_sep.py", os.path.join(DATA, "sep.264"),
                "8x6", "4"],
    "spsi.264": ["tools/gen_sp.py", os.path.join(DATA, "spsi.264"),
                 "16x12"],
}


def _fixture(name):
    p = os.path.join(DATA, name)
    if not os.path.exists(p):
        subprocess.run([sys.executable] + GENS[name], check=True, cwd=ROOT,
                       capture_output=True)
    return open(p, "rb").read()


@pytest.mark.parametrize("name", ["mono.264", "sep.264", "spsi.264"])
def test_all_slices_parse_byte_exact(name):
    data = _fixture(name)
    stats = validate_file(data)
    assert stats["errors"] == []
    assert stats["byte_exact"] == stats["slices"] > 0


@pytest.mark.parametrize("name", ["mono.264", "sep.264", "spsi.264"])
def test_roundtrip_native_identical(name):
    data = _fixture(name)
    c = compress(data, scope="gop")
    nc = native.compress(data, scope="gop", threads=1)
    assert c == nc
    assert decompress(c) == data
    assert native.decompress(nc) == data


@pytest.mark.parametrize("name", ["mono.264", "sep.264"])
def test_recodes_with_savings(name):
    # real savings prove the slices recode rather than fall literal
    data = _fixture(name)
    c = compress(data, scope="gop")
    assert len(c) < 0.97 * len(data)


def test_mono_oracle_clean():
    # libavcodec decodes the monochrome fixture without a single error
    _fixture("mono.264")
    oracle = os.path.join(ROOT, "tools", "mbtype_oracle")
    if not os.path.exists(oracle):
        subprocess.run(
            ["gcc", "-O2", "-o", oracle, oracle + ".c", "-lavformat",
             "-lavcodec", "-lavutil"], check=True)
    r = subprocess.run([oracle, os.path.join(DATA, "mono.264")],
                       capture_output=True, text=True)
    log = r.stderr.lower()
    assert "error" not in log and "invalid" not in log
    assert log.count("new frame") >= 6
