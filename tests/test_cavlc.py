"""CAVLC recoding (h264/cavlc.py + host/src/cavlc.h) — coverage the
reference does NOT have: its hooks fire only from ffmpeg's CABAC decode
path (recode.cpp:149-167), so CAVLC/baseline streams pass through as
literals there.  Here they must recode with real savings, roundtrip
bit-exact through both implementations, and the two implementations must
produce byte-identical containers.

The bit-level modeling design makes regeneration identity by
construction, so the acceptance bar is: every slice of every matrix entry
parses to completion (no literal fallback) and the container beats the
source size by a clear margin.
"""

import os
import subprocess

import pytest

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.h264.mbparse import PicState
from avrecode_tpu.h264.params import mb_height
from avrecode_tpu.h264.cavlc import CavlcCompressCoder, CavlcSliceParser
from avrecode_tpu.h264.stream import StreamWalker
from avrecode_tpu.host import native

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")

# name -> (genvideo args, extra x264 params): the CAVLC syntax matrix
MATRIX = {
    "cavlc_ipp.mp4": (["320", "240", "20", "30", "10", "0", "26", "7", "1"],
                      "cabac=0"),
    "cavlc_b8x8.mp4": (["320", "240", "20", "30", "10", "2", "24", "5", "1"],
                       "cabac=0"),
    "cavlc_ref.mp4": (["320", "240", "30", "30", "15", "3", "22", "4", "1"],
                      "cabac=0:ref=8:b-pyramid=normal:weightb=1"),
    "cavlc_ms.mp4": (["640", "480", "10", "30", "5", "1", "30", "5", "4"],
                     "cabac=0"),
    "cavlc_q1.mp4": (["192", "160", "6", "30", "3", "0", "1", "2", "1"],
                     "cabac=0"),
}


def _clip(name):
    p = os.path.join(DATA, name)
    if not os.path.exists(p):
        args, extra = MATRIX[name]
        subprocess.run([GEN, p] + args + [extra], check=True,
                       capture_output=True)
    return open(p, "rb").read()


@pytest.mark.parametrize("name", sorted(MATRIX))
def test_cavlc_all_slices_recode(name):
    """Every slice parses to completion — zero literal fallbacks."""
    data = _clip(name)
    w = StreamWalker(data)
    cur = prev = None
    sid = ok = 0
    for rec in w.slices():
        assert rec.header.cavlc
        if rec.header.first_mb_in_slice == 0 or cur is None:
            prev = cur
            cur = PicState(rec.sps.pic_width_in_mbs, mb_height(rec.sps))
        sid += 1
        coder = CavlcCompressCoder(rec.rbsp[1:], rec.header.data_bit_offset)
        parser = CavlcSliceParser(rec.sps, rec.pps, rec.header, cur, prev,
                                  coder, sid)
        parser.parse_slice_data()
        coder.finish()  # canonical trailing bits
        ok += 1
    assert ok > 0


@pytest.mark.parametrize("name", sorted(MATRIX))
def test_cavlc_roundtrip_and_identity(name):
    """Python and native containers are byte-identical; both decoders
    reproduce the original bytes; savings are real (the reference would
    score 100% literal on these files)."""
    data = _clip(name)
    for scope in ("gop", "slice"):
        pc = compress(data, scope=scope)
        nc = native.compress(data, scope=scope) if native.available() else pc
        assert nc == pc, f"{name} {scope}: C++ != Python container"
        assert decompress(pc) == data
        if native.available():
            assert native.decompress(nc) == data
    ratio = len(compress(data, scope="gop")) / len(data)
    assert ratio < 0.95, f"{name}: ratio {ratio:.3f} (no real savings)"


def test_cavlc_device_traces():
    """The trace-extraction device front end records CAVLC bins too: the
    lane-parallel pipeline output equals the matching host container."""
    data = _clip("cavlc_ipp.mp4")
    from avrecode_tpu.parallel.pipeline import device_compress

    dev = device_compress(data, scope="gop")
    host = compress(data, scope="gop", substream_bins=4096)
    assert dev == host
    assert decompress(dev) == data


def test_cavlc_mb_types_match_libavcodec_oracle():
    """Cross-check the owned CAVLC parser's per-MB decisions against the
    system libavcodec decoder (FF_DEBUG_MB_TYPE map), the same oracle the
    MBAFF/PCM suites use: the decoder must consume the stream without
    errors and agree with our parser on the total skipped-MB count — an
    independent confirmation that the mb-layer FSM segments elements
    exactly like a known-good decoder."""
    root = os.path.join(os.path.dirname(__file__), "..")
    oracle = os.path.join(root, "tools", "mbtype_oracle")
    if not os.path.exists(oracle):
        subprocess.run(
            ["gcc", "-O2", "-o", oracle, oracle + ".c", "-lavformat",
             "-lavcodec", "-lavutil"],
            check=True,
        )
    path = os.path.join(DATA, "cavlc_ipp.mp4")
    data = _clip("cavlc_ipp.mp4")
    r = subprocess.run([oracle, path], capture_output=True, text=True)
    assert r.returncode == 0
    assert "error" not in r.stderr.lower()
    # oracle map rows: "[h264 @ ...] X  X  X- ..." — one cell per MB: a
    # class char ('S' = skip, 'I'/'i' intra, '>'/'<'/'X' inter pred
    # arrows) optionally followed by a segmentation char (+|-).  A row is
    # a line whose every token after the log prefix is such a cell.
    cells = set("SIiDd><X=Aal+|-?")
    oracle_skips = 0
    for line in r.stderr.splitlines():
        if "] " not in line or "New frame" in line:
            continue
        toks = line.split("] ", 1)[1].split()
        if toks and all(len(t) <= 2 and set(t) <= cells for t in toks):
            oracle_skips += sum(1 for t in toks if t[0] == "S")
    w = StreamWalker(data)
    cur = prev = None
    sid = 0
    ours = 0
    for rec in w.slices():
        if rec.header.first_mb_in_slice == 0 or cur is None:
            if cur is not None:
                ours += int(cur.skip.sum())
            prev = cur
            cur = PicState(rec.sps.pic_width_in_mbs, mb_height(rec.sps))
        sid += 1
        coder = CavlcCompressCoder(rec.rbsp[1:], rec.header.data_bit_offset)
        parser = CavlcSliceParser(rec.sps, rec.pps, rec.header, cur, prev,
                                  coder, sid)
        parser.parse_slice_data()
    if cur is not None:
        ours += int(cur.skip.sum())
    assert ours == oracle_skips


def test_cavlc_mixed_with_cabac_corpus_unaffected():
    """CABAC streams still produce the exact pre-CAVLC containers (the new
    key classes are only touched by CAVLC slices)."""
    src = os.path.join(DATA, "rt_gop.mp4")
    if not os.path.exists(src):
        subprocess.run(
            [GEN, src, "192", "160", "12", "30", "4", "1", "26", "9", "1"],
            check=True, capture_output=True,
        )
    data = open(src, "rb").read()
    pc = compress(data, scope="gop")
    if native.available():
        assert native.compress(data, scope="gop") == pc
    assert decompress(pc) == data


def test_cavlc_corrupt_input_falls_back():
    """Mutated CAVLC payloads either recode (mutation still parses — the
    bits are modeled, so the roundtrip stays exact) or fall back to
    literal; either way decompress(compress(x)) == x."""
    data = bytearray(_clip("cavlc_ipp.mp4"))
    import random

    rng = random.Random(7)
    for _ in range(12):
        mut = bytearray(data)
        for _k in range(6):
            i = rng.randrange(len(mut))
            mut[i] ^= 1 << rng.randrange(8)
        blob = compress(bytes(mut), scope="gop")
        assert decompress(blob) == bytes(mut)


def test_cavlc_444_lossless():
    """High 4:4:4 Predictive CAVLC — what `x264 --qp 0` (lossless) emits
    by default.  Three luma-style planes share the luma cbp; per-plane nC
    maps.  Both implementations byte-identical, real savings on lossless
    content (the reference: 100% literal)."""
    p = os.path.join(DATA, "cavlc_ll444.mp4")
    if not os.path.exists(p):
        subprocess.run(
            [GEN, p, "192", "160", "6", "30", "3", "0", "0", "13", "1",
             "cabac=0:qp=0", "x444"],
            check=True, capture_output=True)
    data = open(p, "rb").read()
    pc = compress(data, scope="gop")
    if native.available():
        nc = native.compress(data, scope="gop")
        assert nc == pc
        assert native.decompress(nc) == data
    assert decompress(pc) == data
    assert len(pc) < len(data) * 0.85, len(pc) / len(data)
