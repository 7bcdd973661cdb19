"""Demux breadth (SURVEY.md C5/C18, recode.cpp:89-96): the same H.264
stream rewrapped into Matroska or MPEG-TS must recode — not degrade to
literal — with savings matching the MP4 original.  MKV keeps NALs
contiguous; TS splits them across 188-byte packets, exercising the v6
segmented slice blocks (per-slice gap scatter/gather)."""

import os
import subprocess

import pytest

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.host import native
from avrecode_tpu.utils.mp4 import demux, nal_payload

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")
REMUX = os.path.join(os.path.dirname(__file__), "..", "tools", "remux")


def _remuxed(ext):
    src = os.path.join(DATA, "rt_ctr.mp4")
    if not os.path.exists(src):
        subprocess.run(
            [GEN, src, "320", "240", "16", "30", "8", "2", "26", "13", "1"],
            check=True, capture_output=True,
        )
    if not os.path.exists(REMUX):
        subprocess.run(
            ["gcc", "-O2", "-o", REMUX, REMUX + ".c", "-lavformat",
             "-lavcodec", "-lavutil"],
            check=True,
        )
    dst = os.path.join(DATA, "rt_ctr." + ext)
    if not os.path.exists(dst):
        if ext in ("avi", "mpg"):
            # these muxers need Annex-B input: route through TS (the PS
            # muxer does not auto-insert the mp4->Annex-B filter)
            _remuxed("ts")
            subprocess.run([REMUX, os.path.join(DATA, "rt_ctr.ts"), dst],
                           check=True, capture_output=True)
        else:
            subprocess.run([REMUX, src, dst], check=True, capture_output=True)
    return open(src, "rb").read(), open(dst, "rb").read()


@pytest.mark.parametrize("ext", ["mkv", "ts", "avi", "flv", "mpg"])
def test_demux_same_payloads(ext):
    mp4, other = _remuxed(ext)
    s1, s2 = demux(mp4), demux(other)
    p1 = [bytes(nal_payload(mp4, n)) for n in s1.nals if n.nal_type in (1, 5)]
    p2 = [bytes(nal_payload(other, n)) for n in s2.nals if n.nal_type in (1, 5)]
    assert p1 == p2 and len(p1) > 0


@pytest.mark.parametrize("ext", ["mkv", "ts", "avi", "flv", "mpg"])
def test_remuxed_same_savings(ext):
    mp4, other = _remuxed(ext)
    c_mp4, c_other = compress(mp4), compress(other)
    assert decompress(c_other) == other
    saved_mp4 = len(mp4) - len(c_mp4)
    saved_other = len(other) - len(c_other)
    # identical recoded stream: savings match up to per-slice segmentation
    # overhead (TS gap length varints)
    assert saved_other > 0.75 * saved_mp4 > 0


@pytest.mark.parametrize("ext", ["mkv", "ts", "avi", "flv", "mpg"])
def test_remuxed_native_identical(ext):
    _, other = _remuxed(ext)
    pc = compress(other)
    nc = native.compress(other)
    assert pc == nc
    assert native.decompress(nc) == other
    assert decompress(nc) == other


def test_ts_device_pipeline():
    from avrecode_tpu.parallel.pipeline import device_compress

    _, ts = _remuxed("ts")
    dev = device_compress(ts, scope="gop")
    host = compress(ts, scope="gop", substream_bins=4096)
    assert dev == host
    assert decompress(dev) == ts
    assert native.decompress(dev) == ts


def test_ts_gop_threads_match_serial():
    _, ts = _remuxed("ts")
    c1 = native.compress(ts, scope="gop", threads=1)
    c2 = native.compress(ts, scope="gop", threads=2)
    assert c1 == c2
    assert native.decompress(c1, threads=2) == ts


def test_mkv_mbaff():
    # MBAFF stream inside Matroska: both round-3 features composed
    src = os.path.join(DATA, "mbaff_b.mp4")
    if not os.path.exists(src):
        env = dict(os.environ, AVT_COMB="1", AVT_NOISE="12")
        subprocess.run(
            [GEN, src, "320", "240", "18", "30", "6", "2", "26", "7", "1",
             "interlaced=1"],
            check=True, capture_output=True, env=env,
        )
    dst = os.path.join(DATA, "mbaff_b.mkv")
    if not os.path.exists(dst):
        if not os.path.exists(REMUX):
            subprocess.run(
                ["gcc", "-O2", "-o", REMUX, REMUX + ".c", "-lavformat",
                 "-lavcodec", "-lavutil"],
                check=True,
            )
        subprocess.run([REMUX, src, dst], check=True, capture_output=True)
    data = open(dst, "rb").read()
    c = compress(data)
    assert decompress(c) == data
    assert len(c) < 0.96 * len(data)
    assert native.compress(data) == c


def _fragmented(mode):
    """Fragmented-MP4 fixture (moof/traf/trun): `frag` uses tfhd
    base_data_offset; `frag_moofbase` the DASH/CMAF default-base-is-moof
    layout."""
    src_data, _ = _remuxed("mkv")  # ensures source + remux binary exist
    src = os.path.join(DATA, "rt_ctr.mp4")
    dst = os.path.join(DATA, "rt_ctr_" + mode + ".mp4")
    if not os.path.exists(dst):
        subprocess.run([REMUX, src, dst, mode], check=True,
                       capture_output=True)
    return src_data, open(dst, "rb").read()


@pytest.mark.parametrize("mode", ["frag", "frag_moofbase"])
def test_fmp4_demux_same_payloads(mode):
    mp4, frag = _fragmented(mode)
    s1, s2 = demux(mp4), demux(frag)
    p1 = [bytes(nal_payload(mp4, n)) for n in s1.nals if n.nal_type in (1, 5)]
    p2 = [bytes(nal_payload(frag, n)) for n in s2.nals if n.nal_type in (1, 5)]
    assert p1 == p2 and len(p1) > 0


@pytest.mark.parametrize("mode", ["frag", "frag_moofbase"])
def test_fmp4_roundtrip_native_identical(mode):
    mp4, frag = _fragmented(mode)
    pc = compress(frag)
    nc = native.compress(frag)
    assert pc == nc
    assert decompress(pc) == frag
    assert native.decompress(nc) == frag
    # recodes (not literal): savings at parity with the plain-MP4 original
    saved_mp4 = len(mp4) - len(compress(mp4))
    saved_frag = len(frag) - len(pc)
    assert saved_frag > 0.75 * saved_mp4 > 0
