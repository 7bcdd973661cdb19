"""MBAFF (interlaced, MB-adaptive frame/field) coverage — the stream class
the reference inherits from its hooked ffmpeg decoder (SURVEY.md C18,
recode.cpp:149-235) and round 2 still served as literal fallback.

Clips are generated with AVT_COMB=1 (interlaced-capture combing) so x264
codes most MB pairs as field, including in I slices, plus frame pairs and
mixed boundaries — the full Table 6-4 neighbor-derivation surface.
"""

import os
import subprocess

import pytest

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.host import native
from avrecode_tpu.utils.container import KIND_SLICE, Reader, MAGIC

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")


def _clip(name, *args, comb=1, noise=12):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        env = dict(os.environ, AVT_COMB=str(comb), AVT_NOISE=str(noise))
        subprocess.run([GEN, path, *map(str, args)], check=True,
                       capture_output=True, env=env)
    return open(path, "rb").read()


def _slice_block_count(blob):
    """Number of recoded slice blocks in an AVTR container."""
    r = Reader(blob)
    assert blob[:4] == MAGIC
    r.pos = 4
    r.u8(), r.u8(), r.u16(), r.varint()
    for _ in range(r.varint()):
        r.blob()
    for _ in range(r.varint()):
        r.blob()
    n = 0
    per_slice = False  # stream scope in these tests
    while True:
        kind = r.u8()
        if kind == 2:  # KIND_END
            break
        if kind == KIND_SLICE:
            n += 1
            r.varint(), r.blob(), r.varint(), r.varint(), r.blob()
            for _ in range(r.varint()):  # v6 TS segmentation entries
                r.varint(), r.blob()
        else:
            r.blob()
    return n


def _n_slices(data):
    from avrecode_tpu.h264.stream import StreamWalker

    return sum(1 for _ in StreamWalker(data).slices())


def test_mbaff_roundtrip_no_fallback():
    # combed 320x240, I/P/B, 8x8dct, field + frame pairs
    data = _clip("mbaff_b.mp4", 320, 240, 18, 30, 6, 2, 26, 7, 1, "interlaced=1")
    comp = compress(data)
    assert decompress(comp) == data
    # every CABAC slice recoded — zero literal fallbacks
    assert _slice_block_count(comp) == _n_slices(data) > 0
    assert len(comp) < 0.96 * len(data)


def test_mbaff_native_bit_identical():
    data = _clip("mbaff_b.mp4", 320, 240, 18, 30, 6, 2, 26, 7, 1, "interlaced=1")
    pc = compress(data)
    nc = native.compress(data)
    assert pc == nc
    assert native.decompress(nc) == data
    assert decompress(nc) == data


def test_mbaff_multislice_422():
    data = _clip("mbaff_ms422.mp4", 320, 240, 10, 30, 5, 1, 26, 3, 3,
                 "interlaced=1", 422)
    comp = compress(data)
    assert decompress(comp) == data
    assert _slice_block_count(comp) == _n_slices(data) > 0
    assert native.compress(data) == comp
    assert native.decompress(comp) == data


def test_mbaff_scopes():
    data = _clip("mbaff_b.mp4", 320, 240, 18, 30, 6, 2, 26, 7, 1, "interlaced=1")
    for scope in ("slice", "gop"):
        comp = compress(data, scope=scope)
        assert decompress(comp) == data


def test_mbaff_high_skip_content():
    # low-noise progressive-ish content inside an MBAFF stream: mostly
    # skipped pairs -> exercises both-skipped field inference (7.4.4)
    data = _clip("mbaff_skip.mp4", 320, 240, 12, 30, 6, 0, 40, 5, 1,
                 "interlaced=1", comb=0, noise=3)
    comp = compress(data)
    assert decompress(comp) == data
    assert _slice_block_count(comp) == _n_slices(data) > 0


def test_mbaff_device_pipeline():
    # gop-scope device path on the virtual CPU mesh: traces from the native
    # extractor, lane-parallel encode, byte-identical to the host container
    from avrecode_tpu.parallel.pipeline import device_compress

    data = _clip("mbaff_b.mp4", 320, 240, 18, 30, 6, 2, 26, 7, 1, "interlaced=1")
    dev = device_compress(data, scope="gop")
    host = compress(data, scope="gop", substream_bins=4096)
    assert dev == host
    assert decompress(dev) == data
    assert native.decompress(dev) == data
