"""4:4:4 and >8-bit coverage (the last stream-class gaps vs the hooked-ffmpeg
reference, SURVEY.md C18): Cb/Cr recode as luma-style planes under the
extended category rows (6-13), 8x8 blocks code coded_block_flag
(ctx 1012/1016/1020), and the bit-depth gate is gone (CABAC syntax is
depth-independent; only I_PCM sample sizes scale)."""

import os
import subprocess

import pytest

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.host import native

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")


def _clip(name, *args, comb=0, noise=15):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        env = dict(os.environ, AVT_COMB=str(comb), AVT_NOISE=str(noise))
        subprocess.run([GEN, path, *map(str, args)], check=True,
                       capture_output=True, env=env)
    return open(path, "rb").read()


def _no_fallback(data):
    from avrecode_tpu.codec import _scan_blocks
    from avrecode_tpu.utils.container import SCOPE_STREAM

    stats = {"slices": 0, "recoded": 0, "bins": 0}
    _scan_blocks(bytes(data), SCOPE_STREAM, None, stats, {})
    assert stats["recoded"] == stats["slices"] > 0
    return stats


def test_444_roundtrip_no_fallback():
    data = _clip("rt_444.mp4", 320, 240, 14, 30, 6, 2, 26, 7, 1, "x", 444)
    _no_fallback(data)
    comp = compress(data)
    assert decompress(comp) == data
    assert len(comp) < 0.97 * len(data)


def test_444_native_bit_identical():
    data = _clip("rt_444.mp4", 320, 240, 14, 30, 6, 2, 26, 7, 1, "x", 444)
    pc = compress(data)
    nc = native.compress(data)
    assert pc == nc
    assert native.decompress(nc) == data
    assert decompress(nc) == data


def test_444_mbaff_combined():
    data = _clip("rt_444_mbaff.mp4", 320, 240, 12, 30, 6, 2, 26, 9, 1,
                 "interlaced=1", 444, comb=1, noise=12)
    _no_fallback(data)
    comp = compress(data)
    assert decompress(comp) == data
    assert native.compress(data) == comp


def test_10bit_roundtrip():
    data = _clip("rt_10bit.mp4", 320, 240, 10, 30, 5, 2, 26, 7, 1, "x", 10)
    _no_fallback(data)
    comp = compress(data)
    assert decompress(comp) == data
    assert native.compress(data) == comp
    assert native.decompress(comp) == data


def test_444_10bit_combined():
    data = _clip("rt_444_10.mp4", 320, 240, 8, 30, 4, 1, 26, 3, 1, "x", 44410)
    _no_fallback(data)
    comp = compress(data)
    assert decompress(comp) == data
    assert native.compress(data) == comp


def test_444_scopes_and_device():
    from avrecode_tpu.parallel.pipeline import device_compress

    data = _clip("rt_444.mp4", 320, 240, 14, 30, 6, 2, 26, 7, 1, "x", 444)
    for scope in ("slice", "gop"):
        assert decompress(compress(data, scope=scope)) == data
    dev = device_compress(data, scope="gop", substream_bins=4096)
    assert dev == compress(data, scope="gop", substream_bins=4096)
    assert native.decompress(dev) == data
