"""Format v2 interleaved sub-streams: the coder (not the model) resets every
substream_bins bins, producing independently decodable sub-streams inside a
multi-stream envelope (SURVEY.md §2 bin-level parallelism / interleaved
entropy coders).  Encode: Python model.  Decode: Python AND native C++ must
both consume B>0 containers."""

import os
import subprocess

import pytest

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.host import native

ROOT = os.path.join(os.path.dirname(__file__), "..")
CLIP = os.path.join(ROOT, "data", "rt_gop.mp4")


def _data():
    with open(CLIP, "rb") as f:
        return f.read()


@pytest.mark.parametrize("scope", ["stream", "gop", "slice"])
@pytest.mark.parametrize("B", [1000, 4096])
def test_substream_roundtrip_python(scope, B):
    data = _data()
    comp = compress(data, scope=scope, substream_bins=B)
    assert decompress(comp) == data


@pytest.mark.parametrize("scope", ["gop", "slice"])
def test_substream_native_decode(scope):
    if not native.available():
        pytest.skip("native library not built")
    data = _data()
    comp = compress(data, scope=scope, substream_bins=2000)
    assert native.decompress(comp) == data


def test_substream_overhead_small():
    """Sub-stream splitting must cost only the per-stream terminator."""
    data = _data()
    c0 = compress(data, scope="gop", substream_bins=0)
    ck = compress(data, scope="gop", substream_bins=1 << 16)
    assert len(ck) - len(c0) < 64  # a few sub-streams x ~2-3 bytes
