"""Model v3 logistic-mixer invariants: cross-implementation byte identity
under rollback (a failed slice must restore mixer weights exactly), and
weight-state isolation between scopes."""

import os
import subprocess

import pytest

from avrecode_tpu import codec
from avrecode_tpu.host import native

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")


def _clip():
    path = os.path.join(DATA, "mid.mp4")
    if not os.path.exists(path):
        subprocess.run(
            [GEN, path, "640", "480", "120", "30", "24", "1", "26", "7", "1"],
            check=True,
            capture_output=True,
        )
    with open(path, "rb") as f:
        return bytearray(f.read())


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_rollback_restores_weights_identically():
    """Corrupt a mid-file slice payload so it fails re-encode verification:
    the model (counters AND mixer weights) must roll back to the snapshot,
    and both implementations must agree byte-for-byte on the rest."""
    data = _clip()
    # flip bytes in the middle of the file (inside some slice's CABAC
    # payload) — compress falls back to literal for that slice/GOP region
    mid = len(data) // 2
    for i in range(mid, mid + 8):
        data[i] ^= 0x5A
    data = bytes(data)
    py = codec.compress(data, scope="gop")
    nat = native.compress(data, scope="gop")
    assert py == nat, (len(py), len(nat))
    assert codec.decompress(py) == data
    assert native.decompress(nat) == data


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_weights_reset_per_gop():
    """GOP scope resets mixer weights with the model: compressing a 2x
    concatenation of a 1-GOP elementary-ish file must produce per-GOP
    streams whose second GOP equals a fresh model's (weight leakage across
    GOPs would desync decompression; the roundtrip pins it)."""
    data = _clip()
    out = native.compress(data, scope="gop")
    assert native.decompress(out) == data
    # slice scope: weights reset per slice
    out_s = native.compress(data, scope="slice")
    assert native.decompress(out_s) == data
    assert codec.compress(data, scope="slice") == out_s
