"""Unit tests for the host-side byte/bit utilities: exp-golomb, RBSP
escaping properties, container varints, and MP4 demux structure."""

import os
import random
import subprocess

from avrecode_tpu.utils.bitio import (
    BitReader,
    BitWriter,
    escape_rbsp,
    unescape_rbsp,
)
from avrecode_tpu.utils.container import Reader, Writer
from avrecode_tpu.utils.mp4 import demux

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_expgolomb_roundtrip():
    rng = random.Random(3)
    vals_ue = [rng.randrange(0, 1 << 20) for _ in range(500)] + [0, 1, 2, 255]
    vals_se = [rng.randrange(-(1 << 16), 1 << 16) for _ in range(500)] + [0, 1, -1]
    w = BitWriter()
    for v in vals_ue:
        w.ue(v)
    for v in vals_se:
        w.se(v)
    w.align_with(0)
    r = BitReader(w.bytes())
    for v in vals_ue:
        assert r.ue() == v
    for v in vals_se:
        assert r.se() == v


def test_rbsp_escape_roundtrip():
    rng = random.Random(5)
    for _ in range(200):
        # zero-heavy payloads exercise emulation-prevention densely
        n = rng.randrange(0, 200)
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, rng.randrange(256)]) for _ in range(n))
        esc = escape_rbsp(raw)
        assert unescape_rbsp(esc) == raw
        # escaped form never contains 00 00 0x with x <= 2 (00 00 03 is the
        # emulation-prevention sequence itself and is legal)
        for i in range(len(esc) - 2):
            if esc[i] == 0 and esc[i + 1] == 0:
                assert esc[i + 2] > 2


def test_container_varint_roundtrip():
    rng = random.Random(7)
    vals = [rng.randrange(0, 1 << 40) for _ in range(300)] + [0, 127, 128, 1 << 35]
    w = Writer()
    for v in vals:
        w.varint(v)
    w.blob(b"hello")
    r = Reader(w.bytes())
    for v in vals:
        assert r.varint() == v
    assert r.blob() == b"hello"


def test_mp4_demux_structure():
    path = os.path.join(ROOT, "data", "rt_tiny.mp4")
    if not os.path.exists(path):
        gen = os.path.join(ROOT, "tools", "genvideo")
        subprocess.run(
            [gen, path, "160", "128", "8", "30", "4", "0", "26", "11", "1"],
            check=True,
            capture_output=True,
        )
    data = open(path, "rb").read()
    s = demux(data)
    assert s is not None and s.sps_list and s.pps_list
    slice_nals = [n for n in s.nals if n.nal_type in (1, 5)]
    assert len(slice_nals) == 8  # one slice per frame
    for n in s.nals:
        # every span's header byte parses to the advertised type
        assert (data[n.offset] & 0x1F) == n.nal_type
        assert n.offset + n.size <= len(data)


def test_demux_garbage():
    assert demux(b"") is None
    assert demux(b"\x00" * 64) is None
    # truncated mp4 headers must not crash
    path = os.path.join(ROOT, "data", "rt_tiny.mp4")
    data = open(path, "rb").read()
    for cut in (8, 40, 200):
        try:
            demux(data[:cut])
        except Exception:
            pass  # raising is fine (compress catches); crashing is not


def test_corrupt_container_raises_typed_error():
    """Corrupt/truncated .avtr input must raise ContainerError, never
    IndexError/AssertionError or silent wrong output (ADVICE r1)."""
    import pytest

    from avrecode_tpu.codec import compress, decompress
    from avrecode_tpu.utils.container import ContainerError

    with pytest.raises(ContainerError):
        decompress(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ContainerError):
        decompress(b"AVTR\x63\x00\x00\x00")  # bad version
    # truncations of a real container: typed error or (rarely) a clean
    # ValueError from a semantically-valid-but-nonsense prefix
    clip = os.path.join(ROOT, "data", "rt_tiny.mp4")
    with open(clip, "rb") as f:
        blob = compress(f.read())
    for cut in (5, 9, len(blob) // 2, len(blob) - 3):
        try:
            decompress(blob[:cut])
        except (ContainerError, ValueError):
            pass
        else:
            raise AssertionError(f"truncation at {cut} silently succeeded")
    # unbounded varint
    r = Reader(b"\xff" * 12)
    with pytest.raises(ContainerError):
        r.varint()
