"""In-band parameter-set handling: a crafted Annex-B stream that redefines
its SPS with different content mid-stream must still roundtrip bit-exact —
the compressor stops recoding at the conflict (first-definition-wins
contract with the decompressor)."""

import os
import subprocess

from avrecode_tpu.codec import compress, decompress
from avrecode_tpu.utils.container import KIND_END, KIND_LITERAL, KIND_SLICE, Reader
from avrecode_tpu.utils.mp4 import demux


def _n_slice_blocks(comp):
    r = Reader(comp)
    r.pos = 8
    r.varint()  # substream_bins (v2)
    for _ in range(r.varint()):
        r.blob()
    for _ in range(r.varint()):
        r.blob()
    n = 0
    while True:
        kind = r.u8()
        if kind == KIND_END:
            return n
        if kind == KIND_LITERAL:
            r.blob()
        else:
            n += 1
            r.varint()
            r.blob()
            r.varint()
            r.varint()
            r.blob()
            for _ in range(r.varint()):  # v6 TS segmentation entries
                r.varint(), r.blob()
            r.blob()  # gop stream slot

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _annexb_from_clip():
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
    sc = b"\x00\x00\x00\x01"
    out = bytearray()
    out += sc + bytes(s.sps_list[0])
    out += sc + bytes(s.pps_list[0])
    nals = [data[n.offset : n.offset + n.size] for n in s.nals if n.nal_type in (1, 5)]
    for n in nals:
        out += sc + n
    return bytes(out), bytes(s.sps_list[0]), bytes(s.pps_list[0]), nals


def test_annexb_roundtrip():
    stream, _, _, _ = _annexb_from_clip()
    comp = compress(stream, scope="gop")
    assert decompress(comp) == stream
    assert _n_slice_blocks(comp) == 8  # slices actually recoded


def test_conflicting_inband_sps_roundtrips():
    stream, sps, pps, nals = _annexb_from_clip()
    # redefine the SPS with different content (bump level_idc byte) and
    # replay the same slices after it — a decoder would misparse them, and
    # so would our decompressor if compression kept recoding
    sps2 = bytearray(sps)
    sps2[3] ^= 0x02  # level_idc tweak
    sc = b"\x00\x00\x00\x01"
    evil = bytearray(stream)
    evil += sc + bytes(sps2)
    for n in nals:
        evil += sc + n
    evil = bytes(evil)
    comp = compress(evil, scope="gop")
    assert decompress(comp) == evil

    # native path agrees byte-for-byte
    from avrecode_tpu.host import native

    if native.available():
        nat = native.compress(evil, "gop")
        assert nat == comp
        assert native.decompress(nat) == evil


def test_repeated_identical_inband_sets_ok():
    stream, sps, pps, nals = _annexb_from_clip()
    # identical repetitions (the common streaming pattern) must NOT poison
    sc = b"\x00\x00\x00\x01"
    rep = bytearray()
    rep += sc + sps + sc + pps
    for i, n in enumerate(nals):
        if i % 2 == 0:
            rep += sc + sps + sc + pps  # repeat before keyframes etc.
        rep += sc + n
    rep = bytes(rep)
    comp = compress(rep, scope="gop")
    assert decompress(comp) == rep
    assert _n_slice_blocks(comp) == 8  # still recoding (no poisoning)


def test_mutated_nal_becomes_inband_sps():
    """Regression (fuzz-found): a bit flip can turn a mid-stream NAL into an
    'in-band' SPS/PPS with a fresh id; compression parses it and may recode
    later slices against it, so the container must carry every parameter set
    seen during the walk — otherwise decompression dies on 'unknown SPS'."""
    import os

    from avrecode_tpu.host import native

    path = os.path.join(ROOT, "data", "rt_tiny.mp4")
    data = bytearray(open(path, "rb").read())
    s = demux(bytes(data))
    # flip a middle slice NAL's header into nal_type 7 (SPS), keeping the
    # payload as-is: parses as garbage-but-valid SPS with some id, or fails
    # parse — either way roundtrip must hold
    slices = [n for n in s.nals if n.nal_type in (1, 5)]
    victim = slices[len(slices) // 2]
    data[victim.offset] = (data[victim.offset] & 0xE0) | 7
    blob = bytes(data)

    comp = compress(blob, scope="gop")
    assert decompress(comp) == blob
    if native.available():
        nat = native.compress(blob, "gop")
        assert nat == comp
        assert native.decompress(nat) == blob
