#!/usr/bin/env python3
"""Hand-author an Annex-B H.264 CABAC stream containing I_PCM macroblocks.

x264 cannot be coaxed into emitting I_PCM (measured in round 2: qp 1-4 on
pure noise never triggers it), so the end-to-end PCM test stream is written
by the framework's own spec-exact CABAC machinery: the DECOMPRESS-direction
slice parser drives a scripted model, which makes it a conformant slice
WRITER with every context derivation handled by the production code.  The
result is validated against the libavcodec decode oracle
(tools/mbtype_oracle shows 'P' macroblocks) before tests rely on it.

Usage: python tools/gen_pcm.py out.264 [WxH_mbs] [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from avrecode_tpu.h264.coders import DecompressCoder
from avrecode_tpu.h264.mbparse import PicState, SliceParser
from avrecode_tpu.h264.params import SPS, PPS
from avrecode_tpu.h264.slicehdr import SliceHeader
from avrecode_tpu.utils.bitio import BitWriter, escape_rbsp


class ScriptModel:
    """Model stub: pops scripted bit values per key class (default 0)."""

    def __init__(self, script):
        self.script = {k: list(v) for k, v in script.items()}

    def get_bit(self, key, pcab=None):
        q = self.script.get(key[0])
        return q.pop(0) if q else 0

    def get_nnz(self, cat, max_coeff, prior):
        return 1  # only used when a cbf bit was scripted to 1


def build_sps_pps(w_mbs, h_mbs, mbaff=False):
    w = BitWriter()
    w.u(77, 8)  # profile_idc main (CABAC-capable)
    w.u(0, 8)  # constraint flags
    w.u(30, 8)  # level
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2 (no poc bits in slice headers)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps allowed
    w.ue(w_mbs - 1)
    w.ue((h_mbs // 2 if mbaff else h_mbs) - 1)  # map units = pair rows
    w.u(0 if mbaff else 1, 1)  # frame_mbs_only
    if mbaff:
        w.u(1, 1)  # mb_adaptive_frame_field
    w.u(1, 1)  # direct_8x8_inference
    w.u(0, 1)  # frame_cropping
    w.u(0, 1)  # vui
    sps = bytes([0x67]) + escape_rbsp(_trail(w))

    w2 = BitWriter()
    w2.ue(0)  # pps_id
    w2.ue(0)  # sps_id
    w2.u(1, 1)  # entropy_coding_mode = CABAC
    w2.u(0, 1)  # bottom_field_pic_order
    w2.ue(0)  # num_slice_groups_minus1
    w2.ue(0)  # num_ref_idx_l0_default_minus1
    w2.ue(0)  # l1
    w2.u(0, 1)  # weighted_pred
    w2.u(0, 2)  # weighted_bipred
    w2.se(0)  # pic_init_qp_minus26
    w2.se(0)  # pic_init_qs
    w2.se(0)  # chroma_qp_offset
    w2.u(0, 1)  # deblocking_control_present
    w2.u(0, 1)  # constrained_intra
    w2.u(0, 1)  # redundant_pic_cnt_present
    pps = bytes([0x68]) + escape_rbsp(_trail(w2))
    return sps, pps


def _trail(w):
    w.u(1, 1)  # rbsp_stop_one_bit
    w.align_with(0)
    return w.bytes()


def build_slice(w_mbs, h_mbs, frame_num, idr, pcm_positions, qp=26,
                mbaff=False, field_pairs=()):
    """One I slice covering the picture; MBs at pcm_positions are I_PCM,
    the rest are 'empty' I_16x16 (no residual).  mbaff: MB pairs, with
    field_pairs (pair indices) coded as field pairs."""
    sps = SPS(profile_idc=77, pic_width_in_mbs=w_mbs,
              pic_height_in_map_units=h_mbs // 2 if mbaff else h_mbs,
              log2_max_frame_num=4, pic_order_cnt_type=2,
              frame_mbs_only_flag=0 if mbaff else 1,
              mb_adaptive_frame_field_flag=1 if mbaff else 0)
    pps = PPS(entropy_coding_mode_flag=1, pic_init_qp=26)
    hdr = SliceHeader(first_mb_in_slice=0, slice_type=2, pps_id=0,
                      idr=idr, slice_qp=qp, mbaff=mbaff)
    n_mbs = w_mbs * h_mbs
    script = {
        "imbtype": [1] * n_mbs,  # every MB leaves the I_NxN branch
        "pcmf": [1 if i in pcm_positions else 0 for i in range(n_mbs)],
        # Intra_16x16 pred mode DC (=2, pm1=1 pm0=0): the only mode valid
        # without neighbors — a conformance requirement, not a ctx one
        "i16pm1": [1] * n_mbs,
        "pcm": [],
    }
    if mbaff:
        # I slices read the field flag at every pair top: one value per pair
        n_pairs = n_mbs // 2
        script["fieldf"] = [1 if p in field_pairs else 0
                            for p in range(n_pairs)]
        # decode order is pair raster: remap pcm_positions (given in MB
        # raster indices) to scripted pcmf order
        order = []
        for pair in range(n_pairs):
            px, py = pair % w_mbs, pair // w_mbs
            order.append((2 * py) * w_mbs + px)      # top
            order.append((2 * py + 1) * w_mbs + px)  # bottom
        script["pcmf"] = [1 if i in pcm_positions else 0 for i in order]
        pcm_positions = [i for i in order if i in pcm_positions]
    # deterministic sample pattern, different per PCM mb
    for k, i in enumerate(sorted(pcm_positions)):
        for j in range(384):
            byte = (i * 37 + j * 11 + k) & 0xFF
            script["pcm"].extend((byte >> (7 - b)) & 1 for b in range(8))
    model = ScriptModel(script)
    coder = DecompressCoder(qp, None, model)
    pic = PicState(w_mbs, h_mbs)
    parser = SliceParser(sps, pps, hdr, pic, None, coder, 1)
    parser.parse_slice_data(mb_count=n_mbs)
    payload = coder.payload()

    w = BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I (all slices in picture)
    w.ue(0)  # pps_id
    w.u(frame_num & 15, 4)  # frame_num
    if mbaff:
        w.u(0, 1)  # field_pic_flag = 0 (MBAFF frame)
    if idr:
        w.ue(0)  # idr_pic_id
    # poc type 2: nothing
    if idr:
        w.u(0, 1)  # no_output_of_prior_pics
        w.u(0, 1)  # long_term_reference
    else:
        w.u(0, 1)  # adaptive_ref_pic_marking_mode
    w.se(qp - 26)  # slice_qp_delta
    w.align_with(1)  # cabac_alignment_one_bit
    head = w.bytes()
    nal_hdr = 0x65 if idr else 0x61  # ref_idc 3, type 5/1
    return bytes([nal_hdr]) + escape_rbsp(head + payload)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data/pcm.264"
    dims = sys.argv[2] if len(sys.argv) > 2 else "4x3"
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    mbaff = len(sys.argv) > 4 and sys.argv[4] == "mbaff"
    w_mbs, h_mbs = (int(v) for v in dims.split("x"))
    sps, pps = build_sps_pps(w_mbs, h_mbs, mbaff)
    sc = b"\x00\x00\x00\x01"
    blob = bytearray(sc + sps + sc + pps)
    n = w_mbs * h_mbs
    for f in range(n_frames):
        # PCM positions vary per frame: corners, center, a full row
        pcm = {
            0: {0, n - 1, n // 2},
            1: set(range(min(w_mbs, n))),  # whole top row
            2: {1, w_mbs, n - 2},
        }.get(f % 3, {f % n})
        fp = {0, (n // 2) // w_mbs * 0 + 1, n // 2 - 1} if mbaff else ()
        blob += sc + build_slice(w_mbs, h_mbs, f, f == 0, pcm, mbaff=mbaff,
                                 field_pairs=fp)
    with open(out, "wb") as fh:
        fh.write(bytes(blob))
    print(f"wrote {out}: {len(blob)} bytes, {n_frames} frames, "
          f"{w_mbs}x{h_mbs} MBs")


if __name__ == "__main__":
    main()
