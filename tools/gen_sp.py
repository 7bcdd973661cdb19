#!/usr/bin/env python3
"""Hand-author an Annex-B H.264 CABAC stream with SP and SI slices
(Extended-profile switching slices, slice_type 3/4).

x264 cannot emit SP/SI; the stream is written by the framework's
decompress-direction slice parser driving a scripted model (the gen_pcm.py
method): an IDR I frame, SP frames mixing P_Skip / P_16x16 (zero mvd) /
intra MBs, and an SI frame whose MBs are SI (Intra_4x4 content) with a few
escaping to regular I types through the prefix-bin binarization.

SP slices parse exactly like P slices (the qs domain only changes
reconstruction); SI adds the Table 9-11 ctxIdxOffset-0 prefix bin.  The
result is validated against the libavcodec decode oracle where libavcodec
supports the syntax.

Usage: python tools/gen_sp.py out.264 [WxH_mbs]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from avrecode_tpu.h264.coders import DecompressCoder
from avrecode_tpu.h264.mbparse import PicState, SliceParser
from avrecode_tpu.h264.params import SPS, PPS
from avrecode_tpu.h264.slicehdr import SliceHeader
from avrecode_tpu.utils.bitio import BitWriter, escape_rbsp

from gen_mono import ScriptModel, _trail


def build_sps_pps(w_mbs, h_mbs):
    w = BitWriter()
    w.u(88, 8)  # profile_idc Extended (the SP/SI profile)
    w.u(0, 8)
    w.u(30, 8)
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps allowed
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    w.u(0, 1)  # frame_cropping
    w.u(0, 1)  # vui
    sps = bytes([0x67]) + escape_rbsp(_trail(w))

    w2 = BitWriter()
    w2.ue(0)  # pps_id
    w2.ue(0)  # sps_id
    w2.u(1, 1)  # entropy_coding_mode = CABAC
    w2.u(0, 1)
    w2.ue(0)  # num_slice_groups_minus1
    w2.ue(0)  # num_ref_idx_l0_default_minus1
    w2.ue(0)
    w2.u(0, 1)  # weighted_pred
    w2.u(0, 2)
    w2.se(0)  # pic_init_qp_minus26
    w2.se(0)  # pic_init_qs_minus26
    w2.se(0)  # chroma_qp_offset
    w2.u(0, 1)  # deblocking_control_present
    w2.u(0, 1)
    w2.u(0, 1)
    pps = bytes([0x68]) + escape_rbsp(_trail(w2))
    return sps, pps


def _header_bits(w, slice_type_code, frame_num, idr, qp, sp=False, si=False):
    w.ue(0)  # first_mb_in_slice
    w.ue(slice_type_code)
    w.ue(0)  # pps_id
    w.u(frame_num & 15, 4)
    if idr:
        w.ue(0)  # idr_pic_id
    if slice_type_code in (0, 3):  # P/SP: num_ref_idx override + reordering
        w.u(0, 1)  # num_ref_idx_active_override_flag
        w.u(0, 1)  # ref_pic_list_modification_flag_l0
    if idr:
        w.u(0, 1)
        w.u(0, 1)
    else:
        w.u(0, 1)  # adaptive_ref_pic_marking_mode
    if slice_type_code not in (2, 7, 4, 9):  # not I/SI: cabac_init_idc
        w.ue(0)
    w.se(qp - 26)  # slice_qp_delta
    if sp:
        w.u(0, 1)  # sp_for_switch_flag
    if sp or si:
        w.se(0)  # slice_qs_delta
    w.align_with(1)


def build_i_slice(w_mbs, h_mbs, qp=26):
    sps = SPS(profile_idc=88, pic_width_in_mbs=w_mbs,
              pic_height_in_map_units=h_mbs, log2_max_frame_num=4,
              pic_order_cnt_type=2, frame_mbs_only_flag=1)
    pps = PPS(entropy_coding_mode_flag=1, pic_init_qp=26)
    hdr = SliceHeader(first_mb_in_slice=0, slice_type=2, pps_id=0,
                      idr=True, slice_qp=qp)
    n = w_mbs * h_mbs
    script = {"imbtype": [1] * n, "i16pm1": [1] * n}
    coder = DecompressCoder(qp, None, ScriptModel(script))
    pic = PicState(w_mbs, h_mbs)
    SliceParser(sps, pps, hdr, pic, None, coder, 1).parse_slice_data(n)
    w = BitWriter()
    _header_bits(w, 7, 0, True, qp)
    return bytes([0x65]) + escape_rbsp(w.bytes() + coder.payload()), pic


def build_sp_slice(w_mbs, h_mbs, frame_num, prev, qp=26):
    """SP slice: alternating P_Skip and P_16x16 (zero mvd), one intra MB."""
    sps = SPS(profile_idc=88, pic_width_in_mbs=w_mbs,
              pic_height_in_map_units=h_mbs, log2_max_frame_num=4,
              pic_order_cnt_type=2, frame_mbs_only_flag=1)
    pps = PPS(entropy_coding_mode_flag=1, pic_init_qp=26)
    hdr = SliceHeader(first_mb_in_slice=0, slice_type=3, pps_id=0,
                      idr=False, slice_qp=qp, cabac_init_idc=0)
    n = w_mbs * h_mbs
    kinds = ["skip" if i % 3 == 0 else "intra" if i == n - 1 else "p16"
             for i in range(n)]
    script = {
        "skip": [1 if k == "skip" else 0 for k in kinds],
        # P prefix: 1 -> intra branch; 0 0 0 -> P_16x16
        "pmbtype0": [1 if k == "intra" else 0
                     for k in kinds if k != "skip"],
        "pmbtype_intra": [1] * sum(1 for k in kinds if k == "intra"),
        "i16pm1": [1] * sum(1 for k in kinds if k == "intra"),
    }
    coder = DecompressCoder(qp, 0, ScriptModel(script))
    pic = PicState(w_mbs, h_mbs)
    SliceParser(sps, pps, hdr, pic, prev, coder, 1).parse_slice_data(n)
    w = BitWriter()
    _header_bits(w, 3, frame_num, False, qp, sp=True)
    return bytes([0x61]) + escape_rbsp(w.bytes() + coder.payload()), pic


def build_si_slice(w_mbs, h_mbs, frame_num, prev, qp=26):
    """SI slice: mostly SI MBs; a few escape to I_16x16 via the prefix."""
    sps = SPS(profile_idc=88, pic_width_in_mbs=w_mbs,
              pic_height_in_map_units=h_mbs, log2_max_frame_num=4,
              pic_order_cnt_type=2, frame_mbs_only_flag=1)
    pps = PPS(entropy_coding_mode_flag=1, pic_init_qp=26)
    hdr = SliceHeader(first_mb_in_slice=0, slice_type=4, pps_id=0,
                      idr=False, slice_qp=qp)
    n = w_mbs * h_mbs
    esc = {i for i in range(n) if i % 5 == 2}
    script = {
        "simbtype": [1 if i in esc else 0 for i in range(n)],
        "imbtype": [1] * len(esc),  # escaped MBs become I_16x16
        "i16pm1": [1] * len(esc),
        # SI MBs are Intra_4x4: predicted mode flag for all 16 blocks
        "ipredf": [1] * (16 * (n - len(esc))),
    }
    coder = DecompressCoder(qp, None, ScriptModel(script))
    pic = PicState(w_mbs, h_mbs)
    SliceParser(sps, pps, hdr, pic, prev, coder, 1).parse_slice_data(n)
    w = BitWriter()
    _header_bits(w, 4, frame_num, False, qp, si=True)
    return bytes([0x61]) + escape_rbsp(w.bytes() + coder.payload()), pic


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data/spsi.264"
    dims = sys.argv[2] if len(sys.argv) > 2 else "6x4"
    w_mbs, h_mbs = (int(v) for v in dims.split("x"))
    sps, pps = build_sps_pps(w_mbs, h_mbs)
    sc = b"\x00\x00\x00\x01"
    blob = bytearray(sc + sps + sc + pps)
    s, pic = build_i_slice(w_mbs, h_mbs)
    blob += sc + s
    for f in (1, 2):
        s, pic = build_sp_slice(w_mbs, h_mbs, f, pic)
        blob += sc + s
    s, pic = build_si_slice(w_mbs, h_mbs, 3, pic)
    blob += sc + s
    s, pic = build_sp_slice(w_mbs, h_mbs, 4, pic)
    blob += sc + s
    with open(out, "wb") as fh:
        fh.write(bytes(blob))
    print(f"wrote {out}: {len(blob)} bytes (I + SP,SP + SI + SP), "
          f"{w_mbs}x{h_mbs} MBs")


if __name__ == "__main__":
    main()
