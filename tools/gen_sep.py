#!/usr/bin/env python3
"""Hand-author an Annex-B H.264 CABAC stream with SEPARATE COLOUR PLANES
(High 4:4:4, chroma_format_idc = 3 + separate_colour_plane_flag = 1):
each picture is three full-size slices, colour_plane_id 0/1/2, each coded
with ChromaArrayType 0 (monochrome) semantics per spec 7.4.2.1.1.

x264 cannot emit this syntax; the stream is written by the framework's
decompress-direction slice parser driving a scripted model (the gen_pcm.py
method) and validated against the libavcodec decode oracle.

Usage: python tools/gen_sep.py out.264 [WxH_mbs] [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from avrecode_tpu.h264.coders import DecompressCoder
from avrecode_tpu.h264.mbparse import PicState, SliceParser
from avrecode_tpu.h264.params import SPS, PPS
from avrecode_tpu.h264.slicehdr import SliceHeader
from avrecode_tpu.utils.bitio import BitWriter, escape_rbsp

from gen_mono import ScriptModel, _trail  # same scripting machinery


def build_sps_pps(w_mbs, h_mbs):
    w = BitWriter()
    w.u(244, 8)  # profile_idc High 4:4:4 Predictive
    w.u(0, 8)
    w.u(30, 8)  # level
    w.ue(0)  # sps_id
    w.ue(3)  # chroma_format_idc = 3
    w.u(1, 1)  # separate_colour_plane_flag = 1
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.u(0, 1)  # qpprime_y_zero_transform_bypass
    w.u(0, 1)  # seq_scaling_matrix_present
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


def build_plane_slice(w_mbs, h_mbs, frame_num, idr, plane, qp=26):
    """One full-picture I slice for colour plane `plane` (monochrome
    coding).  MB mix varies per plane so the three planes differ."""
    sps = SPS(profile_idc=244, chroma_format_idc=3,
              separate_colour_plane_flag=1, pic_width_in_mbs=w_mbs,
              pic_height_in_map_units=h_mbs, log2_max_frame_num=4,
              pic_order_cnt_type=2, frame_mbs_only_flag=1)
    pps = PPS(entropy_coding_mode_flag=1, pic_init_qp=26)
    hdr = SliceHeader(first_mb_in_slice=0, slice_type=2, pps_id=0,
                      idr=idr, slice_qp=qp, colour_plane_id=plane)
    n_mbs = w_mbs * h_mbs
    kinds = ["nxn" if (i + plane) % 5 == 0 else
             "pcm" if (i + plane) % 9 == 4 else
             "i16c" if (i + plane) % 2 == 1 else "i16"
             for i in range(n_mbs)]
    script = {
        "imbtype": [0 if k == "nxn" else 1 for k in kinds],
        "pcmf": [1 if k == "pcm" else 0 for k in kinds if k != "nxn"],
        "i16cbf": [1 if k == "i16c" else 0
                   for k in kinds if k in ("i16", "i16c")],
        "i16pm1": [1] * n_mbs,
        "ipredf": [1] * (16 * sum(1 for k in kinds if k == "nxn")),
        "pcm": [],
    }
    for k, i in enumerate(sorted(i for i, kk in enumerate(kinds)
                                 if kk == "pcm")):
        for j in range(256):  # plane-only samples
            byte = (i * 29 + j * 17 + plane * 3 + k) & 0xFF
            script["pcm"].extend((byte >> (7 - b)) & 1 for b in range(8))
    model = ScriptModel(script)
    coder = DecompressCoder(qp, None, model)
    pic = PicState(w_mbs, h_mbs)
    parser = SliceParser(sps, pps, hdr, pic, None, coder, 1)
    parser.parse_slice_data(mb_count=n_mbs)
    payload = coder.payload()

    w = BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I
    w.ue(0)  # pps_id
    w.u(plane, 2)  # colour_plane_id
    w.u(frame_num & 15, 4)  # frame_num
    if idr:
        w.ue(0)  # idr_pic_id
    if idr:
        w.u(0, 1)  # no_output_of_prior_pics
        w.u(0, 1)  # long_term_reference
    else:
        w.u(0, 1)  # adaptive_ref_pic_marking_mode
    w.se(qp - 26)  # slice_qp_delta
    w.align_with(1)  # cabac_alignment_one_bit
    head = w.bytes()
    nal_hdr = 0x65 if idr else 0x61
    return bytes([nal_hdr]) + escape_rbsp(head + payload)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data/sep.264"
    dims = sys.argv[2] if len(sys.argv) > 2 else "5x4"
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    w_mbs, h_mbs = (int(v) for v in dims.split("x"))
    sps, pps = build_sps_pps(w_mbs, h_mbs)
    sc = b"\x00\x00\x00\x01"
    blob = bytearray(sc + sps + sc + pps)
    for f in range(n_frames):
        for plane in range(3):
            blob += sc + build_plane_slice(w_mbs, h_mbs, f, f == 0, plane)
    with open(out, "wb") as fh:
        fh.write(bytes(blob))
    print(f"wrote {out}: {len(blob)} bytes, {n_frames} frames x 3 planes, "
          f"{w_mbs}x{h_mbs} MBs")


if __name__ == "__main__":
    main()
