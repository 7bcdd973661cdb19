#!/usr/bin/env python3
"""Hand-author an Annex-B H.264 CABAC stream of PAFF field pictures.

x264 emits only MBAFF for interlaced content (no PAFF field pictures), so
— exactly like the I_PCM bring-up (gen_pcm.py) — the PAFF test stream is
written by the framework's own spec-exact CABAC machinery: the
DECOMPRESS-direction slice parser drives a scripted model, producing
conformant field slices with field context rows (sig/last scans, chroma
DC rows, cbf/nnz field key dimension) selected throughout.  Validated
against the libavcodec decode oracle (tools/mbtype_oracle prints '='
field markers per MB) before tests rely on it.

Each frame becomes a top field picture followed by a bottom field picture
(field_pic_flag=1), each a half-height picture in its own right.  MBs are
I_16x16 with scripted luma-DC and chroma-DC residuals so the field
significance-map context rows are actually exercised, plus optional I_PCM
MBs (PAFF + PCM composition).

Usage: python tools/gen_paff.py out.264 [WxH_mbs] [n_frames]
       (H = FRAME height in MBs, must be even; fields are H/2)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from avrecode_tpu.h264.coders import DecompressCoder
from avrecode_tpu.h264.mbparse import PicState, SliceParser
from avrecode_tpu.h264.params import SPS, PPS
from avrecode_tpu.h264.slicehdr import SliceHeader
from avrecode_tpu.utils.bitio import BitWriter, escape_rbsp

from gen_pcm import ScriptModel, _trail  # noqa: E402 (same directory)


def build_sps_pps(w_mbs, frame_h_mbs):
    w = BitWriter()
    w.u(77, 8)  # profile_idc main (CABAC-capable)
    w.u(0, 8)
    w.u(30, 8)  # level
    w.ue(0)  # sps_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type 2
    w.ue(2)  # max_num_ref_frames (two fields)
    w.u(0, 1)  # gaps allowed
    w.ue(w_mbs - 1)
    w.ue(frame_h_mbs // 2 - 1)  # map units = MB pair rows
    w.u(0, 1)  # frame_mbs_only = 0
    w.u(0, 1)  # mb_adaptive_frame_field = 0  -> pure PAFF
    w.u(1, 1)  # direct_8x8_inference (required when !frame_mbs_only)
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


def build_field_slice(w_mbs, frame_h_mbs, frame_num, idr, bottom,
                      pcm_positions=(), qp=26):
    """One I slice covering a whole field picture (w x frame_h/2 MBs).

    Every non-PCM MB is I_16x16 with a scripted luma-DC + two chroma-DC
    coded blocks (one coefficient each, landing on the last scan position),
    so the FIELD significance/last context rows and the field dimension of
    the cbf/nnz model keys are exercised on every macroblock."""
    field_h = frame_h_mbs // 2
    sps = SPS(profile_idc=77, pic_width_in_mbs=w_mbs,
              pic_height_in_map_units=field_h,
              log2_max_frame_num=4, pic_order_cnt_type=2,
              frame_mbs_only_flag=0, mb_adaptive_frame_field_flag=0)
    pps = PPS(entropy_coding_mode_flag=1, pic_init_qp=26)
    hdr = SliceHeader(first_mb_in_slice=0, slice_type=2, pps_id=0,
                      idr=idr, slice_qp=qp, field_pic=True,
                      bottom_field=bottom)
    n_mbs = w_mbs * field_h
    script = {
        "imbtype": [1] * n_mbs,      # leave the I_NxN branch
        "pcmf": [1 if i in pcm_positions else 0 for i in range(n_mbs)],
        "i16pm1": [1] * n_mbs,       # DC pred (valid without neighbors)
        "i16cbf": [1] * n_mbs,       # luma DC residual coded
        "i16cbc0": [1] * n_mbs,      # cbp_chroma = 1 (chroma DC coded)
        "cbf": [1, 1, 1] * n_mbs,    # luma DC + 2 chroma DC blocks
        "pcm": [],
    }
    for k, i in enumerate(sorted(pcm_positions)):
        for j in range(384):
            byte = (i * 41 + j * 13 + k) & 0xFF
            script["pcm"].extend((byte >> (7 - b)) & 1 for b in range(8))
    model = ScriptModel(script)
    coder = DecompressCoder(qp, None, model)
    pic = PicState(w_mbs, field_h)
    parser = SliceParser(sps, pps, hdr, pic, None, coder, 1)
    parser.parse_slice_data(mb_count=n_mbs)
    payload = coder.payload()

    w = BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type I (all slices in picture)
    w.ue(0)  # pps_id
    w.u(frame_num & 15, 4)  # frame_num
    w.u(1, 1)  # field_pic_flag = 1
    w.u(1 if bottom else 0, 1)  # bottom_field_flag
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
    out = sys.argv[1] if len(sys.argv) > 1 else "data/paff.264"
    dims = sys.argv[2] if len(sys.argv) > 2 else "4x4"
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    w_mbs, h_mbs = (int(v) for v in dims.split("x"))
    assert h_mbs % 2 == 0, "frame height in MBs must be even for PAFF"
    sps, pps = build_sps_pps(w_mbs, h_mbs)
    sc = b"\x00\x00\x00\x01"
    blob = bytearray(sc + sps + sc + pps)
    n = w_mbs * (h_mbs // 2)
    for f in range(n_frames):
        # a couple of I_PCM MBs in later fields: PAFF + PCM composition
        pcm_top = {0, n - 1} if f == 1 else set()
        pcm_bot = {n // 2} if f == 2 else set()
        blob += sc + build_field_slice(w_mbs, h_mbs, f, f == 0, False,
                                       pcm_top)
        blob += sc + build_field_slice(w_mbs, h_mbs, f, False, True,
                                       pcm_bot)
    with open(out, "wb") as fh:
        fh.write(bytes(blob))
    print(f"wrote {out}: {len(blob)} bytes, {n_frames} frames "
          f"({2 * n_frames} field pictures), {w_mbs}x{h_mbs // 2} MBs/field")


if __name__ == "__main__":
    main()
