#!/usr/bin/env python3
"""MBAFF bring-up differ: parse every slice of a clip with the owned parser
and report, per slice, full-parse status; for the first failing slice, diff
per-MB decisions (class/partition/field) against the libavcodec decode
oracle's FF_DEBUG_MB_TYPE map (tools/mbtype_oracle) in decode order and print
the first mismatching macroblock.

The oracle prints frames in OUTPUT order; pass --frame to pick the oracle
frame index for the failing slice (default: decode index, correct for
P-only/B-disabled clips).

Usage: python tools/mbaff_diff.py clip.mp4 [--nal N] [--frame F]
"""
import re
import subprocess
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from avrecode_tpu.h264.stream import StreamWalker
from avrecode_tpu.h264.coders import CompressCoder

CH = {0: '?', 1: 'S', 2: 's', 3: 'D', 4: 'X', 5: 'i', 6: 'I', 7: 'P'}
PM = {'P16x16': ' ', 'P16x8': '-', 'P8x16': '|', 'P8x8': '+'}


def oracle_frames(path):
    out = subprocess.run(
        [os.path.join(os.path.dirname(__file__), 'mbtype_oracle'), path],
        capture_output=True, text=True).stderr
    frames, cur = [], None
    for line in out.splitlines():
        if 'New frame' in line:
            if cur:
                frames.append(cur)
            cur = []
        elif cur is not None:
            m = re.match(r'\[h264 @ [^\]]+\] ([iIPSsDdXA<>gG].*)$', line)
            if m and len(m.group(1)) >= 10:
                cur.append(m.group(1))
    if cur:
        frames.append(cur)
    return frames


def run(path, want_nal=None, want_frame=None):
    data = open(path, 'rb').read()
    w = StreamWalker(data)
    decode_idx = -1
    for rec in w.slices():
        decode_idx += 1
        coder = CompressCoder(
            rec.rbsp[rec.cabac_offset:], rec.header.slice_qp,
            None if rec.header.slice_type == 2 else rec.header.cabac_init_idc)
        p = w.make_parser(rec, coder)
        parts = {}
        oip = p._parse_inter_pred
        def pip(info, p=p, parts=parts):
            parts[(p.mbx, p.mby)] = info[0] if info[0] != 'B' else ('B', info[1])
            return oip(info)
        p._parse_inter_pred = pip
        try:
            n = p.parse_slice_data()
        except Exception as e:
            n = -1
            err = repr(e)[:50]
        else:
            err = ''
        ok, drop, tail = coder.verify_tail()
        total = p.W * p.H
        full = n == total and ok and len(tail) <= 2
        print(f"nal {rec.nal_index:3d} decode {decode_idx:3d} type {rec.header.slice_type} "
              f"mbs {n:5d}/{total} tail {len(tail) if ok else -1:5d} "
              f"{'FULL' if full else 'BAD ' + err}")
        if full or (want_nal is not None and rec.nal_index != want_nal):
            continue
        # diff vs oracle
        fi = want_frame if want_frame is not None else decode_idx
        frames = oracle_frames(path)
        if fi >= len(frames):
            print('  (oracle frame %d unavailable)' % fi)
            return
        W, H = p.W, p.H
        o = [[(r[3 * i], r[3 * i + 1], r[3 * i + 2]) for i in range(W)]
             for r in frames[fi]]
        pic = p.pic
        mm = {'S': 'Ss', 'd': 's', 'D': 'D', 'X': 'X', '>': 'X', '<': 'X',
              'i': 'i', 'I': 'I', 'A': 'iI', 'P': 'P'}
        k = 0
        for py in range(H // 2):
            for x in range(W):
                for b in (0, 1):
                    y = 2 * py + b
                    oc, op, of = o[y][x]
                    rc = CH[int(pic.mbclass[y, x])]
                    rf = '=' if pic.field[y, x] else ' '
                    okc = rc in mm.get(oc, '?') and of == rf
                    rp = PM.get(parts.get((x, y)), None)
                    if okc and rc == 'X' and rp is not None and oc in '><X':
                        okc = rp == op
                    if not okc:
                        print(f'  first diff decode-pos {k} mb ({x},{y}) '
                              f'oracle {(oc, op, of)} ours {(rc, parts.get((x, y)), rf)}')
                        for yy in range(max(0, (y & ~1) - 2), min(H, (y & ~1) + 2)):
                            print('   oracle y%-2d ' % yy, ''.join(
                                ''.join(o[yy][xx]) for xx in range(max(0, x - 5), min(W, x + 3))))
                            print('   ours   y%-2d ' % yy, ''.join(
                                CH[int(pic.mbclass[yy, xx])] + PM.get(parts.get((xx, yy)), '.')
                                + ('=' if pic.field[yy, xx] else ' ')
                                for xx in range(max(0, x - 5), min(W, x + 3))))
                        return
                    k += 1
        print('  (no mb-level diff found vs oracle frame %d)' % fi)
        return


if __name__ == '__main__':
    nal = frame = None
    args = sys.argv[1:]
    if '--nal' in args:
        i = args.index('--nal'); nal = int(args[i + 1]); del args[i:i + 2]
    if '--frame' in args:
        i = args.index('--frame'); frame = int(args[i + 1]); del args[i:i + 2]
    run(args[0], nal, frame)
