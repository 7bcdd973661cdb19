#!/usr/bin/env python3
"""Extract ITU-T H.264 spec constant tables from the system libavcodec.

The tables extracted here are pure ITU-T Rec. H.264 specification constants
(Tables 9-12..9-33 context init values, Table 9-44 rangeTabLPS, Table 9-45
transIdxLPS, and the clause 9.3.3.1.1.9 significance-map index mappings).
We pull them from the installed Debian libavcodec static archive rather than
typing ~4000 magic numbers by hand, then regenerate a Python module with
provenance notes.  No code is copied — only ITU spec data.

Usage: python tools/extract_cabac_tables.py  (writes avrecode_tpu/ops/_tables_data.py)
"""
import subprocess
import struct
import tempfile
import os
import sys

ARCHIVE = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OUT = os.path.join(os.path.dirname(__file__), "..", "avrecode_tpu", "ops", "_tables_data.py")


def extract_objects(tmp):
    subprocess.run(["ar", "x", ARCHIVE, "h264_cabac.o", "cabac.o"], cwd=tmp, check=True)


def rodata_symbols(obj):
    """Return {name: (offset, size)} for .rodata object symbols."""
    out = subprocess.run(["objdump", "-t", obj], capture_output=True, text=True, check=True).stdout
    syms = {}
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 6 and parts[-3] == ".rodata" and "O" in parts[1:4]:
            # value  l/g  O  .rodata  size  name
            syms[parts[-1]] = (int(parts[0], 16), int(parts[-2], 16))
    return syms


def rodata_bytes(obj):
    """Dump the full .rodata section contents of obj."""
    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        binpath = f.name
    subprocess.run(
        ["objcopy", "-O", "binary", "--only-section=.rodata", obj, binpath],
        check=True,
    )
    with open(binpath, "rb") as f:
        data = f.read()
    os.unlink(binpath)
    return data


def grab(data, syms, name, size=None):
    off, sz = syms[name]
    if size is not None:
        assert sz == size, f"{name}: expected {size} got {sz}"
    return data[off : off + sz]


def as_i8(b):
    return list(struct.unpack(f"{len(b)}b", b))


def as_u8(b):
    return list(b)


def as_u32(b):
    return list(struct.unpack(f"<{len(b)//4}I", b))


def chunks(lst, n):
    return [lst[i : i + n] for i in range(0, len(lst), n)]


def main():
    tmp = tempfile.mkdtemp()
    extract_objects(tmp)
    hobj = os.path.join(tmp, "h264_cabac.o")
    cobj = os.path.join(tmp, "cabac.o")

    hsyms = rodata_symbols(hobj)
    hdata = rodata_bytes(hobj)
    csyms = rodata_symbols(cobj)
    cdata = rodata_bytes(cobj)

    # --- context init tables (spec Tables 9-12 .. 9-33): (m, n) int8 pairs ---
    init_i = chunks(as_i8(grab(hdata, hsyms, "cabac_context_init_I", 2048)), 2)
    init_pb_flat = chunks(as_i8(grab(hdata, hsyms, "cabac_context_init_PB", 6144)), 2)
    init_pb = chunks(init_pb_flat, 1024)  # [3][1024][2]

    # --- residual context offset tables (spec clause 9.3.3.1.3, Table 9-40) ---
    # indexed [frame/field][cat 0..13]
    def find(prefix):
        for k in hsyms:
            if k.startswith(prefix):
                return k
        raise KeyError(prefix)

    sig_off = chunks(as_u32(grab(hdata, hsyms, find("significant_coeff_flag_offset."), 112)), 14)
    last_off = chunks(as_u32(grab(hdata, hsyms, find("last_coeff_flag_offset."), 112)), 14)
    abs_off = as_u32(grab(hdata, hsyms, find("coeff_abs_level_m1_offset."), 56))
    sig8x8 = chunks(as_u8(grab(hdata, hsyms, find("significant_coeff_flag_offset_8x8."), 126)), 63)
    sig_dc = as_u8(grab(hdata, hsyms, find("sig_coeff_offset_dc."), 7))
    lvl1_ctx = as_u8(grab(hdata, hsyms, find("coeff_abs_level1_ctx."), 8))
    lvlgt1_ctx = as_u8(grab(hdata, hsyms, find("coeff_abs_levelgt1_ctx."), 16))
    lvl_transition = chunks(as_u8(grab(hdata, hsyms, find("coeff_abs_level_transition."), 16)), 8)

    # --- cabac.o blob: norm_shift[512] | lps_range[512] | mlps_state[256] | last8x8[63]
    blob = grab(cdata, csyms, "ff_h264_cabac_tables", 1343)
    lps_blob = blob[512:1024]
    mlps = as_u8(blob[1024:1280])
    last8x8 = as_u8(blob[1280:1343])

    # lps_blob layout: [q][2*sigma + mpsbit] with identical values for both mps bits.
    # Recover spec Table 9-44 rangeTabLPS[sigma][q].
    range_tab_lps = []
    for sigma in range(64):
        row = []
        for q in range(4):
            v0 = lps_blob[128 * q + 2 * sigma]
            v1 = lps_blob[128 * q + 2 * sigma + 1]
            assert v0 == v1, (sigma, q, v0, v1)
            row.append(v0)
        range_tab_lps.append(row)

    # mlps_state encodes both transition tables around index 128 with the
    # packed state s = 2*sigma + valMPS.
    # MPS: s' = mlps[128 + s];  LPS: s' = mlps[127 - s].
    trans_mps = []
    trans_lps = []
    for sigma in range(64):
        s = 2 * sigma  # valMPS = 0
        sp = mlps[128 + s]
        assert sp % 2 == 0
        trans_mps.append(sp // 2)
        # LPS from (sigma, mps=0): new packed state mlps[127 - s]
        sl = mlps[127 - s]
        if sigma == 0:
            # MPS flips at sigma==0: packed parity changes
            trans_lps.append(sl // 2)
        else:
            trans_lps.append(sl // 2)
    # sanity: spec says transIdxMPS = min(sigma+1, 62), except terminal 63->63
    for sigma in range(63):
        assert trans_mps[sigma] == min(sigma + 1, 62), (sigma, trans_mps[sigma])
    assert range_tab_lps[0] == [128, 176, 208, 240], range_tab_lps[0]

    with open(os.path.abspath(OUT), "w") as f:
        w = f.write
        w('"""GENERATED by tools/extract_cabac_tables.py — do not edit.\n\n')
        w("ITU-T Rec. H.264 specification constants (CABAC):\n")
        w("  CTX_INIT_I / CTX_INIT_PB  — Tables 9-12..9-33 (m, n) context init pairs\n")
        w("  RANGE_TAB_LPS             — Table 9-44 rangeTabLPS[pStateIdx][qCodIRangeIdx]\n")
        w("  TRANS_IDX_MPS/LPS         — Table 9-45 state transitions\n")
        w("  SIG_COEFF_*/LAST_COEFF_*  — clause 9.3.3.1.3 residual ctx index offsets\n")
        w("  (extracted from the system libavcodec archive's spec-data tables;\n")
        w("   reference parity: recode.cpp:683-822 uses the same spec data via ffmpeg)\n")
        w('"""\n\n')
        w(f"CTX_INIT_I = {init_i!r}\n\n")
        w(f"CTX_INIT_PB = {init_pb!r}\n\n")
        w(f"RANGE_TAB_LPS = {range_tab_lps!r}\n\n")
        w(f"TRANS_IDX_MPS = {trans_mps!r}\n\n")
        w(f"TRANS_IDX_LPS = {trans_lps!r}\n\n")
        w(f"SIG_COEFF_FLAG_OFFSET = {sig_off!r}\n\n")
        w(f"LAST_COEFF_FLAG_OFFSET = {last_off!r}\n\n")
        w(f"COEFF_ABS_LEVEL_M1_OFFSET = {abs_off!r}\n\n")
        w(f"SIG_COEFF_FLAG_OFFSET_8X8 = {sig8x8!r}\n\n")
        w(f"LAST_COEFF_FLAG_OFFSET_8X8 = {last8x8!r}\n\n")
        w(f"SIG_COEFF_OFFSET_DC = {sig_dc!r}\n\n")
        w(f"COEFF_ABS_LEVEL1_CTX = {lvl1_ctx!r}\n\n")
        w(f"COEFF_ABS_LEVELGT1_CTX = {lvlgt1_ctx!r}\n\n")
        w(f"COEFF_ABS_LEVEL_TRANSITION = {lvl_transition!r}\n")
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    sys.exit(main())
