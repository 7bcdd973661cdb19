#!/usr/bin/env python3
"""Extract ITU-T H.264 CAVLC spec tables from the system libavcodec archive.

The CAVLC code tables are pure ITU-T Rec. H.264 specification constants
(Table 9-5 coeff_token, Tables 9-7/9-8 total_zeros, Tables 9-9a/9-9b
chroma-DC total_zeros, Table 9-10 run_before, Table 9-4 coded_block_pattern
me(v) mappings).  Like tools/extract_cabac_tables.py (the CABAC spec
tables), we read them from the installed Debian libavcodec static
archive's named .rodata symbols instead of hand-typing ~700 magic
numbers, then regenerate a Python module with provenance notes.  No code
is copied — only ITU spec data.

Every extracted VLC table is validated for prefix-freeness before the
module is written, and a handful of universally-known spec anchor values
are asserted.

Usage: python tools/extract_cavlc_tables.py
       (writes avrecode_tpu/h264/_cavlc_tables.py and
        avrecode_tpu/host/src/cavlc_tables.h)
"""
import os
import subprocess
import sys
import tempfile

ARCHIVE = "/usr/lib/x86_64-linux-gnu/libavcodec.a"
OUT = os.path.join(os.path.dirname(__file__), "..", "avrecode_tpu", "h264",
                   "_cavlc_tables.py")


def rodata_symbols(obj):
    out = subprocess.run(["objdump", "-t", obj], capture_output=True,
                         text=True, check=True).stdout
    syms = {}
    for line in out.splitlines():
        parts = line.split()
        if len(parts) >= 6 and parts[2] == "O" and parts[3] == ".rodata":
            syms[parts[5]] = (int(parts[0], 16), int(parts[4], 16))
    return syms


def rodata_bytes(obj, tmp):
    bin_path = os.path.join(tmp, os.path.basename(obj) + ".rodata")
    subprocess.run(["objcopy", "-O", "binary", "--only-section=.rodata",
                    obj, bin_path], check=True)
    return open(bin_path, "rb").read()


def check_prefix_free(codes, name):
    strs = [format(b, "0%db" % s) for b, s in codes if s]
    for i, a in enumerate(strs):
        for j, b in enumerate(strs):
            if i != j and b.startswith(a):
                sys.exit(f"{name}: code {a} is a prefix of {b}")
    if len(set(strs)) != len(strs):
        sys.exit(f"{name}: duplicate codes")


def main():
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(["ar", "x", ARCHIVE, "h264_cavlc.o", "h264data.o"],
                       cwd=tmp, check=True)
        cav = os.path.join(tmp, "h264_cavlc.o")
        dat = os.path.join(tmp, "h264data.o")
        cs = rodata_symbols(cav)
        ds = rodata_symbols(dat)
        cb = rodata_bytes(cav, tmp)
        db = rodata_bytes(dat, tmp)

    def carr(name, n=None):
        off, size = cs[name]
        return list(cb[off:off + (n or size)])

    def darr(name):
        off, size = ds[name]
        return list(db[off:off + size])

    def vlc_rows(len_name, bits_name, n_rows, row_w):
        ln = carr(len_name)
        bt = carr(bits_name)
        return [[(bt[r * row_w + i], ln[r * row_w + i])
                 for i in range(row_w)] for r in range(n_rows)]

    # Table 9-5: [total(0..16)][trailing(0..3)] per nC range table; the
    # length-17 layout folds the TotalCoeff==0 code into row 0
    ct_raw = vlc_rows("coeff_token_len", "coeff_token_bits", 4 * 17, 4)
    coeff_token = [ct_raw[t * 17:(t + 1) * 17] for t in range(4)]
    cdc = vlc_rows("chroma_dc_coeff_token_len", "chroma_dc_coeff_token_bits",
                   5, 4)
    cdc422 = vlc_rows("chroma422_dc_coeff_token_len",
                      "chroma422_dc_coeff_token_bits", 9, 4)
    # normalize: COEFF_TOKEN[table][total][trailing], tables:
    # 0: 0<=nC<2   1: 2<=nC<4   2: 4<=nC<8   3: nC>=8 (6-bit FLC)
    # 4: chromaDC 2x2 (nC==-1)  5: chromaDC 2x4 (nC==-2)
    coeff_token.append(cdc)
    coeff_token.append(cdc422)

    # Tables 9-7/9-8/9-9a/9-9b: [TotalCoeff-1][total_zeros]
    total_zeros = vlc_rows("total_zeros_len", "total_zeros_bits", 15, 16)
    tz_2x2 = vlc_rows("chroma_dc_total_zeros_len",
                      "chroma_dc_total_zeros_bits", 3, 4)
    tz_2x4 = vlc_rows("chroma422_dc_total_zeros_len",
                      "chroma422_dc_total_zeros_bits", 7, 8)
    # Table 9-10: [min(zerosLeft,7)-1][run_before]
    run_before = vlc_rows("run_len", "run_bits", 7, 16)

    # Table 9-4: coded_block_pattern me(v) mappings (codeNum -> cbp)
    cbp_intra = darr("ff_h264_golomb_to_intra4x4_cbp")
    cbp_inter = darr("ff_h264_golomb_to_inter_cbp")
    cbp_intra_mono = carr("golomb_to_intra4x4_cbp_gray")
    cbp_inter_mono = carr("golomb_to_inter_cbp_gray")

    # ---- spec anchors (universally-known values) ------------------------
    assert coeff_token[0][0][0] == (1, 1)           # total=0, 0<=nC<2: '1'
    assert coeff_token[0][1] == [(5, 6), (1, 2), (0, 0), (0, 0)]
    assert coeff_token[1][0][0] == (3, 2)           # total=0, 2<=nC<4: '11'
    assert coeff_token[2][0][0] == (15, 4)          # 4<=nC<8: '1111'
    assert coeff_token[3][0][0] == (3, 6)           # FLC total=0: '000011'
    for total in range(1, 17):                      # FLC: (total-1)*4+to
        for to in range(min(3, total) + 1):
            assert coeff_token[3][total][to] == ((total - 1) * 4 + to, 6)
    assert coeff_token[4][0][0] == (1, 2)           # chromaDC 2x2: '01'
    assert coeff_token[5][0][0] == (1, 1)           # chromaDC 2x4: '1'
    assert total_zeros[0][0] == (1, 1) and total_zeros[0][15] == (1, 9)
    assert run_before[0][:2] == [(1, 1), (0, 1)]
    assert tz_2x2[0] == [(1, 1), (1, 2), (1, 3), (0, 3)]
    assert cbp_intra[:4] == [47, 31, 15, 0] and cbp_inter[:4] == [0, 16, 1, 2]

    # ---- validation: every VLC table must be prefix-free ----------------
    for t, tab in enumerate(coeff_token):
        n_tot = len(tab) - 1
        codes = [tab[0][0]]
        for total in range(1, n_tot + 1):
            codes += [tab[total][to] for to in range(min(3, total) + 1)]
        check_prefix_free(codes, f"coeff_token[{t}]")
    for tc in range(1, 16):
        check_prefix_free(total_zeros[tc - 1][:17 - tc], f"total_zeros[{tc}]")
    for tc in range(1, 4):
        check_prefix_free(tz_2x2[tc - 1][:5 - tc], f"tz_2x2[{tc}]")
    for tc in range(1, 8):
        check_prefix_free(tz_2x4[tc - 1][:9 - tc], f"tz_2x4[{tc}]")
    for zl in range(1, 7):
        check_prefix_free(run_before[zl - 1][:zl + 1], f"run_before[{zl}]")
    check_prefix_free(run_before[6][:15], "run_before[7+]")
    for t in (cbp_intra, cbp_inter):
        assert sorted(t) == list(range(48))
    for t in (cbp_intra_mono, cbp_inter_mono):
        assert sorted(t) == list(range(16))

    with open(OUT, "w") as f:
        f.write('"""GENERATED by tools/extract_cavlc_tables.py — do not '
                'edit.\n\n'
                'ITU-T Rec. H.264 CAVLC specification constants:\n'
                '  COEFF_TOKEN  — Table 9-5, (bits, size) entries indexed\n'
                '                 [table][TotalCoeff][TrailingOnes]; tables\n'
                '                 0..2 = nC ranges [0,2) [2,4) [4,8),\n'
                '                 3 = nC>=8 (6-bit FLC), 4 = chroma DC 2x2\n'
                '                 (nC==-1), 5 = chroma DC 2x4 (nC==-2);\n'
                '                 row 0 holds the TotalCoeff==0 code\n'
                '  TOTAL_ZEROS / TOTAL_ZEROS_2x2 / TOTAL_ZEROS_2x4\n'
                '               — Tables 9-7/9-8/9-9a/9-9b, [tc-1][tz]\n'
                '  RUN_BEFORE   — Table 9-10, [min(zerosLeft,7)-1][run]\n'
                '  CBP_INTRA/INTER(+_MONO) — Table 9-4 me(v) codeNum->cbp\n'
                '(extracted from the system libavcodec archive\'s named\n'
                ' spec-data tables and prefix-free-validated; reference\n'
                ' parity: the reference uses the same data via its ffmpeg\n'
                ' fork — SURVEY.md C18)\n'
                '"""\n\n')
        f.write(f"COEFF_TOKEN = {coeff_token!r}\n\n")
        f.write(f"TOTAL_ZEROS = {total_zeros!r}\n\n")
        f.write(f"TOTAL_ZEROS_2x2 = {tz_2x2!r}\n\n")
        f.write(f"TOTAL_ZEROS_2x4 = {tz_2x4!r}\n\n")
        f.write(f"RUN_BEFORE = {run_before!r}\n\n")
        f.write(f"CBP_INTRA = {cbp_intra!r}\n\n")
        f.write(f"CBP_INTER = {cbp_inter!r}\n\n")
        f.write(f"CBP_INTRA_MONO = {cbp_intra_mono!r}\n\n")
        f.write(f"CBP_INTER_MONO = {cbp_inter_mono!r}\n")
    print(f"wrote {OUT}")

    # C++ mirror (identical data, identical indexing)
    hout = os.path.join(os.path.dirname(__file__), "..", "avrecode_tpu",
                        "host", "src", "cavlc_tables.h")

    def cpairs(rows):
        return "{" + ",".join(
            "{" + ",".join(f"{{{b},{s}}}" for b, s in row) + "}"
            for row in rows) + "}"

    with open(hout, "w") as f:
        f.write("// GENERATED by tools/extract_cavlc_tables.py — do not "
                "edit.\n// ITU-T Rec. H.264 CAVLC spec constants; see the "
                "Python twin\n// avrecode_tpu/h264/_cavlc_tables.py for "
                "provenance notes.\n"
                "#pragma once\n#include <cstdint>\n\n"
                "namespace avtpu {\n\n"
                "struct VlcCode { uint8_t bits, size; };\n\n")
        padded = [t + [[(0, 0)] * 4] * (17 - len(t)) for t in coeff_token]
        f.write("inline constexpr VlcCode kCoeffToken[6][17][4] = {" +
                ",".join(cpairs(t) for t in padded) + "};\n\n")
        f.write("inline constexpr VlcCode kTotalZeros[15][16] = " +
                cpairs(total_zeros) + ";\n\n")
        f.write("inline constexpr VlcCode kTotalZeros2x2[3][4] = " +
                cpairs(tz_2x2) + ";\n\n")
        f.write("inline constexpr VlcCode kTotalZeros2x4[7][8] = " +
                cpairs(tz_2x4) + ";\n\n")
        f.write("inline constexpr VlcCode kRunBefore[7][16] = " +
                cpairs(run_before) + ";\n\n")
        f.write("inline constexpr uint8_t kCbpIntra[48] = {" +
                ",".join(map(str, cbp_intra)) + "};\n")
        f.write("inline constexpr uint8_t kCbpInter[48] = {" +
                ",".join(map(str, cbp_inter)) + "};\n")
        f.write("inline constexpr uint8_t kCbpIntraMono[16] = {" +
                ",".join(map(str, cbp_intra_mono)) + "};\n")
        f.write("inline constexpr uint8_t kCbpInterMono[16] = {" +
                ",".join(map(str, cbp_inter_mono)) + "};\n\n")
        f.write("}  // namespace avtpu\n")
    print(f"wrote {hout}")


if __name__ == "__main__":
    main()
