// ISO-BMFF / Annex-B demux — C++ mirror of utils/mp4.py.
#include "h264.h"

namespace avtpu {

using mp4::find_box;
using mp4::for_boxes;
using mp4::rd16;
using mp4::rd32;
using mp4::rd64;

static Bytes parse_avcc_field(const uint8_t* p, size_t len, int* length_size,
                              std::vector<Bytes>* sps, std::vector<Bytes>* pps) {
  if (len < 7 || p[0] != 1) throw ParseError("bad avcC");
  *length_size = (p[4] & 3) + 1;
  size_t pos = 5;
  int n_sps = p[pos++] & 0x1F;
  for (int i = 0; i < n_sps; i++) {
    if (pos + 2 > len) throw ParseError("avcC sps");
    int ln = rd16(p + pos);
    pos += 2;
    if (pos + ln > len) throw ParseError("avcC sps");
    sps->emplace_back(p + pos, p + pos + ln);
    pos += ln;
  }
  if (pos >= len) throw ParseError("avcC pps");
  int n_pps = p[pos++];
  for (int i = 0; i < n_pps; i++) {
    if (pos + 2 > len) throw ParseError("avcC pps");
    int ln = rd16(p + pos);
    pos += 2;
    if (pos + ln > len) throw ParseError("avcC pps");
    pps->emplace_back(p + pos, p + pos + ln);
    pos += ln;
  }
  return {};
}

static std::optional<H264Stream> demux_mp4(const uint8_t* d, size_t n) {
  uint64_t moov_s, moov_e;
  if (!find_box(d, 0, n, {"moov"}, 0, &moov_s, &moov_e)) return std::nullopt;
  std::optional<H264Stream> result;
  for_boxes(d, moov_s, moov_e, [&](const uint8_t* t, uint64_t ts, uint64_t te) {
    if (memcmp(t, "trak", 4) != 0) return true;
    // locate avcC inside stsd
    uint64_t stsd_s, stsd_e;
    if (!find_box(d, ts, te, {"mdia", "minf", "stbl", "stsd"}, 0, &stsd_s,
                  &stsd_e))
      return true;
    int length_size = 4;
    std::vector<Bytes> sps, pps;
    bool have_avcc = false;
    for_boxes(d, stsd_s + 8, stsd_e,
              [&](const uint8_t* st, uint64_t ss, uint64_t se) {
                if (memcmp(st, "avc1", 4) && memcmp(st, "avc3", 4)) return true;
                for_boxes(d, ss + 78, se,
                          [&](const uint8_t* bt, uint64_t bs, uint64_t be) {
                            if (memcmp(bt, "avcC", 4) == 0) {
                              parse_avcc_field(d + bs, be - bs, &length_size,
                                               &sps, &pps);
                              have_avcc = true;
                              return false;
                            }
                            return true;
                          });
                return !have_avcc;
              });
    if (!have_avcc) return true;

    uint64_t stbl_s, stbl_e;
    find_box(d, ts, te, {"mdia", "minf", "stbl"}, 0, &stbl_s, &stbl_e);
    uint64_t stsz_s = 0, stsz_e = 0, stco_s = 0, stco_e = 0, co64_s = 0,
             co64_e = 0, stsc_s = 0, stsc_e = 0;
    for_boxes(d, stbl_s, stbl_e, [&](const uint8_t* bt, uint64_t bs, uint64_t be) {
      if (!memcmp(bt, "stsz", 4)) stsz_s = bs, stsz_e = be;
      if (!memcmp(bt, "stco", 4)) stco_s = bs, stco_e = be;
      if (!memcmp(bt, "co64", 4)) co64_s = bs, co64_e = be;
      if (!memcmp(bt, "stsc", 4)) stsc_s = bs, stsc_e = be;
      return true;
    });
    if (!stsz_s || !stsc_s || (!stco_s && !co64_s)) return true;

    // sample sizes (bounds-checked: a lying count -> ParseError -> literal)
    if (stsz_s + 12 > stsz_e) throw ParseError("stsz underrun");
    uint32_t uniform = rd32(d + stsz_s + 4), n_samples = rd32(d + stsz_s + 8);
    if (!uniform && stsz_s + 12 + 4ull * n_samples > stsz_e)
      throw ParseError("stsz underrun");
    std::vector<uint64_t> sizes(n_samples);
    for (uint32_t i = 0; i < n_samples; i++)
      sizes[i] = uniform ? uniform : rd32(d + stsz_s + 12 + 4 * i);
    // chunk offsets
    std::vector<uint64_t> chunks;
    if (stco_s) {
      if (stco_s + 8 > stco_e) throw ParseError("stco underrun");
      uint32_t nc = rd32(d + stco_s + 4);
      if (stco_s + 8 + 4ull * nc > stco_e) throw ParseError("stco underrun");
      for (uint32_t i = 0; i < nc; i++) chunks.push_back(rd32(d + stco_s + 8 + 4 * i));
    } else {
      if (co64_s + 8 > co64_e) throw ParseError("co64 underrun");
      uint32_t nc = rd32(d + co64_s + 4);
      if (co64_s + 8 + 8ull * nc > co64_e) throw ParseError("co64 underrun");
      for (uint32_t i = 0; i < nc; i++) chunks.push_back(rd64(d + co64_s + 8 + 8 * i));
    }
    // stsc entries
    struct Ent {
      uint32_t first_chunk, spc;
    };
    std::vector<Ent> stsc;
    if (stsc_s + 8 > stsc_e) throw ParseError("stsc underrun");
    uint32_t ne = rd32(d + stsc_s + 4);
    if (stsc_s + 8 + 12ull * ne > stsc_e) throw ParseError("stsc underrun");
    for (uint32_t i = 0; i < ne; i++)
      stsc.push_back({rd32(d + stsc_s + 8 + 12 * i), rd32(d + stsc_s + 12 + 12 * i)});

    H264Stream stream;
    stream.sps_list = sps;
    stream.pps_list = pps;
    size_t si = 0;
    for (size_t ci = 0; ci < chunks.size(); ci++) {
      uint32_t spc = 1;
      for (auto& e : stsc) {
        if (ci + 1 >= e.first_chunk)
          spc = e.spc;
        else
          break;
      }
      uint64_t pos = chunks[ci];
      for (uint32_t k = 0; k < spc && si < sizes.size(); k++) {
        uint64_t off = pos, end = pos + sizes[si];
        if (end > n) throw ParseError("sample beyond file");
        uint64_t p = off;
        while (p + length_size <= end) {
          uint64_t ln = 0;
          if (length_size == 4)
            ln = rd32(d + p);
          else if (length_size == 2)
            ln = rd16(d + p);
          else
            ln = d[p];
          p += length_size;
          if (ln == 0 || p + ln > end) break;
          uint8_t hdr = d[p];
          stream.nals.push_back(
              {p, ln, hdr & 0x1F, (hdr >> 5) & 3});
          p += ln;
        }
        pos += sizes[si];
        si++;
      }
    }
    result = std::move(stream);
    return false;  // first AVC track wins
  });
  return result;
}

static std::optional<H264Stream> demux_annexb(const uint8_t* d, size_t n) {
  std::vector<uint64_t> starts;
  for (size_t i = 0; i + 3 <= n;) {
    if (d[i] == 0 && d[i + 1] == 0) {
      if (d[i + 2] == 1) {
        starts.push_back(i + 3);
        i += 3;
        continue;
      }
      if (i + 4 <= n && d[i + 2] == 0 && d[i + 3] == 1) {
        starts.push_back(i + 4);
        i += 4;
        continue;
      }
    }
    i++;
  }
  if (starts.empty()) return std::nullopt;
  H264Stream stream;
  for (size_t k = 0; k < starts.size(); k++) {
    uint64_t s = starts[k];
    uint64_t e;
    if (k + 1 == starts.size()) {
      e = n;
    } else {
      e = starts[k + 1] - 3;
      if (e >= s + 1 && d[e - 1] == 0) e -= 1;  // 4-byte prefix
    }
    if (e <= s) continue;
    uint8_t hdr = d[s];
    NalSpan span{s, e - s, hdr & 0x1F, (hdr >> 5) & 3};
    stream.nals.push_back(span);
    if (span.nal_type == 7) stream.sps_list.emplace_back(d + s, d + e);
    if (span.nal_type == 8) stream.pps_list.emplace_back(d + s, d + e);
  }
  return stream;
}

std::optional<H264Stream> demux(const uint8_t* data, size_t size) {
  if (size > 12) {
    const char* k = (const char*)data + 4;
    if (!memcmp(k, "ftyp", 4) || !memcmp(k, "moov", 4) || !memcmp(k, "mdat", 4) ||
        !memcmp(k, "wide", 4) || !memcmp(k, "free", 4)) {
      // malformed MP4 propagates (compress falls back to a pure-literal
      // container), matching the Python path's behavior exactly
      auto s = demux_mp4(data, size);
      if (s) return s;
    }
  }
  return demux_annexb(data, size);
}

}  // namespace avtpu
