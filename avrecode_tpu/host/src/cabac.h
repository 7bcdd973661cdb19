// H.264 CABAC arithmetic engine — C++ mirror of ops/cabac.py (spec 9.3).
#pragma once
#include <cstdint>
#include <algorithm>
#include "bitio.h"
#include "tables.h"

namespace avtpu {

constexpr int kNumCtx = 1024;
constexpr int kCtxTerminate = 276;

// Packed context state: (pStateIdx << 1) | valMPS, per ctxIdx.
struct CtxStates {
  uint8_t s[kNumCtx];

  // clause 9.3.1.1; cabac_init_idc < 0 selects the I-slice table
  void init(int slice_qp, int cabac_init_idc) {
    const int8_t* tab =
        cabac_init_idc < 0 ? kCtxInitI : kCtxInitPB + 2048 * cabac_init_idc;
    int qp = std::clamp(slice_qp, 0, 51);
    for (int i = 0; i < kNumCtx; i++) {
      int m = tab[2 * i], n = tab[2 * i + 1];
      int pre = std::clamp(((m * qp) >> 4) + n, 1, 126);
      int mps = pre > 63;
      int pstate = pre <= 63 ? 63 - pre : pre - 64;
      s[i] = (uint8_t)((pstate << 1) | mps);
    }
  }
};

class CabacDecoder {
 public:
  CabacDecoder(const uint8_t* data, size_t size) : data_(data), size_(size) {
    range_ = 510;
    offset_ = 0;
    for (int i = 0; i < 9; i++) offset_ = (offset_ << 1) | bit();
  }

  int decision(CtxStates& st, int ctx) {
    uint8_t s = st.s[ctx];
    int pstate = s >> 1, mps = s & 1;
    int r_lps = kRangeTabLPS[4 * pstate + ((range_ >> 6) & 3)];
    range_ -= r_lps;
    int bin;
    if (offset_ >= range_) {
      bin = mps ^ 1;
      offset_ -= range_;
      range_ = r_lps;
      if (pstate == 0) mps ^= 1;
      st.s[ctx] = (uint8_t)((kTransIdxLPS[pstate] << 1) | mps);
    } else {
      bin = mps;
      st.s[ctx] = (uint8_t)((kTransIdxMPS[pstate] << 1) | mps);
    }
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | bit();
    }
    return bin;
  }

  int bypass() {
    offset_ = (offset_ << 1) | bit();
    if (offset_ >= range_) {
      offset_ -= range_;
      return 1;
    }
    return 0;
  }

  int terminate() {
    range_ -= 2;
    if (offset_ >= range_) return 1;
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | bit();
    }
    return 0;
  }

  size_t bitpos() const { return bitpos_; }

 private:
  int bit() {
    size_t byte_i = bitpos_ >> 3;
    int b = byte_i < size_ ? (data_[byte_i] >> (7 - (bitpos_ & 7))) & 1 : 0;
    bitpos_++;
    return b;
  }
  const uint8_t* data_;
  size_t size_;
  size_t bitpos_ = 0;
  uint32_t range_, offset_;
};

class CabacEncoder {
 public:
  void decision(CtxStates& st, int ctx, int bin) {
    uint8_t s = st.s[ctx];
    int pstate = s >> 1, mps = s & 1;
    int r_lps = kRangeTabLPS[4 * pstate + ((range_ >> 6) & 3)];
    range_ -= r_lps;
    if (bin != mps) {
      low_ += range_;
      range_ = r_lps;
      if (pstate == 0) mps ^= 1;
      st.s[ctx] = (uint8_t)((kTransIdxLPS[pstate] << 1) | mps);
    } else {
      st.s[ctx] = (uint8_t)((kTransIdxMPS[pstate] << 1) | mps);
    }
    renorm();
  }

  void bypass(int bin) {
    low_ <<= 1;
    if (bin) low_ += range_;
    if (low_ >= 1024) {
      put_bit(1);
      low_ -= 1024;
    } else if (low_ < 512) {
      put_bit(0);
    } else {
      low_ -= 512;
      outstanding_++;
    }
  }

  void terminate(int bin) {
    range_ -= 2;
    if (bin) {
      low_ += range_;
      flush();
    } else {
      renorm();
    }
  }

  const Bytes& bytes() const { return out_; }
  size_t size() const { return out_.size(); }

 private:
  void write_bit(int b) {
    bitbuf_ = (bitbuf_ << 1) | b;
    if (++bitcnt_ == 8) {
      out_.push_back((uint8_t)bitbuf_);
      bitbuf_ = 0;
      bitcnt_ = 0;
    }
  }
  void put_bit(int b) {
    if (first_) {
      first_ = false;
    } else {
      write_bit(b);
    }
    while (outstanding_ > 0) {
      write_bit(1 - b);
      outstanding_--;
    }
  }
  void renorm() {
    while (range_ < 256) {
      if (low_ < 256) {
        put_bit(0);
      } else if (low_ >= 512) {
        low_ -= 512;
        put_bit(1);
      } else {
        low_ -= 256;
        outstanding_++;
      }
      range_ <<= 1;
      low_ <<= 1;
    }
  }
  void flush() {
    range_ = 2;
    renorm();
    put_bit((low_ >> 9) & 1);
    uint32_t v = ((low_ >> 7) & 3) | 1;
    write_bit((v >> 1) & 1);
    write_bit(v & 1);
    while (bitcnt_ != 0) write_bit(0);
  }

  uint32_t low_ = 0, range_ = 510;
  bool first_ = true;
  uint64_t outstanding_ = 0;
  uint32_t bitbuf_ = 0;
  int bitcnt_ = 0;
  Bytes out_;
};

// Fused CABAC decode + bit-exact re-encode (the compress-side "verify"
// pass).  The verify encoder's context states and range register follow the
// decoder's exactly (same r_lps, same MPS/LPS branch, same renorm shifts),
// so a fused engine does ONE state lookup/update and ONE renorm loop per
// bin where Coder previously ran CabacDecoder + CabacEncoder side by side
// (~2x the table walks).  Output is byte-identical to CabacEncoder fed the
// decoded bins — guarded by the Python/C++ differential suite.
class CabacXcoder {
 public:
  CabacXcoder(const uint8_t* data, size_t size) : data_(data), size_(size) {
    range_ = 510;
    offset_ = 0;
    for (int i = 0; i < 9; i++) offset_ = (offset_ << 1) | bit();
  }

  int decision(CtxStates& st, int ctx) {
    uint8_t s = st.s[ctx];
    int pstate = s >> 1, mps = s & 1;
    int r_lps = kRangeTabLPS[4 * pstate + ((range_ >> 6) & 3)];
    range_ -= r_lps;
    int bin;
    if (offset_ >= range_) {
      bin = mps ^ 1;
      offset_ -= range_;
      elow_ += range_;  // encoder LPS path uses the same post-sub range
      range_ = r_lps;
      if (pstate == 0) mps ^= 1;
      st.s[ctx] = (uint8_t)((kTransIdxLPS[pstate] << 1) | mps);
    } else {
      bin = mps;
      st.s[ctx] = (uint8_t)((kTransIdxMPS[pstate] << 1) | mps);
    }
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | bit();
      renorm_step();
    }
    return bin;
  }

  int bypass() {
    offset_ = (offset_ << 1) | bit();
    int b = 0;
    if (offset_ >= range_) {
      offset_ -= range_;
      b = 1;
    }
    elow_ <<= 1;
    if (b) elow_ += range_;
    if (elow_ >= 1024) {
      put_bit(1);
      elow_ -= 1024;
    } else if (elow_ < 512) {
      put_bit(0);
    } else {
      elow_ -= 512;
      outstanding_++;
    }
    return b;
  }

  int terminate() {
    range_ -= 2;
    if (offset_ >= range_) {
      elow_ += range_;
      flush();
      return 1;
    }
    while (range_ < 256) {
      range_ <<= 1;
      offset_ = (offset_ << 1) | bit();
      renorm_step();
    }
    return 0;
  }

  size_t bitpos() const { return bitpos_; }
  const Bytes& bytes() const { return out_; }

 private:
  int bit() {
    size_t byte_i = bitpos_ >> 3;
    int b = byte_i < size_ ? (data_[byte_i] >> (7 - (bitpos_ & 7))) & 1 : 0;
    bitpos_++;
    return b;
  }
  // one encoder renorm iteration (CabacEncoder::renorm body, minus the
  // range bookkeeping the decoder already did)
  void renorm_step() {
    if (elow_ < 256) {
      put_bit(0);
    } else if (elow_ >= 512) {
      elow_ -= 512;
      put_bit(1);
    } else {
      elow_ -= 256;
      outstanding_++;
    }
    elow_ <<= 1;
  }
  void write_bit(int b) {
    bitbuf_ = (bitbuf_ << 1) | b;
    if (++bitcnt_ == 8) {
      out_.push_back((uint8_t)bitbuf_);
      bitbuf_ = 0;
      bitcnt_ = 0;
    }
  }
  void put_bit(int b) {
    if (first_) {
      first_ = false;
    } else {
      write_bit(b);
    }
    while (outstanding_ > 0) {
      write_bit(1 - b);
      outstanding_--;
    }
  }
  void flush() {
    // encoder-only final renorm with range=2 (7 doublings), then stop bits
    for (uint32_t r = 2; r < 256; r <<= 1) renorm_step();
    put_bit((elow_ >> 9) & 1);
    uint32_t v = ((elow_ >> 7) & 3) | 1;
    write_bit((v >> 1) & 1);
    write_bit(v & 1);
    while (bitcnt_ != 0) write_bit(0);
  }

  const uint8_t* data_;
  size_t size_;
  size_t bitpos_ = 0;
  uint32_t range_, offset_;
  // encoder half
  uint32_t elow_ = 0;
  bool first_ = true;
  uint64_t outstanding_ = 0;
  uint32_t bitbuf_ = 0;
  int bitcnt_ = 0;
  Bytes out_;
};

}  // namespace avtpu
