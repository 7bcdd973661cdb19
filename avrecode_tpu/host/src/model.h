// Adaptive recode model — C++ mirror of models/h264_model.py.
//
// Model keys are packed into uint64 (class enum + up to 4 small fields);
// the packing is injective w.r.t. the Python tuples, which is all stream
// equality needs (each key's estimator history is independent).
#pragma once
#include <cstdint>
#include <vector>
#include "rangecoder.h"
#include "tables.h"

namespace avtpu {

constexpr int kHalveDefault = 0x60;
constexpr int kHalveSig = 0x50;

// model key classes (order is internal; independent per-key streams)
enum KeyCls : uint32_t {
  K_CTX, K_SKIP, K_IMBTYPE, K_I16CBF, K_I16CBC0, K_I16CBC1, K_I16PM1, K_I16PM0,
  K_PMBTYPE0, K_PMBTYPE_INTRA, K_PMBTYPE1, K_PMBTYPE2A, K_PMBTYPE2B,
  K_BMBTYPE0, K_BMBTYPE1, K_BMBTYPE2, K_BMBTYPE3, K_BMBTYPE4, K_BMBTYPE5,
  K_BMBTYPE6, K_BMBTYPE7, K_BMBTYPE_INTRA,
  K_PSUB0, K_PSUB1, K_PSUB2,
  K_BSUB0, K_BSUB1, K_BSUB2, K_BSUB3, K_BSUB4, K_BSUB5, K_BSUB6, K_BSUB7,
  K_T8X8, K_IPREDF, K_IPREDR, K_CPRED0, K_CPRED1, K_CPRED2,
  K_CBPL, K_CBPC0, K_CBPC1, K_QPD0, K_QPD1, K_QPD2,
  K_REF, K_MVD, K_MVDP, K_MVDE, K_MVDB, K_MVDS,
  K_CBF, K_SIG, K_LVL1, K_LVLG, K_LVLE, K_LVLB, K_SGN, K_NNZ,
};

inline uint64_t mkey(uint32_t cls, uint32_t a = 0, uint32_t b = 0,
                     uint32_t c = 0, uint32_t dd = 0) {
  return ((uint64_t)cls << 40) | ((uint64_t)a << 30) | ((uint64_t)b << 20) |
         ((uint64_t)c << 10) | dd;
}

struct Estimator {
  int32_t pos = 1, neg = 1;  // pos counts ones
};

// Open-addressing hash map uint64 -> estimator index (deterministic).
class KeyMap {
 public:
  KeyMap() { rehash(1 << 12); }

  uint32_t slot(uint64_t key, std::vector<Estimator>& est) {
    if ((est.size() + 1) * 4 > cap_ * 3) grow(est);
    size_t i = probe(key);
    if (keys_[i] == key) return vals_[i];
    keys_[i] = key;
    vals_[i] = (uint32_t)est.size();
    est.push_back({});
    return vals_[i];
  }

 private:
  size_t probe(uint64_t key) const {
    size_t mask = cap_ - 1;
    size_t i = (size_t)(key * 0x9E3779B97F4A7C15ull >> 17) & mask;
    while (keys_[i] != kEmpty && keys_[i] != key) i = (i + 1) & mask;
    return i;
  }
  void rehash(size_t cap) {
    cap_ = cap;
    keys_.assign(cap, kEmpty);
    vals_.assign(cap, 0);
  }
  void grow(std::vector<Estimator>& est) {
    auto old_keys = keys_;
    auto old_vals = vals_;
    rehash(cap_ * 2);
    for (size_t i = 0; i < old_keys.size(); i++) {
      if (old_keys[i] != kEmpty) {
        size_t j = probe(old_keys[i]);
        keys_[j] = old_keys[i];
        vals_[j] = old_vals[i];
      }
    }
  }
  static constexpr uint64_t kEmpty = ~0ull;
  size_t cap_ = 0;
  std::vector<uint64_t> keys_;
  std::vector<uint32_t> vals_;
};

class RecodeModel {
 public:
  // encode mode
  RecodeModel() : enc_(new RangeEncoder()) {}
  // decode mode
  RecodeModel(const uint8_t* data, size_t size)
      : dec_(new RangeDecoder(data, size)) {}
  ~RecodeModel() {
    delete enc_;
    delete dec_;
  }
  RecodeModel(const RecodeModel&) = delete;

  void put_bit(uint64_t key, int bit, int pcab = 0) {
    Estimator& e = est_ref(key);
    enc_->put(bit, prob(e, key, pcab));
    adapt(e, key, bit);
  }
  int get_bit(uint64_t key, int pcab = 0) {
    Estimator& e = est_ref(key);
    int bit = dec_->get(prob(e, key, pcab));
    adapt(e, key, bit);
    return bit;
  }

  void put_nnz(int nnz, int cat, int max_coeff, int prior) {
    int v = nnz - 1, nb = bits_for(max_coeff - 1);
    uint32_t prefix = 0, pb = prior < 15 ? prior : 15;
    for (int i = nb - 1; i >= 0; i--) {
      int bit = (v >> i) & 1;
      put_bit(mkey(K_NNZ, cat, i, prefix, pb), bit);
      prefix = (prefix << 1) | bit;
    }
  }
  int get_nnz(int cat, int max_coeff, int prior) {
    int nb = bits_for(max_coeff - 1), v = 0;
    uint32_t prefix = 0, pb = prior < 15 ? prior : 15;
    for (int i = nb - 1; i >= 0; i--) {
      int bit = get_bit(mkey(K_NNZ, cat, i, prefix, pb));
      v = (v << 1) | bit;
      prefix = (prefix << 1) | bit;
    }
    return v + 1;
  }

  Bytes finish() { return enc_->finish(); }

 private:
  static int bits_for(int v) {
    int n = 0;
    while (v >> n) n++;
    return n;
  }
  Estimator& est_ref(uint64_t key) { return est_[map_.slot(key, est_)]; }

  uint32_t prob(const Estimator& e, uint64_t key, int pcab) const {
    int32_t p1 = ((int64_t)e.pos << 16) / (e.pos + e.neg);
    if (pcab > 0) {
      int32_t total = e.pos + e.neg;
      int32_t w = 4 * total < 78 ? 4 * total : 78;
      p1 = (p1 * w + pcab * (80 - w)) / 80;
    }
    if (p1 < 1) p1 = 1;
    if (p1 > 0xFFFF) p1 = 0xFFFF;
    return (uint32_t)p1;
  }
  void adapt(Estimator& e, uint64_t key, int bit) {
    if (bit)
      e.pos++;
    else
      e.neg++;
    int limit = (key >> 40) == K_SIG ? kHalveSig : kHalveDefault;
    if (e.pos + e.neg > limit) {
      e.pos = (e.pos + 1) >> 1;
      e.neg = (e.neg + 1) >> 1;
    }
  }

  KeyMap map_;
  std::vector<Estimator> est_;
  RangeEncoder* enc_ = nullptr;
  RangeDecoder* dec_ = nullptr;
};

}  // namespace avtpu
