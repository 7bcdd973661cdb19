// Adaptive recode model — C++ mirror of models/h264_model.py.
//
// Model keys are packed into uint64 (class enum + up to 4 small fields);
// the packing is injective w.r.t. the Python tuples, which is all stream
// equality needs (each key's estimator history is independent).
//
// Performance notes (hot path, ~15 modeled bins per input byte):
//  * estimator lives inside the open-addressing hash cell (one cache line
//    touch per bin),
//  * (pos << 16) / total is a 97x97 exact lookup table (counts are bounded
//    by the halving limit),
//  * single-pass compress rollback via an epoch-stamped undo journal: the
//    first touch of a key per slice records its prior counts.
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

// exact (pos << 16) / total for all reachable (pos, total) pairs
struct DivTab {
  uint16_t t[97 * 97];
  DivTab() {
    for (int total = 1; total <= 96; total++)
      for (int pos = 0; pos <= total; pos++) {
        int32_t p = ((int32_t)pos << 16) / total;
        t[total * 97 + pos] = (uint16_t)(p > 0xFFFF ? 0xFFFF : p);
      }
  }
};
inline const DivTab kDiv{};

class RecodeModel {
 public:
  struct Cell {
    uint64_t key;
    uint16_t pos, neg;
    uint32_t epoch;
  };

  // Trace recording (device-pipeline host stage): instead of range-coding,
  // record (slot, bit, prior) per bin with insertion-order slot ids — the
  // C++ mirror of models/trace.py TraceModel.
  struct Trace {
    std::vector<int32_t> slots;
    std::vector<uint8_t> bits;
    std::vector<uint16_t> pcabs;
    std::vector<uint8_t> limits;  // per slot
  };

  // encode mode (recording=true: trace recorder, no entropy coding)
  explicit RecodeModel(bool recording = false) {
    if (recording)
      trace_ = new Trace();
    else
      enc_ = new RangeEncoder();
    rehash(1 << 13);
  }
  // decode mode
  RecodeModel(const uint8_t* data, size_t size)
      : dec_(new RangeDecoder(data, size)) {
    rehash(1 << 13);
  }
  ~RecodeModel() {
    delete enc_;
    delete dec_;
    delete trace_;
  }
  RecodeModel(const RecodeModel&) = delete;

  void put_bit(uint64_t key, int bit, int pcab = 0) {
    if (trace_) {
      Cell& c = cell(key);  // cell.pos repurposed as slot id in record mode
      trace_->slots.push_back(c.pos);
      trace_->bits.push_back((uint8_t)bit);
      trace_->pcabs.push_back((uint16_t)pcab);
      return;
    }
    Cell& c = cell(key);
    enc_->put(bit, prob(c, pcab));
    adapt(c, key, bit);
  }
  int get_bit(uint64_t key, int pcab = 0) {
    Cell& c = cell(key);
    int bit = dec_->get(prob(c, pcab));
    adapt(c, key, bit);
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

  // --- single-pass compress rollback ---------------------------------
  struct Snapshot {
    uint32_t epoch;
    size_t journal_len;
    uint64_t low;
    uint32_t range;
    uint8_t cache;
    uint64_t cache_size;
    size_t out_len;
  };

  Snapshot snapshot() {
    epoch_++;  // new epoch: future touches journal their prior state
    Snapshot s;
    s.epoch = epoch_;
    s.journal_len = journal_.size();
    enc_->save(&s.low, &s.range, &s.cache, &s.cache_size, &s.out_len);
    return s;
  }
  void commit(const Snapshot& s) { journal_.resize(s.journal_len); }
  void rollback(const Snapshot& s) {
    for (size_t i = journal_.size(); i-- > s.journal_len;) {
      const Undo& u = journal_[i];
      cells_[u.idx].pos = u.pos;
      cells_[u.idx].neg = u.neg;
      cells_[u.idx].epoch = u.prev_epoch;
    }
    journal_.resize(s.journal_len);
    enc_->restore(s.low, s.range, s.cache, s.cache_size, s.out_len);
  }

  Bytes finish() { return enc_->finish(); }
  const Trace* trace() const { return trace_; }

 private:
  static int bits_for(int v) {
    int n = 0;
    while (v >> n) n++;
    return n;
  }

  Cell& cell(uint64_t key) {
    if ((n_used_ + 1) * 4 > cap_ * 3) grow();
    size_t mask = cap_ - 1;
    size_t i = (size_t)(key * 0x9E3779B97F4A7C15ull >> 17) & mask;
    while (cells_[i].key != kEmpty && cells_[i].key != key) i = (i + 1) & mask;
    Cell& c = cells_[i];
    if (c.key == kEmpty) {
      c.key = key;
      if (trace_) {
        c.pos = (uint16_t)trace_->limits.size();  // slot id
        trace_->limits.push_back(
            (key >> 40) == K_SIG ? kHalveSig : kHalveDefault);
      } else {
        c.pos = c.neg = 1;
      }
      c.epoch = 0;
      n_used_++;
    }
    if (!trace_ && c.epoch != epoch_) {
      journal_.push_back({(uint32_t)i, c.pos, c.neg, c.epoch});
      c.epoch = epoch_;
    }
    return c;
  }

  uint32_t prob(const Cell& c, int pcab) const {
    int32_t p1 = kDiv.t[(c.pos + c.neg) * 97 + c.pos];
    if (pcab > 0) {
      int32_t total = c.pos + c.neg;
      int32_t w = 4 * total < 78 ? 4 * total : 78;
      p1 = (p1 * w + pcab * (80 - w)) / 80;
      if (p1 < 1) p1 = 1;
      if (p1 > 0xFFFF) p1 = 0xFFFF;
    } else if (p1 < 1) {
      p1 = 1;
    }
    return (uint32_t)p1;
  }
  void adapt(Cell& c, uint64_t key, int bit) {
    if (bit)
      c.pos++;
    else
      c.neg++;
    int limit = (key >> 40) == K_SIG ? kHalveSig : kHalveDefault;
    if (c.pos + c.neg > limit) {
      c.pos = (c.pos + 1) >> 1;
      c.neg = (c.neg + 1) >> 1;
    }
  }

  void rehash(size_t cap) {
    cap_ = cap;
    cells_.assign(cap, Cell{kEmpty, 0, 0, 0});
  }
  void grow() {
    // NOTE: journal indices reference cell positions; growth must remap
    // them.  Journaled rollback across growth is handled by remapping via
    // key lookup (rare path).
    std::vector<Cell> old = std::move(cells_);
    rehash(cap_ * 2);
    size_t mask = cap_ - 1;
    std::vector<uint32_t> remap(old.size(), 0);
    for (size_t i = 0; i < old.size(); i++) {
      if (old[i].key == kEmpty) continue;
      size_t j = (size_t)(old[i].key * 0x9E3779B97F4A7C15ull >> 17) & mask;
      while (cells_[j].key != kEmpty) j = (j + 1) & mask;
      cells_[j] = old[i];
      remap[i] = (uint32_t)j;
    }
    for (Undo& u : journal_) u.idx = remap[u.idx];
  }

  struct Undo {
    uint32_t idx;
    uint16_t pos, neg;
    uint32_t prev_epoch;
  };

  static constexpr uint64_t kEmpty = ~0ull;
  size_t cap_ = 0, n_used_ = 0;
  uint32_t epoch_ = 0;
  std::vector<Cell> cells_;
  std::vector<Undo> journal_;
  RangeEncoder* enc_ = nullptr;
  RangeDecoder* dec_ = nullptr;
  Trace* trace_ = nullptr;
};

}  // namespace avtpu
