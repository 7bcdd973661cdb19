"""Adaptive probability model for the recoded stream.

The successor of the reference's h264_model (recode.cpp:625-1066):
  * estimator = (pos, neg) counters, init (1, 1), halved past a count limit
    (0x60 default, 0x50 for significance-map keys — recode.cpp:1048-1052),
  * probability = pos / (pos + neg) in 16-bit fixed point,
  * model keys are small tuples from the parser (context id + richer
    conditioning: neighbor buckets, bin position, nnz progress).

Differences from the reference (wins):
  * bypass bins (mvd suffixes, level escapes, signs) are modeled too — the
    reference codes them at p=1/2 (recode.cpp:1091-1094); we adapt them,
  * significance runs forced by nnz are fully elided (reference codes them
    with rich contexts but still spends bits),
  * end_of_slice terminates are elided via the stored mb_count.

This Python implementation is the semantics oracle; the device path
(ops/estimator_jax.py) and the C++ host path implement the identical integer
recurrence and are differential-tested against it.

Key -> slot mapping is a deterministic insertion-order dict, mirroring the
reference's dynamically grown std::map (recode.cpp:1064-1065).  Compress and
decompress touch keys in identical order, so the mapping never needs to be
stored in the container.
"""

from ..ops.rangecoder import RangeDecoder, RangeEncoder

HALVE_DEFAULT = 0x60
HALVE_SIG = 0x50


class RecodeModel:
    """mode='encode' wraps a RangeEncoder; mode='decode' a RangeDecoder."""

    def __init__(self, mode, data=None):
        self.mode = mode
        if mode == "encode":
            self.rc = RangeEncoder()
        else:
            self.rc = RangeDecoder(data)
        self.est = {}  # key -> [pos, neg]
        self.bill = {}  # key-class -> recoded bits (approx, for the ledger)

    # -- estimator core --------------------------------------------------
    def _prob_update(self, key, pcab):
        e = self.est.get(key)
        if e is None:
            e = self.est[key] = [1, 1]
        p1 = (e[0] << 16) // (e[0] + e[1])
        if pcab is not None:
            # mix with the live CABAC-state prior: weight shifts toward the
            # estimator as it accumulates evidence (total grows to the halve
            # limit), fixing cold starts without diluting steady state
            total = e[0] + e[1]
            w = min(4 * total, 78)
            p1 = (p1 * w + pcab * (80 - w)) // 80
        p1 = 1 if p1 < 1 else (0xFFFF if p1 > 0xFFFF else p1)
        return e, p1

    def _adapt(self, key, e, bit):
        e[bit ^ 1] += 1  # index 0 counts ones, index 1 counts zeros
        limit = HALVE_SIG if key[0] == "sig" else HALVE_DEFAULT
        if e[0] + e[1] > limit:
            e[0] = (e[0] + 1) >> 1
            e[1] = (e[1] + 1) >> 1

    def put_bit(self, key, bit, pcab=None):
        e, p1 = self._prob_update(key, pcab)
        n0 = len(self.rc.out)
        self.rc.put(bit, p1)
        cls = key[0]
        self.bill[cls] = self.bill.get(cls, 0) + (len(self.rc.out) - n0) * 8
        self._adapt(key, e, bit)

    def get_bit(self, key, pcab=None):
        e, p1 = self._prob_update(key, pcab)
        bit = self.rc.get(p1)
        self._adapt(key, e, bit)
        return bit

    # -- out-of-band num_nonzeros (reference C9) ------------------------
    def _nnz_bits(self, max_coeff):
        return (max_coeff - 1).bit_length()

    def put_nnz(self, nnz, cat, max_coeff, prior):
        v = nnz - 1  # cbf/cbp guarantees >= 1
        nb = self._nnz_bits(max_coeff)
        prefix = 0
        pb = min(prior, 15)
        for i in range(nb - 1, -1, -1):
            bit = (v >> i) & 1
            self.put_bit(("nnz", cat, i, prefix, pb), bit)
            prefix = (prefix << 1) | bit

    def get_nnz(self, cat, max_coeff, prior):
        nb = self._nnz_bits(max_coeff)
        v = 0
        prefix = 0
        pb = min(prior, 15)
        for i in range(nb - 1, -1, -1):
            bit = self.get_bit(("nnz", cat, i, prefix, pb))
            v = (v << 1) | bit
            prefix = (prefix << 1) | bit
        return v + 1

    # -- snapshot / rollback (compress-side literal fallback) -----------
    def snapshot(self):
        assert self.mode == "encode"
        rc = self.rc
        return (
            {k: list(v) for k, v in self.est.items()},
            (rc.low, rc.range, rc.cache, rc.cache_size, len(rc.out)),
            dict(self.bill),
        )

    def rollback(self, snap):
        est, (low, rng, cache, csize, outlen), bill = snap
        self.est = {k: list(v) for k, v in est.items()}
        rc = self.rc
        rc.low, rc.range, rc.cache, rc.cache_size = low, rng, cache, csize
        del rc.out[outlen:]
        self.bill = dict(bill)

    def finish(self):
        assert self.mode == "encode"
        return self.rc.finish()
