"""Trace-recording model: captures the per-slice recode bin stream as dense
arrays for the device (JAX/Pallas) compress path.

In compress direction the model never influences parsing (bins come from the
real CABAC payload), so a recorder is a drop-in replacement for RecodeModel:
the parser runs once on the host producing, per slice,

    slots : int32[T]   dense estimator slot per bin (first-appearance order)
    bits  : int32[T]   the bin values
    pcabs : int32[T]   CABAC-state mixing prior (0 = no mixing)
    p1s   : int32[T]   EXACT model probability per bin (recorder adapts its
                       estimators like the encoder), so a bare range coder
                       on the device reproduces host streams with no
                       estimator state — the lane-parallel fast path
    limits: int32[S]   per-slot halving limit (0x50 sig / 0x60 default)

which the device consumes to reproduce the exact host model arithmetic
(ops/estimator_jax.py, ops/lane_coder.py) — the dense-array replacement for
the per-bin std::map path called out as the reference's hotspot
(SURVEY.md §3 hot loop #3).
"""

from .h264_model import HALVE_DEFAULT, HALVE_SIG


class TraceModel:
    def __init__(self):
        self.slot_of = {}
        self.limits = []
        self.slots = []
        self.bits = []
        self.pcabs = []
        self.p1s = []
        self.est = {}  # slot -> [pos, neg]; adapted exactly like RecodeModel

    def _slot(self, key):
        s = self.slot_of.get(key)
        if s is None:
            s = len(self.limits)
            self.slot_of[key] = s
            self.limits.append(HALVE_SIG if key[0] == "sig" else HALVE_DEFAULT)
        return s

    def put_bit(self, key, bit, pcab=None):
        s = self._slot(key)
        e = self.est.get(s)
        if e is None:
            e = self.est[s] = [1, 1]
        # identical integer arithmetic to RecodeModel._prob_update/_adapt
        p1 = (e[0] << 16) // (e[0] + e[1])
        if pcab is not None:
            total = e[0] + e[1]
            w = min(4 * total, 78)
            p1 = (p1 * w + pcab * (80 - w)) // 80
        p1 = 1 if p1 < 1 else (0xFFFF if p1 > 0xFFFF else p1)
        bit = int(bit)
        e[bit ^ 1] += 1
        if e[0] + e[1] > self.limits[s]:
            e[0] = (e[0] + 1) >> 1
            e[1] = (e[1] + 1) >> 1
        self.slots.append(s)
        self.bits.append(bit)
        self.pcabs.append(0 if pcab is None else int(pcab))
        self.p1s.append(p1)

    def put_nnz(self, nnz, cat, max_coeff, prior):
        v = nnz - 1
        nb = (max_coeff - 1).bit_length()
        prefix = 0
        pb = min(prior, 15)
        for i in range(nb - 1, -1, -1):
            bit = (v >> i) & 1
            self.put_bit(("nnz", cat, i, prefix, pb), bit)
            prefix = (prefix << 1) | bit

    def __len__(self):
        return len(self.bits)
