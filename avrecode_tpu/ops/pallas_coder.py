"""Pallas TPU kernel for the recode entropy stage.

Grid (slices, chunks): each grid step processes CHUNK bins of one slice with
the adaptive estimator table in VMEM and the coder registers in SMEM — both
persist across the chunk axis (TPU grids iterate the last axis innermost),
so arbitrarily long slices stream through fixed-size VMEM windows.  The
(N, 1) column layout costs 128x VMEM tiling waste, which is why chunking is
load-bearing: windows stay ~1 MB regardless of slice length.

The kernel emits RAW (byte, carry-flag) token candidates; the host folds
pending carries (rare events — O(#carries) ripple) and applies the
flush-truncation rule, exactly mirroring ops/rangecoder.py's deferred
cache/0xFF-run semantics.  Output streams are byte-identical to the host
model coder (tests/test_pallas.py).

Measured: ~70 Mbins/s on one v5e core vs ~0.35 Mbins/s for the XLA scan
formulation (per-step dynamic updates on blocked carries).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.trace import N_CLS

TOP = 1 << 24
SIGN = -0x80000000
CHUNK = 1024  # bins per grid step (VMEM: in+out windows double-buffered)


def _ult(a, b):
    """Unsigned int32 a < b."""
    return (a ^ jnp.int32(SIGN)) < (b ^ jnp.int32(SIGN))


APM_STRIDE = 34  # APM rows per (class, history) block in the (R, 1)
# scratch: 33 cells (aj <= 31, interpolation reads aj+1 <= 32) + 1 pad.
# Kept tight deliberately — the scratch is tiled (8, 128) with one live
# lane, so every extra row costs 512 B of the 16 MB scoped-VMEM stack;
# the round-5 key-class growth (N_CLS 63 -> 79, CAVLC) overflowed the
# stack by 376 KB at the old stride of 40.


def _kernel(slots_ref, bits_ref, pcabs_ref, valid_ref, limits_ref, tbl_ref,
            apm_init_ref, tok_out, carry_out, count_out, est_ref, w_ref,
            apm_ref, state_ref):
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        # est rows: [pos, neg, fpos, fneg, last(2=none), last2, pad...]
        cole = jax.lax.broadcasted_iota(jnp.int32, est_ref.shape, 1)
        est_ref[:, :] = jnp.where(cole < 4, 1, jnp.where(cole < 6, 2, 0))
        # mixer weights per key class: [w_est, w_cab, w_bias, w_fast,
        # w_hist, w_hist2, pad...]
        colw = jax.lax.broadcasted_iota(jnp.int32, w_ref.shape, 1)
        w_ref[:, :] = jnp.where(colw < 2, 24576, 0)
        # model v10 APM cells: one APM_STRIDE-row block per (class, history
        # ctx), each initialized to the identity row (squash of centers)
        def initcls(k, acc):
            apm_ref[pl.ds(k * APM_STRIDE, APM_STRIDE), :] = apm_init_ref[:, :]
            return acc

        jax.lax.fori_loop(0, apm_ref.shape[0] // APM_STRIDE, initcls, 0)
        state_ref[0] = 0   # low
        state_ref[1] = 0   # pend
        state_ref[2] = -1  # rng = 0xFFFFFFFF
    # token position is chunk-local; outputs are per-chunk segments

    def emit(pos, low, pend, rng, do):
        byte = (low >> 24) & 0xFF

        @pl.when(do)
        def _():
            tok_out[pl.ds(pos, 1), :] = byte.reshape(1, 1)
            carry_out[pl.ds(pos, 1), :] = pend.reshape(1, 1)

        low = jnp.where(do, low << 8, low)
        pend = jnp.where(do, 0, pend)
        rng = jnp.where(do, rng << 8, rng)
        pos = jnp.where(do, pos + 1, pos)
        return pos, low, pend, rng

    def body(i, st):
        low, pend, rng, pos = st
        v = valid_ref[pl.ds(i, 1), :][0, 0]
        slot = slots_ref[pl.ds(i, 1), :][0, 0]
        bit = bits_ref[pl.ds(i, 1), :][0, 0]
        pcab = pcabs_ref[pl.ds(i, 1), :][0, 0]

        equad = est_ref[pl.ds(slot, 1), :]
        e0 = equad[0, 0]
        e1 = equad[0, 1]
        f0 = equad[0, 2]
        f1 = equad[0, 3]
        lb = equad[0, 4]
        lb2 = equad[0, 5]
        total = e0 + e1
        # logistic mixing + dual-rate counter (model.h mix_prob/update_mix/
        # adapt mirror, model v4): stretch/squash live in tbl_ref columns
        # 0/1, per-class weights in w_ref
        pe = jnp.clip((e0 << 16) // total, 1, 0xFFFF)
        pf = jnp.clip((f0 << 16) // (f0 + f1), 1, 0xFFFF)
        lrow = limits_ref[pl.ds(slot, 1), :]
        cls = lrow[0, 1]
        wrow = w_ref[pl.ds(cls, 1), :]
        w0, w1, w2 = wrow[0, 0], wrow[0, 1], wrow[0, 2]
        w3, w4, w5 = wrow[0, 3], wrow[0, 4], wrow[0, 5]
        x0 = tbl_ref[pl.ds(pe >> 4, 1), :][0, 0]
        x1 = jnp.where(pcab > 0, tbl_ref[pl.ds(pcab >> 4, 1), :][0, 0], 0)
        x3 = tbl_ref[pl.ds(pf >> 4, 1), :][0, 0]
        x4 = jnp.where(lb == 2, 0, jnp.where(lb == 1, 256, -256))
        x5 = jnp.where(lb2 == 2, 0, jnp.where(lb2 == 1, 128, -128))
        dot = ((w0 >> 6) * x0 + (w1 >> 6) * x1 + (w2 >> 6) * 77
               + (w3 >> 6) * x3 + (w4 >> 6) * x4 + (w5 >> 6) * x5) >> 10
        dot = jnp.clip(dot, -2048, 2047)
        # model v10 APM stage (model.h::mix_prob mirror): map keyed on
        # (class, 2-bit key history, stretch bucket)
        pmix = tbl_ref[pl.ds(dot + 2048, 1), :][0, 1]
        u = tbl_ref[pl.ds(pmix >> 4, 1), :][0, 0] + 2048
        aj = u >> 7
        frac = u - (aj << 7)
        h = jnp.where(jnp.logical_or(lb == 2, lb2 == 2), 4, lb * 2 + lb2)
        arow = (cls * 5 + h) * APM_STRIDE + aj
        a0 = apm_ref[pl.ds(arow, 1), :][0, 0]
        a1 = apm_ref[pl.ds(arow + 1, 1), :][0, 0]
        pa = (a0 * (128 - frac) + a1 * frac) >> 7
        pb = jnp.clip((pmix + pa) >> 1, 1, 65535)
        p1 = tbl_ref[pl.ds(tbl_ref[pl.ds(pb >> 4, 1), :][0, 0] + 2048, 1),
                     :][0, 1]
        tgt = bit << 16
        a0n = a0 + (((tgt - a0) * (128 - frac)) >> 13)  # >> (7 + kApmRate)
        a1n = a1 + (((tgt - a1) * frac) >> 13)

        @pl.when(v == 1)
        def _():
            apm_ref[pl.ds(arow, 1), :] = a0n.reshape(1, 1)
            apm_ref[pl.ds(arow + 1, 1), :] = a1n.reshape(1, 1)

        err = tgt - pmix  # the mixer learns on its pre-APM output
        w0n = jnp.clip(w0 + ((err * x0) >> 14), -(1 << 24), 1 << 24)
        w1n = jnp.clip(w1 + ((err * x1) >> 14), -(1 << 24), 1 << 24)
        w2n = jnp.clip(w2 + ((err * 77) >> 14), -(1 << 24), 1 << 24)
        w3n = jnp.clip(w3 + ((err * x3) >> 14), -(1 << 24), 1 << 24)
        w4n = jnp.clip(w4 + ((err * x4) >> 14), -(1 << 24), 1 << 24)
        w5n = jnp.clip(w5 + ((err * x5) >> 14), -(1 << 24), 1 << 24)

        @pl.when(v == 1)
        def _():
            w_ref[pl.ds(cls, 1), :] = jnp.stack(
                [w0n, w1n, w2n, w3n, w4n, w5n, jnp.int32(0), jnp.int32(0)]
            ).reshape(1, 8)

        inc1 = jnp.where(bit == 1, 1, 0)
        e0n = e0 + inc1
        e1n = e1 + (1 - inc1)
        f0n = f0 + inc1
        f1n = f1 + (1 - inc1)
        halve = (e0n + e1n) > limits_ref[pl.ds(slot, 1), :][0, 0]
        e0n = jnp.where(halve, (e0n + 1) >> 1, e0n)
        e1n = jnp.where(halve, (e1n + 1) >> 1, e1n)
        fhalve = (f0n + f1n) > 0x18  # kHalveFast
        f0n = jnp.where(fhalve, (f0n + 1) >> 1, f0n)
        f1n = jnp.where(fhalve, (f1n + 1) >> 1, f1n)

        @pl.when(v == 1)
        def _():
            est_ref[pl.ds(slot, 1), :] = jnp.stack(
                [e0n, e1n, f0n, f1n, bit, lb, jnp.int32(0), jnp.int32(0)]
            ).reshape(1, 8)

        r1 = ((rng >> 16) & 0xFFFF) * p1
        low_a = low + r1
        carry = jnp.where(_ult(low_a, low), 1, 0)
        low_n = jnp.where(bit == 1, low, low_a)
        pend_n = pend + jnp.where(bit == 1, 0, carry)
        rng_n = jnp.where(bit == 1, r1, rng - r1)

        do0 = jnp.logical_and(_ult(rng_n, jnp.int32(TOP)), v == 1)
        pos_n, low_n, pend_n, rng_n = emit(pos, low_n, pend_n, rng_n, do0)
        do1 = jnp.logical_and(_ult(rng_n, jnp.int32(TOP)), v == 1)
        pos_n, low_n, pend_n, rng_n = emit(pos_n, low_n, pend_n, rng_n, do1)

        low = jnp.where(v == 1, low_n, low)
        pend = jnp.where(v == 1, pend_n, pend)
        rng = jnp.where(v == 1, rng_n, rng)
        pos = jnp.where(v == 1, pos_n, pos)
        return low, pend, rng, pos

    low, pend, rng, pos = jax.lax.fori_loop(
        0,
        slots_ref.shape[0],
        body,
        (state_ref[0], state_ref[1], state_ref[2], jnp.int32(0)),
    )

    # final chunk: shortest-terminator flush (mirror of rangecoder.py):
    # round low up to the next 2^24 multiple (renorm keeps range >= 2^24),
    # fold the carry into pend, emit the revealed byte + the flush event
    def flush(args):
        low, pend, rng, pos = args
        low_r = (low + jnp.int32(TOP - 1)) & jnp.int32(-(1 << 24))
        pend = pend + jnp.where(_ult(low_r, low), 1, 0)
        low = low_r
        for _ in range(2):
            pos, low, pend, rng = emit(pos, low, pend, rng, jnp.bool_(True))
        return low, pend, rng, pos

    low, pend, rng, pos = jax.lax.cond(
        c == n_chunks - 1, flush, lambda a: a, (low, pend, rng, pos)
    )

    state_ref[0] = low
    state_ref[1] = pend
    state_ref[2] = rng
    count_out[0, :, :] = jnp.full_like(count_out[0, :, :], pos)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _encode_raw(slots, bits, pcabs, limits, valid, cls, interpret=False):
    S, T = slots.shape
    NS = limits.shape[1]
    NSp = -(-NS // 8) * 8
    if NSp != NS:
        limits = jnp.pad(limits, ((0, 0), (0, NSp - NS)), constant_values=0x60)
        cls = jnp.pad(cls, ((0, 0), (0, NSp - NS)))
        NS = NSp
    Tp = -(-T // CHUNK) * CHUNK
    if Tp != T:
        pad = ((0, 0), (0, Tp - T))
        slots = jnp.pad(slots, pad)
        bits = jnp.pad(bits, pad)
        pcabs = jnp.pad(pcabs, pad)
        valid = jnp.pad(valid, pad)
        T = Tp
    NC = T // CHUNK
    CAP = 2 * CHUNK + 8

    def col(x):
        return x.astype(jnp.int32).reshape(-1, 1)

    bin_spec = pl.BlockSpec((CHUNK, 1), lambda s, c: (s * NC + c, 0))
    seg_spec = pl.BlockSpec((CAP, 1), lambda s, c: (s * NC + c, 0))
    toks, carrs, counts = pl.pallas_call(
        _kernel,
        grid=(S, NC),
        in_specs=[
            bin_spec,
            bin_spec,
            bin_spec,
            bin_spec,
            pl.BlockSpec((NS, 2), lambda s, c: (s, 0)),
            pl.BlockSpec((4096, 2), lambda s, c: (0, 0)),
            pl.BlockSpec((APM_STRIDE, 1), lambda s, c: (0, 0)),
        ],
        out_specs=[
            seg_spec,
            seg_spec,
            pl.BlockSpec((1, 8, 128), lambda s, c: (s * NC + c, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S * NC * CAP, 1), jnp.int32),
            jax.ShapeDtypeStruct((S * NC * CAP, 1), jnp.int32),
            jax.ShapeDtypeStruct((S * NC, 8, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NS, 8), jnp.int32),
            # per-class mixer weight rows; must hold N_CLS rows (rounded to
            # the 8-row VMEM tile)
            pltpu.VMEM((max(64, -(-N_CLS // 8) * 8), 8), jnp.int32),
            # model v10 APM cells: APM_STRIDE rows per (class, history
            # ctx), (R, 1) layout
            pltpu.VMEM((max(64, -(-N_CLS // 8) * 8) * 5 * APM_STRIDE, 1),
                       jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
        ],
        interpret=interpret,
    )(col(slots), col(bits), col(pcabs), col(valid), _limits2(limits, cls),
      _mix_tbl(), _apm_init_col())
    return (
        toks.reshape(S, NC, CAP),
        carrs.reshape(S, NC, CAP),
        counts.reshape(S, NC, 8, 128)[:, :, 0, 0],
    )


def _limits2(limits, cls):
    """[S, NS] x2 -> [S*NS, 2]: column 0 = halving limit, column 1 = key
    class id (the mixer weight context)."""
    S, NS = limits.shape
    rep = jnp.stack([limits, cls], axis=-1).astype(jnp.int32)
    return rep.reshape(S * NS, 2)


def _mix_tbl():
    """[4096, 2] int32: column 0 = stretch, column 1 = squash."""
    from ._mix_tables import SQUASH, STRETCH12

    return jnp.stack(
        [jnp.asarray(STRETCH12, jnp.int32), jnp.asarray(SQUASH, jnp.int32)],
        axis=-1,
    )


def _apm_init_col():
    """[APM_STRIDE, 1] int32: the identity APM row (model v10), padded."""
    from ..models.h264_model import _apm_row

    row = np.zeros((APM_STRIDE, 1), np.int32)
    row[: len(_apm_row()), 0] = _apm_row()
    return jnp.asarray(row)


def finalize_streams(toks, carrs, counts):
    """Host-side: per-chunk raw segments -> final per-slice stream bytes.

    Folds pending carries (chronological ripple through 0xFF runs) and
    applies the flush-truncation rule — the numpy mirror of
    estimator_jax.resolve_carries."""
    toks = np.asarray(toks)
    carrs = np.asarray(carrs)
    counts = np.asarray(counts)
    S, NC, CAP = toks.shape
    out = []
    for s in range(S):
        segs = [toks[s, c, : counts[s, c]] for c in range(NC)]
        csegs = [carrs[s, c, : counts[s, c]] for c in range(NC)]
        tok = np.concatenate(segs) if segs else np.zeros(0, np.int32)
        car = np.concatenate(csegs) if csegs else np.zeros(0, np.int32)
        raw = tok.copy()
        if len(tok):
            # base-256 addition toward lower indices, vectorized: each pass
            # propagates overflow one position (passes = longest 0xFF run)
            val = tok.astype(np.int64)
            val[:-1] += car[1:]
            while True:
                ov = val >> 8
                if not ov.any():
                    break
                val &= 0xFF
                val[:-1] += ov[1:]
            tok = val.astype(np.int32)
        # truncation: last token satisfying the host flush condition
        flushable = (raw != 0xFF) | (car > 0)
        nz = np.nonzero(flushable)[0]
        j_last = int(nz[-1]) if len(nz) else 0
        # shortest-terminator strip on resolved bytes (decoder zero-fills)
        out.append(bytes(tok[:j_last].astype(np.uint8)).rstrip(b"\x00"))
    return out


GROUP = 16  # slices per kernel launch: the (N,1) device layout carries the
# T(8,128) tiling (128x HBM footprint), so the per-dispatch working set is
# bounded by the group size (~0.33 GB/slice at T~100k)


def encode_slices_pallas(slots, bits, pcabs, limits, valid, cls=None,
                         interpret=False):
    """Full device entropy stage via the Pallas kernel.

    Returns a list of per-slice stream bytes, identical to the host
    RecodeModel streams.  All groups are dispatched asynchronously before
    any result is read back, overlapping transfer/compute across groups."""
    S = slots.shape[0]
    pending = []
    for lo in range(0, S, GROUP):
        hi = min(lo + GROUP, S)
        pad = GROUP - (hi - lo)

        def g(x):
            part = np.asarray(x[lo:hi])
            if pad:
                part = np.concatenate(
                    [part, np.zeros((pad,) + part.shape[1:], part.dtype)]
                )
            return jnp.asarray(part)

        gc = g(cls) if cls is not None else jnp.zeros_like(g(limits))
        pending.append(
            (
                hi - lo,
                _encode_raw(
                    g(slots), g(bits), g(pcabs), g(limits), g(valid), gc,
                    interpret=interpret,
                ),
            )
        )
    streams = []
    for n, (toks, carrs, counts) in pending:
        streams.extend(finalize_streams(toks, carrs, counts)[:n])
    return streams


def _pow2_at_least(v, floor):
    n = floor
    while n < v:
        n *= 2
    return n


def encode_traces_pallas(traces, interpret=False):
    """Trace-list front end with length-bucketed packing: traces are sorted
    by length and packed per GROUP with per-group T (pow-2 rounded, so both
    padding waste and the number of distinct compiled shapes stay bounded).
    Uniform [S, T_max] packing would materialize GBs when one long GOP
    coexists with short ones."""
    import numpy as np

    order = sorted(range(len(traces)), key=lambda i: len(traces[i]))
    streams = [None] * len(traces)
    NS = _pow2_at_least(max((len(t.limits) for t in traces), default=1), 64)
    pending = []
    for lo in range(0, len(order), GROUP):
        grp = order[lo : lo + GROUP]
        T = _pow2_at_least(max(max(len(traces[i]) for i in grp), 1), CHUNK)
        S = GROUP
        slots = np.zeros((S, T), np.int32)
        bits = np.zeros((S, T), np.int32)
        pcabs = np.zeros((S, T), np.int32)
        valid = np.zeros((S, T), np.int32)
        limits = np.full((S, NS), 0x60, np.int32)
        cls = np.zeros((S, NS), np.int32)
        for row, i in enumerate(grp):
            t = traces[i]
            k = len(t)
            slots[row, :k] = t.slots
            bits[row, :k] = t.bits
            pcabs[row, :k] = t.pcabs
            valid[row, :k] = 1
            limits[row, : len(t.limits)] = t.limits
            cls[row, : len(t.cls)] = t.cls
        pending.append(
            (
                grp,
                _encode_raw(
                    jnp.asarray(slots), jnp.asarray(bits), jnp.asarray(pcabs),
                    jnp.asarray(limits), jnp.asarray(valid), jnp.asarray(cls),
                    interpret=interpret,
                ),
            )
        )
    for grp, (toks, carrs, counts) in pending:
        out = finalize_streams(toks, carrs, counts)
        for row, i in enumerate(grp):
            streams[i] = out[row]
    return streams
