"""CABAC engine tests: encoder<->decoder inverse property and re-encode
byte-exactness — the property decompression depends on (SURVEY.md §4:
"validate our encoder against the reference decoder" pattern, here closed
over our own spec-exact pair; real-stream validation happens in the parser
integration tests against x264 output)."""

import random

import numpy as np

from avrecode_tpu.ops.cabac import (
    CabacDecoder,
    CabacEncoder,
    init_context_states,
)


def _random_trace(seed, n_bins, n_ctx=460):
    """Generate a random (kind, ctx, bin) trace ending in terminate(1)."""
    rng = random.Random(seed)
    trace = []
    for _ in range(n_bins):
        r = rng.random()
        if r < 0.75:
            trace.append(("d", rng.randrange(n_ctx), rng.getrandbits(1)))
        elif r < 0.95:
            trace.append(("b", None, rng.getrandbits(1)))
        else:
            trace.append(("t", None, 0))
    trace.append(("t", None, 1))
    return trace


def _encode(trace, qp, idc):
    states = init_context_states(qp, idc)
    enc = CabacEncoder()
    for kind, ctx, b in trace:
        if kind == "d":
            enc.decision(states, ctx, b)
        elif kind == "b":
            enc.bypass(b)
        else:
            enc.terminate(b)
    return enc.bytes()


def _decode(data, trace_shape, qp, idc):
    states = init_context_states(qp, idc)
    dec = CabacDecoder(data)
    out = []
    for kind, ctx, _ in trace_shape:
        if kind == "d":
            out.append(("d", ctx, dec.decision(states, ctx)))
        elif kind == "b":
            out.append(("b", None, dec.bypass()))
        else:
            out.append(("t", None, dec.terminate()))
    return out


def test_init_states_known_values():
    # ctx 0 in I table has (m, n) = (20, -15): qp=26 -> pre = clip(20*26>>4 - 15)
    s = init_context_states(26, None)
    pre = min(max((20 * 26 >> 4) - 15, 1), 126)
    expect = ((63 - pre) << 1) | 0 if pre <= 63 else ((pre - 64) << 1) | 1
    assert s[0] == expect
    assert s.shape == (1024,)


def test_cabac_roundtrip_random():
    for seed in range(8):
        qp = (seed * 7 + 20) % 52
        idc = [None, 0, 1, 2][seed % 4]
        trace = _random_trace(seed, 3000)
        data = _encode(trace, qp, idc)
        decoded = _decode(data, trace, qp, idc)
        assert decoded == trace, f"seed={seed}"


def test_cabac_decode_reencode_byte_exact():
    """decode -> re-encode must reproduce the payload byte-for-byte.

    This is the decompression invariant: bins decoded from a CABAC payload,
    re-encoded through the engine with identical context evolution, must
    regenerate the exact original bytes (recode.cpp:1618 analog at the
    slice-payload level)."""
    for seed in range(6):
        qp = (seed * 11 + 3) % 52
        idc = [None, 0, 1, 2][seed % 4]
        trace = _random_trace(seed + 100, 5000)
        data = _encode(trace, qp, idc)

        # decode the bins (as decompression's model would deliver them)
        decoded = _decode(data, trace, qp, idc)
        # re-encode the decoded bins
        data2 = _encode(decoded, qp, idc)
        assert data2 == data, f"seed={seed}: {len(data)} vs {len(data2)}"


def test_cabac_terminate_only():
    # A slice whose very first decision is end_of_slice
    enc = CabacEncoder()
    enc.terminate(1)
    data = enc.bytes()
    dec = CabacDecoder(data)
    assert dec.terminate() == 1


def test_cabac_skewed_states_adapt():
    # Encoding a long run of MPS should cost well under 1 bit/bin.
    states = init_context_states(26, None)
    enc = CabacEncoder()
    for _ in range(4000):
        enc.decision(states, 60, 0)
    enc.terminate(1)
    assert len(enc.bytes()) < 400  # << 4000 bits

    states2 = init_context_states(26, None)
    dec = CabacDecoder(enc.bytes())
    for _ in range(4000):
        assert dec.decision(states2, 60) == 0
    assert dec.terminate() == 1
