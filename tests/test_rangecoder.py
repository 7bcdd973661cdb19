"""Randomized roundtrip tests for the recoded-stream range coder.

Mirrors the reference's coder test strategy (test/arithmetic_code.cpp:93-111):
random symbol streams at assorted probabilities must decode back exactly.
"""

import random

from avrecode_tpu.ops.rangecoder import RangeDecoder, RangeEncoder


def _roundtrip(bits, probs):
    enc = RangeEncoder()
    for b, p in zip(bits, probs):
        enc.put(b, p)
    data = enc.finish()
    dec = RangeDecoder(data)
    out = [dec.get(p) for p in probs]
    return data, out


def test_roundtrip_p_half():
    rng = random.Random(1234)
    bits = [rng.getrandbits(1) for _ in range(20000)]
    probs = [1 << 15] * len(bits)
    data, out = _roundtrip(bits, probs)
    assert out == bits
    # p=1/2 must cost ~1 bit/symbol
    assert abs(len(data) - len(bits) // 8) < 32


def test_roundtrip_random_probs():
    rng = random.Random(99)
    n = 50000
    probs = [rng.randint(1, 0xFFFF) for _ in range(n)]
    bits = [1 if rng.random() * 0x10000 < p else 0 for p in probs]
    _, out = _roundtrip(bits, probs)
    assert out == bits


def test_roundtrip_extreme_probs():
    rng = random.Random(7)
    n = 30000
    probs, bits = [], []
    for _ in range(n):
        p = rng.choice([1, 2, 0xFFFE, 0xFFFF, 0x8000, 100, 0xFF00])
        probs.append(p)
        bits.append(rng.getrandbits(1))
    _, out = _roundtrip(bits, probs)
    assert out == bits


def test_skewed_compresses():
    # 99% ones at p1=0.99 should cost well under 0.1 bits/symbol
    rng = random.Random(5)
    n = 40000
    p = int(0.99 * 0x10000)
    bits = [1 if rng.random() < 0.99 else 0 for _ in range(n)]
    data, out = _roundtrip(bits, [p] * n)
    assert out == bits
    assert len(data) < n * 0.085 / 8 * 8  # < ~0.085 bytes... loose sanity
    assert len(data) * 8 < 0.12 * n


def test_empty_and_tiny():
    for n in range(0, 12):
        rng = random.Random(n)
        bits = [rng.getrandbits(1) for _ in range(n)]
        probs = [rng.randint(1, 0xFFFF) for _ in range(n)]
        _, out = _roundtrip(bits, probs)
        assert out == bits


def test_carry_chain():
    # Force long sequences of near-certain symbols to exercise 0xFF carry runs.
    enc = RangeEncoder()
    pattern = []
    for i in range(5000):
        b = 0 if i % 613 else 1
        pattern.append(b)
        enc.put(b, 0xFFFF if b == 0 else 1)  # always take the improbable path
    data = enc.finish()
    dec = RangeDecoder(data)
    for i, b in enumerate(pattern):
        assert dec.get(0xFFFF if b == 0 else 1) == b, i
