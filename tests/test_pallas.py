"""Pallas kernel differential test (interpreter mode on CPU): the chunked
entropy-stage kernel must produce streams byte-identical to the host model
coder, including multi-chunk slices, ragged tails, and carry runs."""

import numpy as np
import pytest

from avrecode_tpu.ops.estimator_jax import encode_slices, stream_bytes
from avrecode_tpu.ops import pallas_coder


def _args(seed, S, T, NS, skew=False):
    rng = np.random.RandomState(seed)
    slots = rng.randint(0, NS, (S, T)).astype(np.int32)
    if skew:
        # heavily skewed bits force long carry runs through the coder
        bits = (rng.rand(S, T) < 0.98).astype(np.int32)
    else:
        bits = rng.randint(0, 2, (S, T)).astype(np.int32)
    pcabs = rng.randint(0, 0xFFFF, (S, T)).astype(np.int32)
    limits = np.full((S, NS), 0x60, np.int32)
    valid = np.ones((S, T), np.int32)
    valid[0, T - T // 3 :] = 0  # ragged tail
    return slots, bits, pcabs, limits, valid


@pytest.mark.parametrize("seed,T,skew", [(0, 200, False), (1, 700, False), (2, 700, True)])
def test_pallas_matches_host(seed, T, skew, monkeypatch):
    monkeypatch.setattr(pallas_coder, "CHUNK", 256)
    args = _args(seed, 2, T, 64, skew)
    ref_out, ref_lens = encode_slices(*args)
    streams = pallas_coder.encode_slices_pallas(*args, interpret=True)
    for i in range(2):
        ref = bytes(np.asarray(ref_out[i][: int(ref_lens[i])], np.uint8))
        assert streams[i] == ref, f"slice {i}: {len(ref)} vs {len(streams[i])}"
