"""Lane-parallel device entropy DECODER (ops/lane_decoder.py): byte-exact
inversion of the lane/host encoders, on synthetic lanes and on real-video
traces, plus a mesh-sharded run (lanes over devices)."""

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avrecode_tpu.ops.lane_coder import (
    finalize_lanes,
    lane_encode_scan,
    split_lanes,
)
from avrecode_tpu.ops.lane_decoder import decode_streams_lanes
from avrecode_tpu.ops.rangecoder import PROB_ONE, RangeEncoder

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")


def _roundtrip(bitp1, lens):
    tok, car, ftok, fcar = lane_encode_scan(
        jnp.asarray(bitp1), jnp.asarray(lens)
    )
    streams = finalize_lanes(tok, car, ftok, fcar, lens)
    p1s = np.asarray(bitp1) & 0xFFFF
    bits = np.asarray(decode_streams_lanes(streams, p1s, lens))
    want = (np.asarray(bitp1) >> 16) & 1
    mask = np.arange(bitp1.shape[1])[None, :] < np.asarray(lens)[:, None]
    assert np.array_equal(bits * mask, want * mask)


def test_decode_inverts_encode_synthetic():
    rng = np.random.RandomState(7)
    L, B = 64, 256
    p1 = rng.randint(1, PROB_ONE, (L, B)).astype(np.int64)
    bit = rng.randint(0, 2, (L, B)).astype(np.int64)
    lens = rng.randint(1, B + 1, L).astype(np.int32)
    _roundtrip((p1 | (bit << 16)).astype(np.int32), lens)


def test_decode_matches_host_encoder_per_lane():
    rng = np.random.RandomState(3)
    B = 128
    p1 = rng.randint(1, PROB_ONE, B)
    bit = rng.randint(0, 2, B)
    enc = RangeEncoder()
    for b, p in zip(bit, p1):
        enc.put(int(b), int(p))
    stream = bytes(enc.finish())
    bits = np.asarray(
        decode_streams_lanes([stream], p1[None, :].astype(np.int32),
                             np.array([B], np.int32))
    )
    assert np.array_equal(bits[0], bit)


def _trace():
    from avrecode_tpu.host import native

    if not native.available():
        pytest.skip("native library not built")
    path = os.path.join(DATA, "rt_gop.mp4")
    if not os.path.exists(path):
        subprocess.run(
            [GEN, path, "192", "160", "12", "30", "4", "1", "26", "9", "1"],
            check=True,
            capture_output=True,
        )
    data = open(path, "rb").read()
    _, _, _, traces, _ = __import__(
        "avrecode_tpu.parallel.pipeline", fromlist=["extract_traces"]
    ).extract_traces(data, scope="gop")
    return [t for t in traces if len(t)]


def test_decode_real_trace():
    traces = _trace()
    bitp1, lens, _ = split_lanes(traces, 1024)
    _roundtrip(bitp1, lens)


def test_decode_mesh_sharded():
    """Lanes shard over the 8-device mesh; decode is collective-free."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from avrecode_tpu.ops.lane_decoder import lane_decode_scan

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    traces = _trace()
    bitp1, lens, _ = split_lanes(traces, 512)
    L = -(-bitp1.shape[0] // 8) * 8
    bitp1 = np.pad(np.asarray(bitp1), ((0, L - bitp1.shape[0]), (0, 0)))
    lens = np.pad(np.asarray(lens), (0, L - lens.shape[0]))
    tok, car, ftok, fcar = lane_encode_scan(
        jnp.asarray(bitp1), jnp.asarray(lens)
    )
    streams = finalize_lanes(tok, car, ftok, fcar, lens)
    M = max(4 + 2 * bitp1.shape[1], max(len(s) for s in streams)) + 4
    buf = np.zeros((L, M), np.int32)
    for i, s in enumerate(streams):
        buf[i, : len(s)] = np.frombuffer(s, np.uint8)
    p1s = (bitp1 & 0xFFFF).astype(np.int32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("lane",))
    sh = NamedSharding(mesh, P("lane"))
    bits = jax.jit(lane_decode_scan)(
        jax.device_put(jnp.asarray(buf), sh),
        jax.device_put(jnp.asarray(p1s), sh),
        jax.device_put(jnp.asarray(lens), sh),
    )
    ref = np.asarray(lane_decode_scan(jnp.asarray(buf), jnp.asarray(p1s),
                                      jnp.asarray(lens)))
    assert np.array_equal(np.asarray(bits), ref)
    want = (bitp1 >> 16) & 1
    mask = np.arange(bitp1.shape[1])[None, :] < lens[:, None]
    assert np.array_equal(np.asarray(bits) * mask, want * mask)
