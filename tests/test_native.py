"""Native library differential tests: the C++ host path must produce
containers byte-identical to the Python codec in every scope, roundtrip
bit-exact, and the thread-parallel GOP paths must match serial output."""

import os
import subprocess

import pytest

from avrecode_tpu.codec import compress, decompress

ROOT = os.path.join(os.path.dirname(__file__), "..")
DATA = os.path.join(ROOT, "data")


def _native():
    from avrecode_tpu.host import native

    if not native.available():
        subprocess.run(
            ["make", "-C", os.path.join(ROOT, "avrecode_tpu", "host")],
            check=True,
            capture_output=True,
        )
        native._TRIED = False
    if not native.available():
        pytest.skip("native library unavailable")
    return native


def _clip():
    path = os.path.join(DATA, "rt_ms.mp4")
    if not os.path.exists(path):
        gen = os.path.join(ROOT, "tools", "genvideo")
        subprocess.run(
            [gen, path, "320", "256", "6", "30", "3", "1", "28", "3", "3"],
            check=True,
            capture_output=True,
        )
    return open(path, "rb").read()


@pytest.mark.parametrize("scope", ["stream", "gop", "slice"])
def test_native_matches_python(scope):
    native = _native()
    data = _clip()
    nat = native.compress(data, scope)
    assert nat == compress(data, scope=scope)
    assert native.decompress(nat) == data
    assert decompress(nat) == data  # cross: python decodes native output


def test_native_parallel_gop_matches_serial():
    native = _native()
    data = _clip()
    serial = native.compress(data, "gop", 1)
    parallel = native.compress(data, "gop", 0)
    assert serial == parallel
    assert native.decompress(serial, 0) == data


def test_native_garbage_passthrough():
    native = _native()
    for blob in (b"", b"\x01\x02\x03" * 100, bytes(range(256))):
        comp = native.compress(blob, "gop", 0)
        assert native.decompress(comp) == blob
        assert decompress(comp) == blob


def test_native_deterministic_across_calls():
    """Repeated/interleaved compressions in one process must be
    byte-identical (guards the thread-local estimator pool's generation
    isolation between model instances)."""
    native = _native()
    a = _clip()
    b = open(os.path.join(DATA, "rt_tiny.mp4"), "rb").read()
    for scope in ("stream", "gop", "slice"):
        first_a = native.compress(a, scope)
        first_b = native.compress(b, scope)
        assert native.compress(a, scope) == first_a
        assert native.compress(b, scope) == first_b
        assert native.compress(a, scope, 0) == (
            first_a if scope != "gop" else native.compress(a, "gop", 0)
        )
