"""Robustness fuzzing: mutated containers and mutated video inputs through
the native C API must never crash (exceptions -> clean error return) or
violate memory (AddressSanitizer build aborts loudly), and any mutated
input that compresses must still roundtrip bit-exact (the self-verification
guarantee is input-independent)."""

import os
import subprocess

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
HOST = os.path.join(ROOT, "avrecode_tpu", "host")


def test_fuzz_asan():
    harness = os.path.join(HOST, "fuzz_harness")
    r = subprocess.run(["make", "-C", HOST, "fuzz"], capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"asan harness build failed: {r.stderr[-500:]}")
    clip = os.path.join(ROOT, "data", "rt_tiny.mp4")
    if not os.path.exists(clip):
        gen = os.path.join(ROOT, "tools", "genvideo")
        subprocess.run(
            [gen, clip, "160", "128", "8", "30", "4", "0", "26", "11", "1"],
            check=True,
            capture_output=True,
        )
    env = dict(os.environ)
    env["ASAN_OPTIONS"] = "detect_leaks=0"
    r = subprocess.run(
        [harness, clip, "1234", "80"],
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
    )
    assert r.returncode == 0 and "FUZZ_OK" in r.stdout, (
        f"fuzz failed (rc={r.returncode}):\n{r.stderr[-3000:]}"
    )


@pytest.mark.parametrize("ext", ["avi", "flv"])
def test_fuzz_asan_containers(ext):
    """Mutated AVI/FLV inputs through the ASan build: the owned demuxers
    must never read out of bounds or crash (round-4 demux breadth)."""
    harness = os.path.join(HOST, "fuzz_harness")
    r = subprocess.run(["make", "-C", HOST, "fuzz"], capture_output=True,
                       text=True)
    if r.returncode != 0:
        pytest.skip(f"asan harness build failed: {r.stderr[-500:]}")
    clip = os.path.join(ROOT, "data", "rt_ctr." + ext)
    if not os.path.exists(clip):
        pytest.skip("container fixture missing (built by test_containers)")
    env = dict(os.environ)
    env["ASAN_OPTIONS"] = "detect_leaks=0"
    r = subprocess.run(
        [harness, clip, "4242", "40"],
        env=env, capture_output=True, text=True, timeout=480,
    )
    assert r.returncode == 0 and "FUZZ_OK" in r.stdout, (
        f"fuzz failed (rc={r.returncode}):\n{r.stderr[-3000:]}"
    )
