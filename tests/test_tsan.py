"""ThreadSanitizer run over the threaded native paths (GOP-parallel
compress/decompress and trace extraction).  The mt==serial byte-equality
tests in test_native.py are behavioral; this is the actual race detector
the reference never needed (it is single-threaded: recode.cpp:129)."""

import os
import subprocess

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
HOST = os.path.join(ROOT, "avrecode_tpu", "host")
DATA = os.path.join(ROOT, "data")


def _clip():
    path = os.path.join(DATA, "rt_ms.mp4")
    if not os.path.exists(path):
        gen = os.path.join(ROOT, "tools", "genvideo")
        subprocess.run(
            [gen, path, "320", "256", "6", "30", "3", "1", "28", "3", "3"],
            check=True,
            capture_output=True,
        )
    return path


def test_tsan_threaded_paths():
    drv = os.path.join(HOST, "tsan_driver")
    try:
        subprocess.run(
            ["make", "-C", HOST, "tsan_driver"], check=True, capture_output=True
        )
    except subprocess.CalledProcessError as e:  # pragma: no cover
        pytest.skip(f"tsan build unavailable: {e.stderr[-200:]}")
    env = dict(os.environ, TSAN_OPTIONS="exitcode=66 halt_on_error=0")
    r = subprocess.run(
        [drv, _clip()], capture_output=True, text=True, env=env, timeout=600
    )
    assert r.returncode == 0, f"tsan driver failed ({r.returncode}):\n{r.stderr[-4000:]}"
    assert "WARNING: ThreadSanitizer" not in r.stderr, r.stderr[-4000:]
    assert r.stdout.startswith("OK")
