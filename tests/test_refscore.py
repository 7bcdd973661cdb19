"""Reference-model replay scorer (host/src/refscore.h, VERDICT item 6).

The scorer replays the reference recoder's probability model over our
parser's bin stream; these tests pin that it runs clean on real clips and
that our actual container beats the reference's idealized size there.
"""

import os
import subprocess

import pytest

from avrecode_tpu.host import native

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")


def _clip():
    path = os.path.join(DATA, "mid.mp4")
    if not os.path.exists(path):
        subprocess.run(
            [GEN, path, "640", "480", "120", "30", "24", "1", "26", "7", "1"],
            check=True,
            capture_output=True,
        )
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_refscore_runs_and_we_win():
    data = _clip()
    d = native.refscore(data)
    assert d["slices_failed"] == 0
    assert d["slices_ok"] > 0
    assert d["bins"] > 100_000
    # every class of the reference model exercised on a real clip
    for cls in ("ctx", "bypass", "terminate", "nnz", "sig"):
        assert d["bits_" + cls] > 0, cls
    ours = len(native.compress(data, scope="gop"))
    # conservative comparison: the replay favors the reference (idealized
    # coding, no container framing) and ours is a real container
    assert ours < d["ref_file_bytes"]


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_refscore_garbage_input():
    d = native.refscore(b"not a video at all" * 100)
    assert d["slices_ok"] == 0
    assert d["ref_stream_bytes"] == 0
