"""End-to-end multichip compression on the 8-device virtual mesh: a real
multi-GOP file through device_compress(mesh=...) must produce a container
BYTE-IDENTICAL to the host codec, and the driver dry run must pass on real
traces (VERDICT r1 item 4: no dead mesh paths)."""

import os
import subprocess

import jax
import pytest

from avrecode_tpu.codec import compress, decompress

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
GEN = os.path.join(os.path.dirname(__file__), "..", "tools", "genvideo")


def _clip():
    path = os.path.join(DATA, "rt_gop.mp4")
    if not os.path.exists(path):
        subprocess.run(
            [GEN, path, "192", "160", "12", "30", "4", "1", "26", "9", "1"],
            check=True,
            capture_output=True,
        )
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("scope", ["gop", "slice"])
def test_device_compress_mesh_byte_identical(scope):
    from avrecode_tpu.host import native
    from avrecode_tpu.parallel.pipeline import device_compress, make_mesh

    if not native.available():
        pytest.skip("native library not built")
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (conftest)")
    data = _clip()
    B = 1024
    mesh = make_mesh(8)
    dev = device_compress(data, mesh=mesh, scope=scope, substream_bins=B)
    assert dev == compress(data, scope=scope, substream_bins=B)
    assert decompress(dev) == data


def test_device_compress_lane_path_no_mesh():
    """Lane path (scan backend) without a mesh: identical + roundtrips."""
    from avrecode_tpu.host import native
    from avrecode_tpu.parallel.pipeline import device_compress

    if not native.available():
        pytest.skip("native library not built")
    data = _clip()
    dev = device_compress(data, scope="gop", substream_bins=2048)
    assert dev == compress(data, scope="gop", substream_bins=2048)
    assert decompress(dev) == data


def test_dryrun_multichip_real_traces():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
