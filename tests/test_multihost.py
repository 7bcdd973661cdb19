"""Two-process local jax.distributed validation (SURVEY.md §4: multi-host
tests via standard two-process local initialization — no cluster needed).

Each process gets 4 virtual CPU devices; the global ('host','dp') mesh is
2x4; a shard_mapped device entropy step with a cross-host psum must agree
with the single-process result."""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")

WORKER = r"""
import os, sys
import numpy as np
proc_id = int(sys.argv[1]); coord = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
sys.path.insert(0, os.environ["AVT_ROOT"])
from avrecode_tpu.ops.estimator_jax import encode_slices

assert jax.process_count() == 2
devs = np.array(jax.devices()).reshape(2, 4)
mesh = Mesh(devs, ("host", "dp"))

S, T, NS = 16, 64, 16
rng = np.random.RandomState(0)
slots = rng.randint(0, NS, (S, T)).astype(np.int32)
bits = rng.randint(0, 2, (S, T)).astype(np.int32)
pcabs = rng.randint(0, 0xFFFF, (S, T)).astype(np.int32)
limits = np.full((S, NS), 0x60, np.int32)
valid = np.ones((S, T), np.int32)

def local(sl, bi, pc, li, va):
    out, lens = encode_slices(sl, bi, pc, li, va)
    total = jax.lax.psum(jnp.sum(lens), ("host", "dp"))
    return out, lens, total

fn = shard_map(local, mesh=mesh,
               in_specs=(P(("host", "dp")),) * 5,
               out_specs=(P(("host", "dp")), P(("host", "dp")), P()))
with mesh:
    sharding = NamedSharding(mesh, P(("host", "dp")))
    gargs = [jax.make_array_from_callback(
        a.shape, sharding, lambda idx, a=a: a[idx]) for a in
        (slots, bits, pcabs, limits, valid)]
    out, lens, total = jax.jit(fn)(*gargs)
    from jax.experimental import multihost_utils
    lens_g = multihost_utils.process_allgather(lens, tiled=True)
# single-process reference
ref_out, ref_lens = encode_slices(slots, bits, pcabs, limits, valid)
assert int(total) == int(np.sum(np.asarray(ref_lens))), (int(total), int(np.sum(np.asarray(ref_lens))))
assert np.array_equal(np.asarray(lens_g), np.asarray(ref_lens))
print(f"proc {proc_id} OK total={int(total)}")
"""


STITCH_WORKER = r"""
import os, sys
import numpy as np
proc_id = int(sys.argv[1]); coord = sys.argv[2]; clip = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
sys.path.insert(0, os.environ["AVT_ROOT"])
from jax.experimental import multihost_utils
from avrecode_tpu.host import native
from avrecode_tpu.parallel import multihost

data = open(clip, "rb").read()
# each process recodes ONLY its GOP range; fragments ride the distributed
# backend (the DCN stand-in) to every process via allgather
frag = multihost.compress_sharded(data, proc_id, 2, threads=1)
lens = multihost_utils.process_allgather(np.array([len(frag)], np.int32))
m = int(lens.max())
buf = np.zeros(m, np.uint8)
buf[: len(frag)] = np.frombuffer(frag, np.uint8)
allb = multihost_utils.process_allgather(buf)
frags = [bytes(allb[i][: int(lens[i][0])]) for i in range(2)]
st = multihost.stitch(frags)
assert st == native.compress(data, scope="gop"), "stitched != single-process"
assert native.decompress(st) == data, "stitched container roundtrip failed"
print(f"proc {proc_id} STITCH-OK bytes={len(st)}")
"""


DSTITCH_WORKER = r"""
import os, sys
import numpy as np
proc_id = int(sys.argv[1]); coord = sys.argv[2]; clip = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
sys.path.insert(0, os.environ["AVT_ROOT"])
from jax.experimental import multihost_utils
from avrecode_tpu.host import native
from avrecode_tpu.parallel import multihost

data = open(clip, "rb").read()
blob = native.compress(data, scope="gop")
# each process decodes ONLY its GOP-group range of the container
frag = multihost.decompress_sharded(blob, proc_id, 2, threads=1)
lens = multihost_utils.process_allgather(np.array([len(frag)], np.int32))
m = int(lens.max())
buf = np.zeros(m, np.uint8)
buf[: len(frag)] = np.frombuffer(frag, np.uint8)
allb = multihost_utils.process_allgather(buf)
frags = [bytes(allb[i][: int(lens[i][0])]) for i in range(2)]
out = multihost.stitch_decompressed(frags)
assert len(frags[0]) > 0 and len(frags[1]) > 0, "both shards must decode work"
assert out == data, "sharded decompress != original"
print(f"proc {proc_id} DSTITCH-OK bytes={len(out)}")
"""


def _run_pair(worker, extra_args=()):
    port = 0
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["AVT_ROOT"] = os.path.abspath(ROOT)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, str(i), coord, *extra_args],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    return procs, outs


def test_two_process_stitched_container():
    """Full multi-host recode: two jax.distributed processes each compress
    their GOP shard, fragments allgathered, process-0 stitch is
    byte-identical to the single-process container and roundtrips."""
    from avrecode_tpu.host import native

    if not native.available():
        pytest.skip("native library not built")
    clip = os.path.join(ROOT, "data", "mid.mp4")
    if not os.path.exists(clip):
        gen = os.path.join(ROOT, "tools", "genvideo")
        subprocess.run(
            [gen, clip, "640", "480", "120", "30", "24", "1", "26", "7", "1"],
            check=True,
            capture_output=True,
        )
    procs, outs = _run_pair(STITCH_WORKER, (clip,))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "STITCH-OK" in out


def test_two_process_sharded_decompress():
    """Decode-direction mirror of the stitched-container test: two
    jax.distributed processes each decompress their GOP-group range of the
    container; concatenation reproduces the original bit-exactly."""
    from avrecode_tpu.host import native

    if not native.available():
        pytest.skip("native library not built")
    clip = os.path.join(ROOT, "data", "mid.mp4")
    if not os.path.exists(clip):
        gen = os.path.join(ROOT, "tools", "genvideo")
        subprocess.run(
            [gen, clip, "640", "480", "120", "30", "24", "1", "26", "7", "1"],
            check=True,
            capture_output=True,
        )
    procs, outs = _run_pair(DSTITCH_WORKER, (clip,))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "DSTITCH-OK" in out


def test_two_process_distributed():
    port = 0
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["AVT_ROOT"] = os.path.abspath(ROOT)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(i), coord],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK" in out


def test_sharded_decompress_single_process():
    """decompress_sharded without jax.distributed: any process count's
    concatenated fragments must equal the full decode, including empty
    shards (more processes than GOPs) and the non-gop-scope fallback."""
    from avrecode_tpu.host import native
    from avrecode_tpu.parallel import multihost

    if not native.available():
        pytest.skip("native library not built")
    clip = os.path.join(ROOT, "data", "mid.mp4")
    if not os.path.exists(clip):
        gen = os.path.join(ROOT, "tools", "genvideo")
        subprocess.run(
            [gen, clip, "640", "480", "120", "30", "24", "1", "26", "7", "1"],
            check=True, capture_output=True,
        )
    data = open(clip, "rb").read()
    blob = native.compress(data, scope="gop")
    for nproc in (1, 2, 3, 7):
        frags = [
            multihost.decompress_sharded(blob, i, nproc) for i in range(nproc)
        ]
        assert multihost.stitch_decompressed(frags) == data
    blob2 = native.compress(data, scope="stream")
    frags = [multihost.decompress_sharded(blob2, i, 2) for i in range(2)]
    assert multihost.stitch_decompressed(frags) == data
