"""Multi-host scale-out (SURVEY.md §2/§7 B6: GOPs across chips on a host,
stream ranges across hosts over DCN).

The reference has no distributed story at all; here the decomposition is:

  host process  <- a contiguous range of GOPs (entropy-independent under
                   scope=gop, so no cross-host state is ever exchanged for
                   correctness — only the billing/metrics reduction rides
                   the collective)
  within a host <- GOP threads (native library) + slice batch on the chips

`init_distributed` wires jax.distributed; `mesh_all_hosts` builds the
global ('host', 'dp') mesh; `global_metrics_psum` is the cross-host
reduction used by the benchmark driver.  Validated by a two-process
loopback test (tests/test_multihost.py) — the standard local multi-process
initialization, no cluster needed.
"""

import jax
import jax.numpy as jnp
import numpy as np


def init_distributed(coordinator, num_processes, process_id, local_device_ids=None):
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def mesh_all_hosts(dp_per_host=None):
    """Global mesh: ('host', 'dp') — hosts over DCN, chips over ICI."""
    from jax.sharding import Mesh

    n_proc = jax.process_count()
    devs = jax.devices()  # global device list
    per_host = len(devs) // n_proc
    if dp_per_host:
        per_host = min(per_host, dp_per_host)
    grid = np.array(devs[: n_proc * per_host]).reshape(n_proc, per_host)
    return Mesh(grid, ("host", "dp"))


def shard_gop_ranges(n_gops, n_processes):
    """Contiguous GOP ranges per process (the work decomposition)."""
    per = -(-n_gops // n_processes)
    return [
        (min(i * per, n_gops), min((i + 1) * per, n_gops))
        for i in range(n_processes)
    ]


def global_metrics_psum(local_metrics, mesh):
    """All-host reduction of per-host metric vectors (billing/bytes/bins):
    the DCN collective of the pipeline.  local_metrics: float32[K] on each
    process; returns the global sum (replicated)."""
    from jax.experimental.multihost_utils import process_allgather

    # process_allgather rides the same collective machinery; summing the
    # gathered per-host rows gives the psum result on every host
    gathered = process_allgather(jnp.asarray(local_metrics))
    return np.asarray(gathered).sum(axis=0)


def compress_sharded(data, process_id, num_processes, threads=0):
    """Per-process compression of this process's contiguous GOP range.

    The cheap GOP index (NAL + slice-header scan, native.gop_count) gives
    the work decomposition; this process then parses and recodes ONLY its
    GOPs (native.compress_gops), returning a container FRAGMENT: fragment
    0 carries the AVTR header, the fragment holding the last GOP carries
    the trailing literal, no fragment carries the end marker.  GOPs are
    entropy-independent at gop scope, so no cross-host state is exchanged
    — only the fragments themselves ride DCN to process 0 for stitch().

    Returns fragment bytes (b"" for an empty shard when hosts > GOPs)."""
    from ..host import native

    n = max(1, native.gop_count(data))
    lo, hi = shard_gop_ranges(n, num_processes)[process_id]
    frag, _total = native.compress_gops(data, lo, hi, threads=threads)
    return frag


def stitch(fragments):
    """Process-0 assembly of ordered per-process fragments into one
    container: pure concatenation + the end marker.  Byte-identical to
    native.compress(data, scope='gop') whenever every slice recodes."""
    from ..utils.container import KIND_END

    return b"".join(fragments) + bytes([KIND_END, 0])


def _scan_gop_groups(blob):
    from ..utils.container import scan_gop_groups

    return scan_gop_groups(blob)


def decompress_sharded(blob, process_id, num_processes, threads=0):
    """Per-process decompression of this process's contiguous GOP-group
    range — the decode-direction mirror of compress_sharded.

    GOP groups are self-contained at scope=gop (each carries its model
    stream; literals pass through), so each process decodes a SUB-CONTAINER
    assembled from the shared header plus its block byte range; stitching
    the per-process outputs by concatenation reproduces
    decompress(blob) byte-exactly.  Returns b"" for an empty shard."""
    from ..utils.container import KIND_END

    blob = bytes(blob)
    scan = _scan_gop_groups(blob)
    if scan is None:  # non-gop scope: process 0 decodes everything
        if process_id != 0:
            return b""
        return _decode_any(blob, threads)
    header_end, groups = scan
    lo, hi = shard_gop_ranges(len(groups), num_processes)[process_id]
    if lo >= hi:
        return b""
    sub = (
        blob[:header_end]
        + blob[groups[lo][0] : groups[hi - 1][1]]
        + bytes([KIND_END, 0])
    )
    return _decode_any(sub, threads)


def _decode_any(blob, threads):
    from ..host import native

    if native.available():
        return native.decompress(blob, threads)
    from ..codec import decompress

    return decompress(blob)


def stitch_decompressed(fragments):
    """Process-0 assembly of ordered per-process decoded fragments: pure
    concatenation — byte-identical to decompress(blob)."""
    return b"".join(fragments)
