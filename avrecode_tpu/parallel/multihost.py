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


def compress_sharded(data, process_id, num_processes):
    """Per-process compression of this process's GOP range.

    Each process parses the (cheap) slice index, takes its contiguous GOP
    range, and compresses ONLY those GOPs via the native library; process 0
    stitches the sub-containers.  Used by tools/multihost_demo.py; the
    stitching path reuses the container's block framing (GOP blocks are
    position-independent given their literals).
    """
    from ..h264.stream import StreamWalker

    w = StreamWalker(bytes(data))
    gop_starts = []
    for rec in w.slices():
        if rec.header.idr and rec.header.first_mb_in_slice == 0 or not gop_starts:
            gop_starts.append(rec.nal_index)
    n_gops = max(1, len(gop_starts))
    lo, hi = shard_gop_ranges(n_gops, num_processes)[process_id]
    return n_gops, (lo, hi)
