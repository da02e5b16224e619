"""Multi-host initialization and per-host data coordination.

The reference's distributed story is dead config (NCCL backend strings,
``dist_url="file://distributed.dpt"`` — hparams_nvidia.py:17-19) plus an
unwired rank-sliced sampler (util.py:353-391). The TPU-native equivalent:
``jax.distributed.initialize()`` connects the hosts of a pod slice; the
mesh in ``parallel.mesh`` then spans *all* chips, GSPMD handles the
collectives over ICI/DCN, and each host feeds only its shard of the data
stream (``data.sampler.shard_for_host``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class HostTopology:
    process_index: int
    process_count: int
    local_device_count: int
    global_device_count: int

    @property
    def is_primary(self) -> bool:
        return self.process_index == 0


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> HostTopology:
    """Connect this host to the pod slice (no-op for single-process runs).

    On Cloud TPU the arguments are auto-detected from the metadata server;
    pass them explicitly for other clusters. Call once, before any other
    JAX API. Returns the resulting topology.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return topology()


def topology() -> HostTopology:
    return HostTopology(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_device_count=jax.local_device_count(),
        global_device_count=jax.device_count(),
    )


def loader_shard_args() -> dict:
    """kwargs for ``get_audio_data_loaders``: this host's slice of the
    batch stream (the DistributedBucketingSampler rank semantics)."""
    t = topology()
    return {"num_hosts": t.process_count, "host_id": t.process_index}
