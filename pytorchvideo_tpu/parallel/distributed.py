"""Distributed runtime helpers.

Parity: pytorchvideo/layers/distributed.py (get_world_size :13,
cat_all_gather :25, init_distributed_training :42, local groups :60-145)
and trainer module/distributed_utils.py. On TPU the XLA runtime owns
transport; these helpers cover process-level init (multi-host), world/rank
queries, and local sync-group construction (the NaiveSyncBatchNorm
num_sync_devices analogue) as axis_index_groups.
"""

from __future__ import annotations

from typing import List, Optional

import jax


def get_world_size() -> int:
    """Global device count (the reference's dist.get_world_size)."""
    return jax.device_count()


def get_local_size() -> int:
    """Devices on this host (the reference's per-machine group size)."""
    return jax.local_device_count()


def get_rank() -> int:
    """Process index (0 on single-host)."""
    return jax.process_index()


def init_distributed_training(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host init (reference init_distributed_training :42-57 sets up
    NCCL process groups; jax.distributed wires hosts into one runtime).
    No-op on single-host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_sync_groups(num_sync_devices: int) -> List[List[int]]:
    """Partition devices into groups of num_sync_devices for local-group
    BatchNorm sync — pass as BatchNorm(axis_index_groups=...) under
    shard_map/pmap (reference GroupGather, layers/distributed.py:91-145)."""
    n = jax.device_count()
    assert n % num_sync_devices == 0, (n, num_sync_devices)
    return [
        list(range(i, i + num_sync_devices))
        for i in range(0, n, num_sync_devices)
    ]
