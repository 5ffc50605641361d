"""Device mesh + sharding helpers.

The reference's distributed layer is torch.distributed process groups + NCCL
(pytorchvideo/layers/distributed.py, trainer module/distributed_utils.py).
The TPU-native equivalent is a ``jax.sharding.Mesh`` with named axes and
GSPMD: annotate array shardings, let XLA insert collectives over ICI.

Axes convention: ``data`` (batch/DP) and ``model`` (TP for attention heads /
wide Dense). Local sync-BN groups (the reference's num_sync_devices,
layers/batch_norm.py) map to ``axis_index_groups`` under shard_map, or simply
to global-batch semantics under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a Mesh over all (or given) devices.

    ``axis_shapes`` may contain one -1 (inferred). Default: 1D data-parallel
    mesh over every device.
    """
    devices = list(devices if devices is not None else jax.devices())
    shapes = list(axis_shapes)
    if -1 in shapes:
        known = int(np.prod([s for s in shapes if s != -1])) or 1
        shapes[shapes.index(-1)] = len(devices) // known
    if any(s <= 0 for s in shapes) or int(np.prod(shapes)) != len(devices):
        raise ValueError(
            f"mesh axis shapes {dict(zip(axis_names, shapes))} do not tile the "
            f"{len(devices)} available device(s); run under more devices (e.g. "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu) "
            f"or shrink the fixed axes"
        )
    dev_array = np.array(devices).reshape(shapes)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``; rest replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a pytree of host arrays with batch-dim sharding."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
