"""NaiveSyncBatchNorm equivalents.

The reference implements manual cross-rank mean/meansqr all-reduce
(pytorchvideo/layers/batch_norm.py:45-226) with optional local process
groups (GroupGather, layers/distributed.py:91-145). On TPU under jit over a
Mesh, batch stats are computed over the *global* batch automatically; under
shard_map/pmap, pass ``axis_name`` (global sync) and ``axis_index_groups``
(local-group sync, the num_sync_devices analogue).
"""

from pytorchvideo_tpu.layers.norms import (  # noqa: F401
    BatchNorm,
    NaiveSyncBatchNorm1d,
    NaiveSyncBatchNorm2d,
    NaiveSyncBatchNorm3d,
)
