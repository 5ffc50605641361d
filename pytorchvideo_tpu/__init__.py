"""pytorchvideo_tpu: a TPU-native (JAX/XLA/Pallas) video-understanding framework.

A ground-up rebuild of the capabilities of facebookresearch/pytorchvideo
(reference surveyed in SURVEY.md) designed TPU-first:

- channels-last ``(B, T, H, W, C)`` tensor layout (MXU/VPU friendly),
- flax.linen modules built by keyword-only ``create_*`` factory functions
  mirroring the reference factory API (reference: pytorchvideo/models/*),
- Pallas kernels for the hot ops (MViT pooled attention, fused stem convs),
- SPMD parallelism via ``jax.sharding.Mesh`` + jit (data/model axes) instead
  of DDP/NCCL (reference: pytorchvideo/layers/distributed.py),
- an on-device fused transform pipeline instead of per-sample CPU transforms.
"""

__version__ = "0.1.0"

from pytorchvideo_tpu import layers, models, transforms, data, losses  # noqa: F401
