"""Hub entry points (the reference hubconf.py:4-24 analogue).

The reference exposes these via torch.hub; here the same 20 factory names
are importable from this file or from ``pytorchvideo_tpu.models.hub``.
Pretrained reference checkpoints import via
``pytorchvideo_tpu.models.hub.load_pretrained_variables`` (generic
torch->linen state-dict translation, zoo/import_torch.py).
"""

dependencies = ["jax", "flax"]

from pytorchvideo_tpu.models.hub import (  # noqa: F401, E402
    c2d_r50,
    csn_r101,
    efficient_x3d_s,
    efficient_x3d_xs,
    i3d_r50,
    load_pretrained_variables,
    mvit_base_16,
    mvit_base_16x4,
    mvit_base_32x3,
    r2plus1d_r50,
    slow_r50,
    slow_r50_detection,
    slowfast_16x8_r101_50_50,
    slowfast_r101,
    slowfast_r50,
    slowfast_r50_detection,
    x3d_l,
    x3d_m,
    x3d_s,
    x3d_xs,
)
