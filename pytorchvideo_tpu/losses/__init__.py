from pytorchvideo_tpu.losses.soft_target_cross_entropy import (  # noqa: F401
    SoftTargetCrossEntropyLoss,
    soft_target_cross_entropy,
)
