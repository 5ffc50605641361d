"""Deployable X3D entries: the TPU analogue of the reference's mobile-CPU
efficient_x3d hub (hub/efficient_x3d_mobile_cpu.py:40-85). Returns
EfficientBlockBase wrappers whose convert() produces the fused/bf16
AOT-compiled deploy form."""

from pytorchvideo_tpu.accelerate.efficient_blocks import EfficientX3d


def efficient_x3d_xs(num_classes: int = 400, **kwargs) -> EfficientX3d:
    return EfficientX3d(expansion="XS", num_classes=num_classes, **kwargs)


def efficient_x3d_s(num_classes: int = 400, **kwargs) -> EfficientX3d:
    return EfficientX3d(expansion="S", num_classes=num_classes, **kwargs)
