"""Torch-signature pooling factories for builder injection.

The reference passes torch pool classes (nn.MaxPool3d / nn.AvgPool3d /
nn.AdaptiveAvgPool3d) into builders (e.g. models/resnet.py:614,654,
models/head.py:45). These factories mirror those signatures and return plain
callables over channels-last (B, T, H, W, C) tensors.
"""

from __future__ import annotations

from pytorchvideo_tpu.layers.common import (
    adaptive_avg_pool3d_to_1,
    avg_pool3d,
    max_pool3d,
)


def MaxPool3d(kernel_size, stride=None, padding=(0, 0, 0)):
    return lambda x: max_pool3d(x, kernel_size, stride, padding)


def AvgPool3d(kernel_size, stride=None, padding=(0, 0, 0)):
    return lambda x: avg_pool3d(x, kernel_size, stride, padding)


def AdaptiveAvgPool3d(output_size):
    assert tuple(output_size) == (1, 1, 1), "only global (1,1,1) supported"
    return adaptive_avg_pool3d_to_1
