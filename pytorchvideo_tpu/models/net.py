"""Generic model containers.

Parity: pytorchvideo/models/net.py (Net :11-44, DetectionBBoxNetwork :47-74,
MultiPathWayWithFuse :77-122). Weight init is applied by the builders at
init-time via custom initializers (models/weight_init.py analogue lives in
pytorchvideo_tpu/models/weight_init.py).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn

from pytorchvideo_tpu.layers.common import apply_with_train


class Net(nn.Module):
    """Sequential composition of stem/stages/head blocks."""

    blocks: Sequence[nn.Module]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for block in self.blocks:
            x = apply_with_train(block, x, train)
        return x


class DetectionBBoxNetwork(nn.Module):
    """Backbone + bbox detection head (reference net.py:47-74)."""

    model: nn.Module
    detection_head: nn.Module

    @nn.compact
    def __call__(self, x, bboxes, train: bool = False):
        features = self.model(x, train=train)
        return self.detection_head(features, bboxes, train=train)


class MultiPathWayWithFuse(nn.Module):
    """Per-pathway blocks followed by a fusion module (reference net.py:77-122).

    Input/output: list of per-pathway tensors (fusion may reduce the list or
    return a new list; SlowFast's FuseFastToSlow returns a list).
    """

    multipathway_blocks: Sequence[Optional[nn.Module]]
    multipathway_fusion: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, x: List, train: bool = False):
        assert isinstance(x, (list, tuple)), "input must be a list of pathway tensors"
        out = []
        for i, pathway in enumerate(x):
            block = self.multipathway_blocks[i]
            out.append(apply_with_train(block, pathway, train) if block is not None else pathway)
        if self.multipathway_fusion is not None:
            out = apply_with_train(self.multipathway_fusion, out, train)
        return out
