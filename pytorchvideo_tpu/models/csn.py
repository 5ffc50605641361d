"""Channel-Separated Convolutional Networks (CSN).

Parity: pytorchvideo/models/csn.py:12-191 — a ResNet where conv_b is
depthwise (num_groups = dim_inner / width_per_group), conv_a has stride 1,
and the full (t, h, w) stride rides on conv_b.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn

from pytorchvideo_tpu.layers.norms import BatchNorm
from pytorchvideo_tpu.layers.pooling import AvgPool3d
from pytorchvideo_tpu.models.head import create_res_basic_head
from pytorchvideo_tpu.models.net import Net
from pytorchvideo_tpu.models.resnet import (
    _MODEL_STAGE_DEPTH,
    create_bottleneck_block,
    create_res_stage,
)
from pytorchvideo_tpu.models.stem import create_res_basic_stem


def create_csn(
    *,
    input_channel: int = 3,
    model_depth: int = 50,
    model_num_class: int = 400,
    dropout_rate: float = 0,
    norm: Optional[Callable] = BatchNorm,
    activation: Optional[Callable] = nn.relu,
    stem_dim_out: int = 64,
    stem_conv_kernel_size: Tuple[int, int, int] = (3, 7, 7),
    stem_conv_stride: Tuple[int, int, int] = (1, 2, 2),
    stem_pool: Optional[Callable] = None,
    stem_pool_kernel_size: Tuple[int, int, int] = (1, 3, 3),
    stem_pool_stride: Tuple[int, int, int] = (1, 2, 2),
    stage_conv_a_kernel_size: Tuple[int, int, int] = (1, 1, 1),
    stage_conv_b_kernel_size: Tuple[int, int, int] = (3, 3, 3),
    stage_conv_b_width_per_group: int = 1,
    stage_spatial_stride: Tuple[int, ...] = (1, 2, 2, 2),
    stage_temporal_stride: Tuple[int, ...] = (1, 2, 2, 2),
    bottleneck: Callable = create_bottleneck_block,
    bottleneck_ratio: int = 4,
    head_pool: Optional[Callable] = AvgPool3d,
    head_pool_kernel_size: Tuple[int, int, int] = (1, 7, 7),
    head_output_size: Tuple[int, int, int] = (1, 1, 1),
    head_activation: Optional[Callable] = None,
    head_output_with_global_average: bool = True,
) -> Net:
    """Builder (reference csn.py:12-191)."""
    assert model_depth in _MODEL_STAGE_DEPTH, f"{model_depth} unsupported"
    stage_depths = _MODEL_STAGE_DEPTH[model_depth]

    blocks = [
        create_res_basic_stem(
            in_channels=input_channel,
            out_channels=stem_dim_out,
            conv_kernel_size=stem_conv_kernel_size,
            conv_stride=stem_conv_stride,
            conv_padding=tuple(s // 2 for s in stem_conv_kernel_size),
            pool=stem_pool,
            pool_kernel_size=stem_pool_kernel_size,
            pool_stride=stem_pool_stride,
            pool_padding=tuple(s // 2 for s in stem_pool_kernel_size),
            norm=norm,
            activation=activation,
        )
    ]

    stage_dim_in = stem_dim_out
    stage_dim_out = stage_dim_in * 4
    for idx in range(len(stage_depths)):
        stage_dim_inner = stage_dim_out // bottleneck_ratio
        blocks.append(
            create_res_stage(
                depth=stage_depths[idx],
                dim_in=stage_dim_in,
                dim_inner=stage_dim_inner,
                dim_out=stage_dim_out,
                bottleneck=bottleneck,
                conv_a_kernel_size=stage_conv_a_kernel_size,
                conv_a_stride=(1, 1, 1),
                conv_a_padding=tuple(s // 2 for s in stage_conv_a_kernel_size),
                conv_b_kernel_size=stage_conv_b_kernel_size,
                conv_b_stride=(
                    stage_temporal_stride[idx],
                    stage_spatial_stride[idx],
                    stage_spatial_stride[idx],
                ),
                conv_b_padding=tuple(s // 2 for s in stage_conv_b_kernel_size),
                conv_b_num_groups=stage_dim_inner // stage_conv_b_width_per_group,
                conv_b_dilation=(1, 1, 1),
                norm=norm,
                activation=activation,
            )
        )
        stage_dim_in = stage_dim_out
        stage_dim_out = stage_dim_out * 2

    blocks.append(
        create_res_basic_head(
            in_features=stage_dim_in,
            out_features=model_num_class,
            pool=head_pool,
            output_size=head_output_size,
            pool_kernel_size=head_pool_kernel_size,
            dropout_rate=dropout_rate,
            activation=head_activation,
            output_with_global_average=head_output_with_global_average,
        )
    )
    return Net(blocks=blocks)
