"""Detection heads + detection model variants (AVA-style).

Parity: pytorchvideo/models/head.py (create_res_roi_pooling_head :203-327,
ResNetRoIHead :394-483), models/resnet.py (create_resnet_with_roi_head
:844-1019), models/slowfast.py (create_slowfast_with_roi_head :364-582).
RoIAlign is our XLA gather kernel (pytorchvideo_tpu/ops/roi_align.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorchvideo_tpu.layers.common import adaptive_avg_pool3d_to_1
from pytorchvideo_tpu.layers.norms import BatchNorm, make_act
from pytorchvideo_tpu.layers.pooling import AdaptiveAvgPool3d, AvgPool3d, MaxPool3d
from pytorchvideo_tpu.models.net import DetectionBBoxNetwork
from pytorchvideo_tpu.models.resnet import (
    _MODEL_STAGE_DEPTH,
    create_bottleneck_block,
    create_resnet,
)
from pytorchvideo_tpu.models.slowfast import create_slowfast
from pytorchvideo_tpu.models.stem import create_res_basic_stem
from pytorchvideo_tpu.ops.roi_align import RoIAlign


def _max_pool2d(x, kernel, stride=1):
    kh, kw = kernel
    return nn.max_pool(
        x, window_shape=(kh, kw), strides=(stride, stride), padding="VALID"
    )


class ResNetRoIHead(nn.Module):
    """pool3d -> RoIAlign (T must be 1) -> pool2d -> dropout -> proj -> act
    -> optional global average (reference head.py:394-483)."""

    proj: nn.Module
    pool: Optional[Callable] = None
    pool_spatial: Optional[Callable] = None
    roi_layer: Optional[RoIAlign] = None
    dropout_rate: float = 0.0
    activation: Optional[Callable] = None
    output_with_global_average: bool = False

    @nn.compact
    def __call__(self, x, bboxes, train: bool = False):
        if self.pool is not None:
            x = self.pool(x)
        if self.roi_layer is not None:
            assert x.shape[1] == 1, (
                "Temporal dimension should be 1. Consider modifying the pool layer."
            )
            x = jnp.squeeze(x, axis=1)  # (B, H, W, C)
            x = self.roi_layer(x, bboxes)  # (N, h, w, C)
            if self.pool_spatial is not None:
                x = self.pool_spatial(x)
            x = x[:, None]  # (N, 1, h', w', C)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = self.proj(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.output_with_global_average:
            x = adaptive_avg_pool3d_to_1(x)
            x = x.reshape(x.shape[0], -1)
        return x


def create_res_roi_pooling_head(
    *,
    in_features: int,
    out_features: int,
    resolution: Tuple[int, int],
    spatial_scale: float,
    sampling_ratio: int = 0,
    roi: Callable = RoIAlign,
    pool: Optional[Callable] = AvgPool3d,
    output_size: Tuple[int, int, int] = (1, 1, 1),
    pool_kernel_size: Tuple[int, int, int] = (1, 7, 7),
    pool_stride: Tuple[int, int, int] = (1, 1, 1),
    pool_padding: Tuple[int, int, int] = (0, 0, 0),
    pool_spatial: Optional[Callable] = "max",
    dropout_rate: float = 0.5,
    activation: Optional[Callable] = None,
    output_with_global_average: bool = True,
) -> ResNetRoIHead:
    """Builder (reference head.py:203-327)."""
    if activation is None:
        act = None
    elif activation in ("softmax", jax.nn.softmax):
        act = jax.nn.softmax
    elif activation in ("sigmoid", jax.nn.sigmoid, nn.sigmoid):
        act = jax.nn.sigmoid
    else:
        act = make_act(activation)

    if pool is None:
        pool_model = None
    elif pool is AdaptiveAvgPool3d:
        pool_model = pool(output_size)
    else:
        pool_model = pool(
            kernel_size=pool_kernel_size, stride=pool_stride, padding=pool_padding
        )

    pool_spatial_fn = None
    if pool_spatial is not None:
        pool_spatial_fn = lambda x: _max_pool2d(x, resolution, stride=1)  # noqa: E731

    return ResNetRoIHead(
        proj=nn.Dense(out_features),
        pool=pool_model,
        pool_spatial=pool_spatial_fn,
        roi_layer=roi(
            output_size=resolution,
            spatial_scale=spatial_scale,
            sampling_ratio=sampling_ratio,
        ),
        dropout_rate=dropout_rate,
        activation=act,
        output_with_global_average=output_with_global_average,
    )


def create_resnet_with_roi_head(
    *,
    input_channel: int = 3,
    model_depth: int = 50,
    model_num_class: int = 80,
    dropout_rate: float = 0.5,
    norm: Optional[Callable] = BatchNorm,
    activation: Optional[Callable] = nn.relu,
    stem_dim_out: int = 64,
    stem_conv_kernel_size: Tuple[int, int, int] = (1, 7, 7),
    stem_conv_stride: Tuple[int, int, int] = (1, 2, 2),
    stem_pool: Optional[Callable] = MaxPool3d,
    stem_pool_kernel_size: Tuple[int, int, int] = (1, 3, 3),
    stem_pool_stride: Tuple[int, int, int] = (1, 2, 2),
    stem: Callable = create_res_basic_stem,
    stage1_pool: Optional[Callable] = None,
    stage_conv_a_kernel_size=((1, 1, 1), (1, 1, 1), (3, 1, 1), (3, 1, 1)),
    stage_conv_b_kernel_size=((1, 3, 3), (1, 3, 3), (1, 3, 3), (1, 3, 3)),
    stage_conv_b_num_groups=(1, 1, 1, 1),
    stage_conv_b_dilation=((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 2, 2)),
    stage_spatial_h_stride=(1, 2, 2, 1),
    stage_spatial_w_stride=(1, 2, 2, 1),
    stage_temporal_stride=(1, 1, 1, 1),
    bottleneck: Union[Tuple[Callable, ...], Callable] = create_bottleneck_block,
    head: Callable = create_res_roi_pooling_head,
    head_pool: Optional[Callable] = AvgPool3d,
    head_pool_kernel_size: Tuple[int, int, int] = (4, 1, 1),
    head_output_size: Tuple[int, int, int] = (1, 1, 1),
    head_activation: Optional[Callable] = jax.nn.sigmoid,
    head_output_with_global_average: bool = False,
    head_spatial_resolution: Tuple[int, int] = (7, 7),
    head_spatial_scale: float = 1.0 / 16.0,
    head_sampling_ratio: int = 0,
    stage_depths: Optional[Tuple[int, ...]] = None,
) -> DetectionBBoxNetwork:
    """Slow-R50 AVA detection model (reference resnet.py:844-1019):
    dilated res5, stride-1 final stage, RoI head over keyframe features."""
    model = create_resnet(
        stage_depths=stage_depths,
        input_channel=input_channel,
        model_depth=model_depth,
        model_num_class=model_num_class,
        dropout_rate=dropout_rate,
        norm=norm,
        activation=activation,
        stem_dim_out=stem_dim_out,
        stem_conv_kernel_size=stem_conv_kernel_size,
        stem_conv_stride=stem_conv_stride,
        stem_pool=stem_pool,
        stem_pool_kernel_size=stem_pool_kernel_size,
        stem_pool_stride=stem_pool_stride,
        stem=stem,
        stage1_pool=stage1_pool,
        stage_conv_a_kernel_size=stage_conv_a_kernel_size,
        stage_conv_b_kernel_size=stage_conv_b_kernel_size,
        stage_conv_b_num_groups=stage_conv_b_num_groups,
        stage_conv_b_dilation=stage_conv_b_dilation,
        stage_spatial_h_stride=stage_spatial_h_stride,
        stage_spatial_w_stride=stage_spatial_w_stride,
        stage_temporal_stride=stage_temporal_stride,
        bottleneck=bottleneck,
        head=None,
    )
    n_stages = len(stage_depths or _MODEL_STAGE_DEPTH[model_depth])
    head_module = head(
        in_features=stem_dim_out * 2 ** (n_stages + 1),
        out_features=model_num_class,
        pool=head_pool,
        output_size=head_output_size,
        pool_kernel_size=head_pool_kernel_size,
        dropout_rate=dropout_rate,
        activation=head_activation,
        output_with_global_average=head_output_with_global_average,
        resolution=head_spatial_resolution,
        spatial_scale=head_spatial_scale,
        sampling_ratio=head_sampling_ratio,
    )
    return DetectionBBoxNetwork(model=model, detection_head=head_module)


def create_slowfast_with_roi_head(
    *,
    slowfast_channel_reduction_ratio: Union[Tuple[int, ...], int] = (8,),
    slowfast_conv_channel_fusion_ratio: int = 2,
    slowfast_fusion_conv_kernel_size: Tuple[int, int, int] = (7, 1, 1),
    slowfast_fusion_conv_stride: Tuple[int, int, int] = (4, 1, 1),
    fusion_builder: Optional[Callable] = None,
    input_channels: Tuple[int, ...] = (3, 3),
    model_depth: int = 50,
    model_num_class: int = 80,
    dropout_rate: float = 0.5,
    norm: Optional[Callable] = BatchNorm,
    activation: Optional[Callable] = nn.relu,
    stem_function: Tuple[Callable, ...] = (
        create_res_basic_stem,
        create_res_basic_stem,
    ),
    stem_dim_outs: Tuple[int, ...] = (64, 8),
    stem_conv_kernel_sizes=((1, 7, 7), (5, 7, 7)),
    stem_conv_strides=((1, 2, 2), (1, 2, 2)),
    stem_pool: Union[Callable, Tuple] = (MaxPool3d, MaxPool3d),
    stem_pool_kernel_sizes=((1, 3, 3), (1, 3, 3)),
    stem_pool_strides=((1, 2, 2), (1, 2, 2)),
    stage_conv_a_kernel_sizes=(
        ((1, 1, 1), (1, 1, 1), (3, 1, 1), (3, 1, 1)),
        ((3, 1, 1), (3, 1, 1), (3, 1, 1), (3, 1, 1)),
    ),
    stage_conv_b_kernel_sizes=(
        ((1, 3, 3), (1, 3, 3), (1, 3, 3), (1, 3, 3)),
        ((1, 3, 3), (1, 3, 3), (1, 3, 3), (1, 3, 3)),
    ),
    stage_conv_b_num_groups=((1, 1, 1, 1), (1, 1, 1, 1)),
    stage_conv_b_dilations=(
        ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 2, 2)),
        ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 2, 2)),
    ),
    stage_spatial_strides=((1, 2, 2, 1), (1, 2, 2, 1)),
    stage_temporal_strides=((1, 1, 1, 1), (1, 1, 1, 1)),
    bottleneck: Union[Callable, Tuple] = create_bottleneck_block,
    head: Callable = create_res_roi_pooling_head,
    head_pool: Optional[Callable] = AvgPool3d,
    head_pool_kernel_sizes=((8, 1, 1), (32, 1, 1)),
    head_output_size: Tuple[int, int, int] = (1, 1, 1),
    head_activation: Optional[Callable] = jax.nn.sigmoid,
    head_output_with_global_average: bool = False,
    head_spatial_resolution: Tuple[int, int] = (7, 7),
    head_spatial_scale: float = 1.0 / 16.0,
    head_sampling_ratio: int = 0,
    stage_depths: Optional[Tuple[int, ...]] = None,
) -> DetectionBBoxNetwork:
    """SlowFast AVA detection model (reference slowfast.py:364-582)."""
    model = create_slowfast(
        stage_depths=stage_depths,
        slowfast_channel_reduction_ratio=slowfast_channel_reduction_ratio,
        slowfast_conv_channel_fusion_ratio=slowfast_conv_channel_fusion_ratio,
        slowfast_fusion_conv_kernel_size=slowfast_fusion_conv_kernel_size,
        slowfast_fusion_conv_stride=slowfast_fusion_conv_stride,
        fusion_builder=fusion_builder,
        input_channels=input_channels,
        model_depth=model_depth,
        model_num_class=model_num_class,
        dropout_rate=dropout_rate,
        norm=norm,
        activation=activation,
        stem_function=stem_function,
        stem_dim_outs=stem_dim_outs,
        stem_conv_kernel_sizes=stem_conv_kernel_sizes,
        stem_conv_strides=stem_conv_strides,
        stem_pool=stem_pool,
        stem_pool_kernel_sizes=stem_pool_kernel_sizes,
        stem_pool_strides=stem_pool_strides,
        stage_conv_a_kernel_sizes=stage_conv_a_kernel_sizes,
        stage_conv_b_kernel_sizes=stage_conv_b_kernel_sizes,
        stage_conv_b_num_groups=stage_conv_b_num_groups,
        stage_conv_b_dilations=stage_conv_b_dilations,
        stage_spatial_strides=stage_spatial_strides,
        stage_temporal_strides=stage_temporal_strides,
        bottleneck=bottleneck,
        head=None,
        head_pool_kernel_sizes=head_pool_kernel_sizes,
    )
    stage_dim_out = stem_dim_outs[0] * 2 ** (
        len(stage_depths or _MODEL_STAGE_DEPTH[model_depth]) + 1
    )
    slow_fast_beta = stem_dim_outs[0] // stem_dim_outs[1]
    head_in_features = stage_dim_out + stage_dim_out // slow_fast_beta
    head_module = head(
        in_features=head_in_features,
        out_features=model_num_class,
        pool=None,
        output_size=head_output_size,
        dropout_rate=dropout_rate,
        activation=head_activation,
        output_with_global_average=head_output_with_global_average,
        resolution=head_spatial_resolution,
        spatial_scale=head_spatial_scale,
        sampling_ratio=head_sampling_ratio,
    )
    return DetectionBBoxNetwork(model=model, detection_head=head_module)
