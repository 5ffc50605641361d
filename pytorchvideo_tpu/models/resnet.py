"""ResNet-family video models (Slow / I3D / C2D backbones) — builders + blocks.

Parity: pytorchvideo/models/resnet.py (create_bottleneck_block :17-148,
create_acoustic_bottleneck_block :151-316, create_res_block :326-462,
create_res_stage :465-594, create_resnet :601-841, create_acoustic_resnet
:1022-1134, classes ResBlock :1137, SeparableBottleneckBlock :1192,
BottleneckBlock :1288, ResStage :1368). Channels-last (B, T, H, W, C); all
convs map to XLA conv_general_dilated on the MXU.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import numpy as np

from pytorchvideo_tpu.layers.common import Conv3d, apply_with_train
from pytorchvideo_tpu.layers.norms import BatchNorm, make_act, make_norm
from pytorchvideo_tpu.layers.pooling import AvgPool3d, MaxPool3d
from pytorchvideo_tpu.models.head import create_res_basic_head
from pytorchvideo_tpu.models.net import Net
from pytorchvideo_tpu.models.stem import (
    create_acoustic_res_basic_stem,
    create_res_basic_stem,
)

_MODEL_STAGE_DEPTH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _trivial_sum(x, y):
    return x + y


class BottleneckBlock(nn.Module):
    """conv_a -> norm -> act -> conv_b -> norm -> act -> conv_c -> norm
    (reference resnet.py:1288-1365). ``norm_c`` carries the zero-init-final-BN
    convention (weight_init.py:34-35); see models/weight_init.py.
    """

    conv_a: Optional[nn.Module] = None
    norm_a: Optional[nn.Module] = None
    act_a: Optional[Callable] = None
    conv_b: Optional[nn.Module] = None
    norm_b: Optional[nn.Module] = None
    act_b: Optional[Callable] = None
    conv_c: Optional[nn.Module] = None
    norm_c: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = apply_with_train(self.conv_a, x, train)
        x = apply_with_train(self.norm_a, x, train)
        if self.act_a is not None:
            x = self.act_a(x)
        x = apply_with_train(self.conv_b, x, train)
        x = apply_with_train(self.norm_b, x, train)
        if self.act_b is not None:
            x = self.act_b(x)
        x = apply_with_train(self.conv_c, x, train)
        x = apply_with_train(self.norm_c, x, train)
        return x


class SeparableBottleneckBlock(nn.Module):
    """Bottleneck with parallel conv_b branches reduced by sum
    (reference resnet.py:1192-1285; used by acoustic pathways)."""

    conv_a: Optional[nn.Module] = None
    norm_a: Optional[nn.Module] = None
    act_a: Optional[Callable] = None
    conv_b: Sequence[Optional[nn.Module]] = ()
    norm_b: Sequence[Optional[nn.Module]] = ()
    act_b: Sequence[Optional[Callable]] = ()
    conv_c: Optional[nn.Module] = None
    norm_c: Optional[nn.Module] = None
    reduce_method: str = "sum"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = apply_with_train(self.conv_a, x, train)
        x = apply_with_train(self.norm_a, x, train)
        if self.act_a is not None:
            x = self.act_a(x)

        outputs = []
        for i, conv in enumerate(self.conv_b):
            branch = apply_with_train(conv, x, train)
            branch = apply_with_train(self.norm_b[i], branch, train)
            if self.act_b[i] is not None:
                branch = self.act_b[i](branch)
            outputs.append(branch)
        if self.reduce_method == "sum":
            x = outputs[0]
            for o in outputs[1:]:
                x = x + o
        else:
            import jax.numpy as jnp

            x = jnp.concatenate(outputs, axis=-1)

        x = apply_with_train(self.conv_c, x, train)
        x = apply_with_train(self.norm_c, x, train)
        return x


class ResBlock(nn.Module):
    """shortcut + bottleneck -> fusion -> activation (reference resnet.py:1137-1189)."""

    branch2: nn.Module
    branch1_conv: Optional[nn.Module] = None
    branch1_norm: Optional[nn.Module] = None
    activation: Optional[Callable] = None
    branch_fusion: Callable = _trivial_sum

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.branch1_conv is not None:
            shortcut = self.branch1_conv(x)
            shortcut = apply_with_train(self.branch1_norm, shortcut, train)
        x = self.branch_fusion(shortcut, self.branch2(x, train=train))
        if self.activation is not None:
            x = self.activation(x)
        return x


class ResStage(nn.Module):
    """Sequence of residual blocks (reference resnet.py:1368-1400)."""

    res_blocks: Sequence[nn.Module]

    @nn.compact
    def __call__(self, x, train: bool = False):
        for block in self.res_blocks:
            x = block(x, train=train)
        return x


def create_bottleneck_block(
    *,
    dim_in: int,
    dim_inner: int,
    dim_out: int,
    conv_a_kernel_size: Tuple[int, int, int] = (3, 1, 1),
    conv_a_stride: Tuple[int, int, int] = (2, 1, 1),
    conv_a_padding: Tuple[int, int, int] = (1, 0, 0),
    conv_a: Callable = Conv3d,
    conv_b_kernel_size: Tuple[int, int, int] = (1, 3, 3),
    conv_b_stride: Tuple[int, int, int] = (1, 2, 2),
    conv_b_padding: Tuple[int, int, int] = (0, 1, 1),
    conv_b_num_groups: int = 1,
    conv_b_dilation: Tuple[int, int, int] = (1, 1, 1),
    conv_b: Callable = Conv3d,
    conv_c: Callable = Conv3d,
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
) -> BottleneckBlock:
    """Builder (reference resnet.py:17-148)."""
    return BottleneckBlock(
        conv_a=conv_a(
            in_channels=dim_in,
            out_channels=dim_inner,
            kernel_size=conv_a_kernel_size,
            stride=conv_a_stride,
            padding=conv_a_padding,
            bias=False,
        ),
        norm_a=make_norm(norm, dim_inner, norm_eps, norm_momentum),
        act_a=make_act(activation),
        conv_b=conv_b(
            in_channels=dim_inner,
            out_channels=dim_inner,
            kernel_size=conv_b_kernel_size,
            stride=conv_b_stride,
            padding=conv_b_padding,
            bias=False,
            groups=conv_b_num_groups,
            dilation=conv_b_dilation,
        ),
        norm_b=make_norm(norm, dim_inner, norm_eps, norm_momentum),
        act_b=make_act(activation),
        conv_c=conv_c(
            in_channels=dim_inner,
            out_channels=dim_out,
            kernel_size=(1, 1, 1),
            bias=False,
        ),
        norm_c=make_norm(norm, dim_out, norm_eps, norm_momentum),
    )


def create_acoustic_bottleneck_block(
    *,
    dim_in: int,
    dim_inner: int,
    dim_out: int,
    conv_a_kernel_size: Tuple[int, int, int] = (3, 1, 1),
    conv_a_stride: Tuple[int, int, int] = (2, 1, 1),
    conv_a_padding: Tuple[int, int, int] = (1, 0, 0),
    conv_a: Callable = Conv3d,
    conv_b_kernel_size: Tuple[int, int, int] = (1, 1, 1),
    conv_b_stride: Tuple[int, int, int] = (1, 1, 1),
    conv_b_padding: Tuple[int, int, int] = (0, 0, 0),
    conv_b_num_groups: int = 1,
    conv_b_dilation: Tuple[int, int, int] = (1, 1, 1),
    conv_b: Callable = Conv3d,
    conv_c: Callable = Conv3d,
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
) -> SeparableBottleneckBlock:
    """Acoustic bottleneck: parallel temporal/spatial conv_b branches
    (reference resnet.py:151-316)."""

    def branch_conv(kernel, stride, padding, dilation):
        return conv_b(
            in_channels=dim_inner,
            out_channels=dim_inner,
            kernel_size=kernel,
            stride=stride,
            padding=padding,
            bias=False,
            groups=conv_b_num_groups,
            dilation=dilation,
        )

    # Branch order (spatial first, then temporal) matches the reference's
    # ModuleList([conv_b_2, conv_b_1]) (resnet.py:306-316).
    conv_b_spatial = branch_conv(
        (1, conv_b_kernel_size[1], conv_b_kernel_size[2]),
        conv_b_stride,
        (0, conv_b_padding[1], conv_b_padding[2]),
        (1, conv_b_dilation[1], conv_b_dilation[2]),
    )
    conv_b_temporal = branch_conv(
        (conv_b_kernel_size[0], 1, 1),
        conv_b_stride,
        (conv_b_padding[0], 0, 0),
        (conv_b_dilation[0], 1, 1),
    )
    return SeparableBottleneckBlock(
        conv_a=conv_a(
            in_channels=dim_in,
            out_channels=dim_inner,
            kernel_size=conv_a_kernel_size,
            stride=conv_a_stride,
            padding=conv_a_padding,
            bias=False,
        ),
        norm_a=make_norm(norm, dim_inner, norm_eps, norm_momentum),
        act_a=make_act(activation),
        conv_b=[conv_b_spatial, conv_b_temporal],
        norm_b=[
            make_norm(norm, dim_inner, norm_eps, norm_momentum),
            make_norm(norm, dim_inner, norm_eps, norm_momentum),
        ],
        act_b=[make_act(activation), make_act(activation)],
        conv_c=conv_c(
            in_channels=dim_inner,
            out_channels=dim_out,
            kernel_size=(1, 1, 1),
            bias=False,
        ),
        norm_c=make_norm(norm, dim_out, norm_eps, norm_momentum),
    )


def create_res_block(
    *,
    dim_in: int,
    dim_inner: int,
    dim_out: int,
    bottleneck: Callable,
    use_shortcut: bool = False,
    branch_fusion: Callable = _trivial_sum,
    conv_a_kernel_size: Tuple[int, int, int] = (3, 1, 1),
    conv_a_stride: Tuple[int, int, int] = (2, 1, 1),
    conv_a_padding: Tuple[int, int, int] = (1, 0, 0),
    conv_a: Callable = Conv3d,
    conv_b_kernel_size: Tuple[int, int, int] = (1, 3, 3),
    conv_b_stride: Tuple[int, int, int] = (1, 2, 2),
    conv_b_padding: Tuple[int, int, int] = (0, 1, 1),
    conv_b_num_groups: int = 1,
    conv_b_dilation: Tuple[int, int, int] = (1, 1, 1),
    conv_b: Callable = Conv3d,
    conv_c: Callable = Conv3d,
    conv_skip: Callable = Conv3d,
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation_bottleneck: Optional[Callable] = nn.relu,
    activation_block: Optional[Callable] = nn.relu,
) -> ResBlock:
    """Builder (reference resnet.py:326-462). Shortcut conv appears iff the
    dims or the combined stride change (or use_shortcut)."""
    branch1_stride = tuple(a * b for a, b in zip(conv_a_stride, conv_b_stride))
    needs_proj = dim_in != dim_out or int(np.prod(branch1_stride)) != 1
    branch1_conv = (
        conv_skip(
            in_channels=dim_in,
            out_channels=dim_out,
            kernel_size=(1, 1, 1),
            stride=branch1_stride,
            bias=False,
        )
        if needs_proj or use_shortcut
        else None
    )
    branch1_norm = (
        make_norm(norm, dim_out, norm_eps, norm_momentum)
        if (use_shortcut or (norm is not None and needs_proj))
        else None
    )
    return ResBlock(
        branch1_conv=branch1_conv,
        branch1_norm=branch1_norm,
        branch2=bottleneck(
            dim_in=dim_in,
            dim_inner=dim_inner,
            dim_out=dim_out,
            conv_a_kernel_size=conv_a_kernel_size,
            conv_a_stride=conv_a_stride,
            conv_a_padding=conv_a_padding,
            conv_a=conv_a,
            conv_b_kernel_size=conv_b_kernel_size,
            conv_b_stride=conv_b_stride,
            conv_b_padding=conv_b_padding,
            conv_b_num_groups=conv_b_num_groups,
            conv_b_dilation=conv_b_dilation,
            conv_b=conv_b,
            conv_c=conv_c,
            norm=norm,
            norm_eps=norm_eps,
            norm_momentum=norm_momentum,
            activation=activation_bottleneck,
        ),
        activation=make_act(activation_block),
        branch_fusion=branch_fusion,
    )


def create_res_stage(
    *,
    depth: int,
    dim_in: int,
    dim_inner: int,
    dim_out: int,
    bottleneck: Callable,
    conv_a_kernel_size: Union[Tuple, List] = (3, 1, 1),
    conv_a_stride: Tuple[int, int, int] = (2, 1, 1),
    conv_a_padding: Union[Tuple, List] = (1, 0, 0),
    conv_a: Callable = Conv3d,
    conv_b_kernel_size: Tuple[int, int, int] = (1, 3, 3),
    conv_b_stride: Tuple[int, int, int] = (1, 2, 2),
    conv_b_padding: Tuple[int, int, int] = (0, 1, 1),
    conv_b_num_groups: int = 1,
    conv_b_dilation: Tuple[int, int, int] = (1, 1, 1),
    conv_b: Callable = Conv3d,
    conv_c: Callable = Conv3d,
    conv_skip: Callable = Conv3d,
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
) -> ResStage:
    """Builder (reference resnet.py:465-594): stride only on block 0;
    per-block conv_a kernels cycle through a list if given."""
    if isinstance(conv_a_kernel_size[0], int):
        conv_a_kernel_size = [conv_a_kernel_size]
    if isinstance(conv_a_padding[0], int):
        conv_a_padding = [conv_a_padding]
    conv_a_kernel_size = (list(conv_a_kernel_size) * depth)[:depth]
    conv_a_padding = (list(conv_a_padding) * depth)[:depth]

    blocks = []
    for ind in range(depth):
        blocks.append(
            create_res_block(
                dim_in=dim_in if ind == 0 else dim_out,
                dim_inner=dim_inner,
                dim_out=dim_out,
                bottleneck=bottleneck,
                conv_a_kernel_size=conv_a_kernel_size[ind],
                conv_a_stride=conv_a_stride if ind == 0 else (1, 1, 1),
                conv_a_padding=conv_a_padding[ind],
                conv_a=conv_a,
                conv_b_kernel_size=conv_b_kernel_size,
                conv_b_stride=conv_b_stride if ind == 0 else (1, 1, 1),
                conv_b_padding=conv_b_padding,
                conv_b_num_groups=conv_b_num_groups,
                conv_b_dilation=conv_b_dilation,
                conv_b=conv_b,
                conv_c=conv_c,
                conv_skip=conv_skip,
                norm=norm,
                norm_eps=norm_eps,
                norm_momentum=norm_momentum,
                activation_bottleneck=activation,
                activation_block=activation,
            )
        )
    return ResStage(res_blocks=blocks)


class _PoolBlock(nn.Module):
    """Wraps a plain pooling callable as a Net block (stage1_pool)."""

    pool: Callable

    @nn.compact
    def __call__(self, x, train: bool = False):
        return self.pool(x)


def create_resnet(
    *,
    input_channel: int = 3,
    model_depth: int = 50,
    model_num_class: int = 400,
    dropout_rate: float = 0.5,
    norm: Optional[Callable] = BatchNorm,
    activation: Optional[Callable] = nn.relu,
    stem_dim_out: int = 64,
    stem_conv_kernel_size: Tuple[int, int, int] = (3, 7, 7),
    stem_conv_stride: Tuple[int, int, int] = (1, 2, 2),
    stem_pool: Optional[Callable] = MaxPool3d,
    stem_pool_kernel_size: Tuple[int, int, int] = (1, 3, 3),
    stem_pool_stride: Tuple[int, int, int] = (1, 2, 2),
    stem: Callable = create_res_basic_stem,
    stage1_pool: Optional[Callable] = None,
    stage1_pool_kernel_size: Tuple[int, int, int] = (2, 1, 1),
    stage_conv_a_kernel_size: Union[Tuple, List] = (
        (1, 1, 1),
        (1, 1, 1),
        (3, 1, 1),
        (3, 1, 1),
    ),
    stage_conv_b_kernel_size: Union[Tuple, List] = (
        (1, 3, 3),
        (1, 3, 3),
        (1, 3, 3),
        (1, 3, 3),
    ),
    stage_conv_b_num_groups: Tuple[int, ...] = (1, 1, 1, 1),
    stage_conv_b_dilation: Union[Tuple, List] = (
        (1, 1, 1),
        (1, 1, 1),
        (1, 1, 1),
        (1, 1, 1),
    ),
    stage_spatial_h_stride: Tuple[int, ...] = (1, 2, 2, 2),
    stage_spatial_w_stride: Tuple[int, ...] = (1, 2, 2, 2),
    stage_temporal_stride: Tuple[int, ...] = (1, 1, 1, 1),
    bottleneck: Union[Tuple[Callable, ...], Callable] = create_bottleneck_block,
    head: Optional[Callable] = create_res_basic_head,
    head_pool: Optional[Callable] = AvgPool3d,
    head_pool_kernel_size: Tuple[int, int, int] = (4, 7, 7),
    head_output_size: Tuple[int, int, int] = (1, 1, 1),
    head_activation: Optional[Callable] = None,
    head_output_with_global_average: bool = True,
    stage_depths: Optional[Tuple[int, ...]] = None,
) -> Net:
    """Build Slow/I3D/C2D-style ResNets (reference resnet.py:601-841).

    `stage_depths` overrides the depth table (extension beyond the
    reference's fixed 50/101/152 — e.g. (1, 1, 1, 1) for tiny configs)."""
    if stage_depths is None:
        assert model_depth in _MODEL_STAGE_DEPTH, f"{model_depth} unsupported"
        stage_depths = _MODEL_STAGE_DEPTH[model_depth]

    if isinstance(stage_conv_a_kernel_size[0], int):
        stage_conv_a_kernel_size = (stage_conv_a_kernel_size,) * len(stage_depths)
    if isinstance(stage_conv_b_kernel_size[0], int):
        stage_conv_b_kernel_size = (stage_conv_b_kernel_size,) * len(stage_depths)
    if isinstance(stage_conv_b_dilation[0], int):
        stage_conv_b_dilation = (stage_conv_b_dilation,) * len(stage_depths)
    if callable(bottleneck):
        bottleneck = (bottleneck,) * len(stage_depths)

    blocks = []
    blocks.append(
        stem(
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
    )

    stage_dim_in = stem_dim_out
    stage_dim_out = stage_dim_in * 4
    for idx in range(len(stage_depths)):
        stage_dim_inner = stage_dim_out // 4
        stage_conv_a_kernel = stage_conv_a_kernel_size[idx]
        stage_conv_a_padding = (
            [s // 2 for s in stage_conv_a_kernel]
            if isinstance(stage_conv_a_kernel[0], int)
            else [[s // 2 for s in sizes] for sizes in stage_conv_a_kernel]
        )
        blocks.append(
            create_res_stage(
                depth=stage_depths[idx],
                dim_in=stage_dim_in,
                dim_inner=stage_dim_inner,
                dim_out=stage_dim_out,
                bottleneck=bottleneck[idx],
                conv_a_kernel_size=stage_conv_a_kernel,
                conv_a_stride=(stage_temporal_stride[idx], 1, 1),
                conv_a_padding=stage_conv_a_padding,
                conv_b_kernel_size=stage_conv_b_kernel_size[idx],
                conv_b_stride=(
                    1,
                    stage_spatial_h_stride[idx],
                    stage_spatial_w_stride[idx],
                ),
                conv_b_padding=(
                    stage_conv_b_kernel_size[idx][0] // 2,
                    stage_conv_b_dilation[idx][1]
                    if stage_conv_b_dilation[idx][1] > 1
                    else stage_conv_b_kernel_size[idx][1] // 2,
                    stage_conv_b_dilation[idx][2]
                    if stage_conv_b_dilation[idx][2] > 1
                    else stage_conv_b_kernel_size[idx][2] // 2,
                ),
                conv_b_num_groups=stage_conv_b_num_groups[idx],
                conv_b_dilation=stage_conv_b_dilation[idx],
                norm=norm,
                activation=activation,
            )
        )
        stage_dim_in = stage_dim_out
        stage_dim_out = stage_dim_out * 2

        if idx == 0 and stage1_pool is not None:
            blocks.append(
                _PoolBlock(
                    pool=stage1_pool(
                        kernel_size=stage1_pool_kernel_size,
                        stride=stage1_pool_kernel_size,
                        padding=(0, 0, 0),
                    )
                )
            )

    if head is not None:
        blocks.append(
            head(
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


def create_acoustic_resnet(
    *,
    input_channel: int = 1,
    model_depth: int = 50,
    model_num_class: int = 400,
    dropout_rate: float = 0.5,
    norm: Optional[Callable] = BatchNorm,
    activation: Optional[Callable] = nn.relu,
    stem_dim_out: int = 64,
    stem_conv_kernel_size: Tuple[int, int, int] = (9, 1, 9),
    stem_conv_stride: Tuple[int, int, int] = (1, 1, 3),
    stem_pool: Optional[Callable] = None,
    stem_pool_kernel_size: Tuple[int, int, int] = (3, 1, 3),
    stem_pool_stride: Tuple[int, int, int] = (2, 1, 2),
    stem: Callable = create_acoustic_res_basic_stem,
    stage1_pool: Optional[Callable] = None,
    stage1_pool_kernel_size: Tuple[int, int, int] = (2, 1, 1),
    stage_conv_a_kernel_size: Union[Tuple, List] = (3, 1, 1),
    stage_conv_b_kernel_size: Union[Tuple, List] = (3, 1, 3),
    stage_conv_b_num_groups: Tuple[int, ...] = (1, 1, 1, 1),
    stage_conv_b_dilation: Union[Tuple, List] = (1, 1, 1),
    stage_spatial_h_stride: Tuple[int, ...] = (1, 1, 1, 1),
    stage_spatial_w_stride: Tuple[int, ...] = (1, 2, 2, 2),
    stage_temporal_stride: Tuple[int, ...] = (1, 2, 2, 2),
    bottleneck: Union[Tuple[Callable, ...], Callable] = (
        create_acoustic_bottleneck_block,
        create_acoustic_bottleneck_block,
        create_bottleneck_block,
        create_bottleneck_block,
    ),
    head_pool: Optional[Callable] = AvgPool3d,
    head_pool_kernel_size: Tuple[int, int, int] = (4, 1, 2),
    head_output_size: Tuple[int, int, int] = (1, 1, 1),
    head_activation: Optional[Callable] = None,
    head_output_with_global_average: bool = True,
) -> Net:
    """Audio ResNet over (B, T, 1, F, C) spectrograms
    (reference resnet.py:1022-1134)."""
    return create_resnet(
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
        stage1_pool_kernel_size=stage1_pool_kernel_size,
        stage_conv_a_kernel_size=stage_conv_a_kernel_size,
        stage_conv_b_kernel_size=stage_conv_b_kernel_size,
        stage_conv_b_num_groups=stage_conv_b_num_groups,
        stage_conv_b_dilation=stage_conv_b_dilation,
        stage_spatial_h_stride=stage_spatial_h_stride,
        stage_spatial_w_stride=stage_spatial_w_stride,
        stage_temporal_stride=stage_temporal_stride,
        bottleneck=bottleneck,
        head_pool=head_pool,
        head_pool_kernel_size=head_pool_kernel_size,
        head_output_size=head_output_size,
        head_activation=head_activation,
        head_output_with_global_average=head_output_with_global_average,
    )
