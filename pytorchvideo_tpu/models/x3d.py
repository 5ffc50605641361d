"""X3D model family (XS/S/M/L by clip/crop/depth factors).

Parity: pytorchvideo/models/x3d.py (create_x3d_stem :19-102, bottleneck
:105-228, res block :230-325, res stage :327-408, head :411-536 + ProjectedPool
:742-806, create_x3d :539-738). Channels-last.

TPU note: the depthwise 3x3x3 conv_b + SE + Swish chain is the hot block; it
runs on the VPU via XLA today, with a fused Pallas kernel as the optimization
point (ops/).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import numpy as np

from pytorchvideo_tpu.layers.common import (
    Conv3d,
    WBlockedConv,
    apply_with_train,
    pad_pairs,
)
from pytorchvideo_tpu.layers.convolutions import Conv2plus1d
from pytorchvideo_tpu.layers.norms import BatchNorm, make_act, make_norm
from pytorchvideo_tpu.layers.pooling import AvgPool3d
from pytorchvideo_tpu.layers.squeeze_excitation import SqueezeExcitation
from pytorchvideo_tpu.layers.stochastic import swish
from pytorchvideo_tpu.layers.utils import round_repeats, round_width
from pytorchvideo_tpu.models.head import ResNetBasicHead
from pytorchvideo_tpu.models.net import Net
from pytorchvideo_tpu.models.resnet import BottleneckBlock, ResBlock, ResStage
from pytorchvideo_tpu.models.stem import ResNetBasicStem


def create_x3d_stem(
    *,
    in_channels: int,
    out_channels: int,
    conv_kernel_size: Tuple[int, int, int] = (5, 3, 3),
    conv_stride: Tuple[int, int, int] = (1, 2, 2),
    conv_padding: Tuple[int, int, int] = (2, 1, 1),
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
    batch_pack: int = 0,
    batch_pack_entry: str = "input",
) -> ResNetBasicStem:
    """X3D stem: spatial conv then depthwise temporal conv
    (reference x3d.py:19-102; note the reference stores the spatial conv in
    Conv2plus1d's ``conv_t`` slot and the temporal in ``conv_xy`` — we keep
    that field layout for checkpoint-name parity).

    ``batch_pack=b`` enters the batch-packed layout (layers/batchpack.py):
    with ``batch_pack_entry="input"`` the spatial conv packs its input and
    runs grouped; with ``"late"`` the spatial conv stays unpacked
    (WBlockedConv) and the temporal depthwise conv packs — the pack
    relayout then moves the larger post-conv tensor (A/B'd on hardware in
    benchmarks/x3d_breakdown.py ab)."""
    if batch_pack > 1:
        from pytorchvideo_tpu.layers.batchpack import BatchPackedConv3d
        from pytorchvideo_tpu.layers.packed import packed_norm

        if batch_pack_entry == "input":
            conv_xy = BatchPackedConv3d(
                features=out_channels,
                kernel_size=(1, conv_kernel_size[1], conv_kernel_size[2]),
                in_channels=in_channels,
                batch=batch_pack,
                strides=(1, conv_stride[1], conv_stride[2]),
                padding=(0, conv_padding[1], conv_padding[2]),
                use_bias=False,
                pack_input=True,
            )
        else:
            conv_xy = WBlockedConv(
                features=out_channels,
                kernel_size=(1, conv_kernel_size[1], conv_kernel_size[2]),
                strides=(1, conv_stride[1], conv_stride[2]),
                padding=pad_pairs((0, conv_padding[1], conv_padding[2])),
                use_bias=False,
            )
        conv_t = BatchPackedConv3d(
            features=out_channels,
            kernel_size=(conv_kernel_size[0], 1, 1),
            in_channels=out_channels,
            batch=batch_pack,
            strides=(conv_stride[0], 1, 1),
            padding=(conv_padding[0], 0, 0),
            use_bias=False,
            groups=out_channels,
            pack_input=(batch_pack_entry == "late"),
        )
        stacked = Conv2plus1d(
            conv_t=conv_xy, norm=None, activation=None, conv_xy=conv_t
        )
        return ResNetBasicStem(
            conv=stacked,
            norm=make_norm(
                packed_norm(norm), out_channels, norm_eps, norm_momentum
            ),
            activation=make_act(activation),
            pool=None,
        )
    if in_channels * conv_stride[2] <= 32 and conv_stride[2] > 1:
        # Tiny-C_in strided spatial conv: stride-block W (exact rewrite,
        # identical param tree) — see models/stem.py create_res_basic_stem.
        conv_xy = WBlockedConv(
            features=out_channels,
            kernel_size=(1, conv_kernel_size[1], conv_kernel_size[2]),
            strides=(1, conv_stride[1], conv_stride[2]),
            padding=pad_pairs((0, conv_padding[1], conv_padding[2])),
            use_bias=False,
        )
    else:
        conv_xy = Conv3d(
            in_channels=in_channels,
            out_channels=out_channels,
            kernel_size=(1, conv_kernel_size[1], conv_kernel_size[2]),
            stride=(1, conv_stride[1], conv_stride[2]),
            padding=(0, conv_padding[1], conv_padding[2]),
            bias=False,
        )
    conv_t = Conv3d(
        in_channels=out_channels,
        out_channels=out_channels,
        kernel_size=(conv_kernel_size[0], 1, 1),
        stride=(conv_stride[0], 1, 1),
        padding=(conv_padding[0], 0, 0),
        bias=False,
        groups=out_channels,
    )
    stacked = Conv2plus1d(conv_t=conv_xy, norm=None, activation=None, conv_xy=conv_t)
    return ResNetBasicStem(
        conv=stacked,
        norm=make_norm(norm, out_channels, norm_eps, norm_momentum),
        activation=make_act(activation),
        pool=None,
    )


class NormSE(nn.Module):
    """norm followed by optional SE (the reference packs these into
    nn.Sequential(norm, se) as the bottleneck's norm_b, x3d.py:195-204)."""

    norm: Optional[nn.Module] = None
    se: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = apply_with_train(self.norm, x, train)
        if self.se is not None:
            x = self.se(x)
        return x


def create_x3d_bottleneck_block(
    *,
    dim_in: int,
    dim_inner: int,
    dim_out: int,
    conv_kernel_size: Tuple[int, int, int] = (3, 3, 3),
    conv_stride: Tuple[int, int, int] = (1, 2, 2),
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    se_ratio: float = 0.0625,
    activation: Optional[Callable] = nn.relu,
    inner_act: Optional[Callable] = swish,
    batch_pack: int = 0,
    batch_pack_mode: str = "segment",
) -> BottleneckBlock:
    """1x1x1 -> depthwise 3x3x3 (+SE) + Swish -> 1x1x1
    (reference x3d.py:105-228). ``batch_pack=b`` builds the exact
    batch-packed variant of every op (layers/batchpack.py) — identical
    parameter tree, adapts to unpacked inputs at call time.

    ``batch_pack_mode="dw"`` packs LOCALLY around the depthwise chain
    only (VERDICT r3 item 3): conv_a/conv_c stay plain unpacked GEMMs
    (the measured losers when packed) while conv_b + BN + SE + swish run
    batch-packed; the pack happens inside conv_b (``pack_input``) and the
    unpack inside conv_c (``unpack_input``). Built only while
    ``dim_inner < 128`` (lane-underfilled); wider blocks build plain.

    MEASURED VERDICT (v5e B128 bf16 deploy, one session, interleaved
    medians, benchmarks/x3d_breakdown.py ab_dw): plain 3,658 clips/s,
    dw-only pack2 1,129, pack4 1,110 — a 3x loss, same as whole-model
    packing. The cost was never the packed pointwise arithmetic: it is
    the two (B,..,C)<->(B/b,..,b*C) relayouts per block (XLA materializes
    the minor-dim re-tile as a copy), ~2 copies x 8 packed blocks against
    a 1.3 ms/step depthwise win. HW parity exact (9.8e-4 bf16). Default
    stays plain; see docs/x3d_roofline.md."""
    if batch_pack > 1 and batch_pack_mode == "dw":
        if dim_inner >= 128:
            batch_pack = 0  # lanes already full; local packing is pointless
        else:
            from pytorchvideo_tpu.layers.batchpack import (
                BatchPackedConv3d,
                BatchPackedSE,
            )
            from pytorchvideo_tpu.layers.packed import packed_norm

            se = (
                BatchPackedSE(
                    num_channels_reduced=round_width(dim_inner, se_ratio),
                    channels=dim_inner,
                    batch=batch_pack,
                )
                if se_ratio > 0.0
                else None
            )
            return BottleneckBlock(
                conv_a=Conv3d(
                    in_channels=dim_in,
                    out_channels=dim_inner,
                    kernel_size=(1, 1, 1),
                    bias=False,
                ),
                norm_a=make_norm(norm, dim_inner, norm_eps, norm_momentum),
                act_a=make_act(activation),
                conv_b=BatchPackedConv3d(
                    features=dim_inner,
                    kernel_size=conv_kernel_size,
                    in_channels=dim_inner,
                    batch=batch_pack,
                    strides=conv_stride,
                    padding=tuple(s // 2 for s in conv_kernel_size),
                    groups=dim_inner,
                    use_bias=False,
                    pack_input=True,
                ),
                norm_b=NormSE(
                    norm=make_norm(
                        packed_norm(norm), dim_inner, norm_eps, norm_momentum
                    ),
                    se=se,
                ),
                act_b=make_act(inner_act),
                conv_c=BatchPackedConv3d(
                    features=dim_out,
                    kernel_size=(1, 1, 1),
                    in_channels=dim_inner,
                    batch=batch_pack,
                    use_bias=False,
                    unpack_input=True,
                ),
                norm_c=make_norm(norm, dim_out, norm_eps, norm_momentum),
            )
    if batch_pack > 1:
        from pytorchvideo_tpu.layers.batchpack import (
            BatchPackedConv3d,
            BatchPackedSE,
        )
        from pytorchvideo_tpu.layers.packed import packed_norm

        def conv_f(*, in_channels, out_channels, kernel_size, stride=(1, 1, 1),
                   padding=(0, 0, 0), bias=True, groups=1):
            return BatchPackedConv3d(
                features=out_channels,
                kernel_size=kernel_size,
                in_channels=in_channels,
                batch=batch_pack,
                strides=stride,
                padding=padding,
                groups=groups,
                use_bias=bias,
            )

        norm = packed_norm(norm)
        se = (
            BatchPackedSE(
                num_channels_reduced=round_width(dim_inner, se_ratio),
                channels=dim_inner,
                batch=batch_pack,
            )
            if se_ratio > 0.0
            else None
        )
    else:
        conv_f = Conv3d
        se = (
            SqueezeExcitation(
                num_channels_reduced=round_width(dim_inner, se_ratio)
            )
            if se_ratio > 0.0
            else None
        )
    return BottleneckBlock(
        conv_a=conv_f(
            in_channels=dim_in,
            out_channels=dim_inner,
            kernel_size=(1, 1, 1),
            bias=False,
        ),
        norm_a=make_norm(norm, dim_inner, norm_eps, norm_momentum),
        act_a=make_act(activation),
        conv_b=conv_f(
            in_channels=dim_inner,
            out_channels=dim_inner,
            kernel_size=conv_kernel_size,
            stride=conv_stride,
            padding=tuple(s // 2 for s in conv_kernel_size),
            bias=False,
            groups=dim_inner,
        ),
        norm_b=NormSE(
            norm=make_norm(norm, dim_inner, norm_eps, norm_momentum), se=se
        ),
        act_b=make_act(inner_act),
        conv_c=conv_f(
            in_channels=dim_inner,
            out_channels=dim_out,
            kernel_size=(1, 1, 1),
            bias=False,
        ),
        norm_c=make_norm(norm, dim_out, norm_eps, norm_momentum),
    )


def create_x3d_res_block(
    *,
    dim_in: int,
    dim_inner: int,
    dim_out: int,
    bottleneck: Callable = create_x3d_bottleneck_block,
    use_shortcut: bool = True,
    conv_kernel_size: Tuple[int, int, int] = (3, 3, 3),
    conv_stride: Tuple[int, int, int] = (1, 2, 2),
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    se_ratio: float = 0.0625,
    activation: Optional[Callable] = nn.relu,
    inner_act: Optional[Callable] = swish,
    batch_pack: int = 0,
) -> ResBlock:
    """Reference x3d.py:230-325. ``batch_pack`` propagates the batch-packed
    layout to the shortcut conv and the bottleneck (which must accept the
    kwarg when enabled)."""
    if batch_pack > 1:
        from pytorchvideo_tpu.layers.batchpack import BatchPackedConv3d
        from pytorchvideo_tpu.layers.packed import packed_norm

        def skip_f(**kw):
            kw.pop("bias", None)
            return BatchPackedConv3d(
                features=kw["out_channels"],
                kernel_size=kw["kernel_size"],
                in_channels=kw["in_channels"],
                batch=batch_pack,
                strides=kw.get("stride", (1, 1, 1)),
                use_bias=False,
            )

        skip_norm = packed_norm(norm)
    else:
        skip_f = Conv3d
        skip_norm = norm
    extra = {"batch_pack": batch_pack} if batch_pack > 1 else {}
    needs_proj = dim_in != dim_out or int(np.prod(conv_stride)) > 1
    return ResBlock(
        branch1_conv=(
            skip_f(
                in_channels=dim_in,
                out_channels=dim_out,
                kernel_size=(1, 1, 1),
                stride=conv_stride,
                bias=False,
            )
            if needs_proj and use_shortcut
            else None
        ),
        branch1_norm=(
            make_norm(skip_norm, dim_out, norm_eps, norm_momentum)
            if (norm is not None and dim_in != dim_out and use_shortcut)
            else None
        ),
        branch2=bottleneck(
            dim_in=dim_in,
            dim_inner=dim_inner,
            dim_out=dim_out,
            conv_kernel_size=conv_kernel_size,
            conv_stride=conv_stride,
            norm=norm,
            norm_eps=norm_eps,
            norm_momentum=norm_momentum,
            se_ratio=se_ratio,
            activation=activation,
            inner_act=inner_act,
            **extra,
        ),
        activation=make_act(activation),
    )


def create_x3d_res_stage(
    *,
    depth: int,
    dim_in: int,
    dim_inner: int,
    dim_out: int,
    bottleneck: Callable = create_x3d_bottleneck_block,
    conv_kernel_size: Tuple[int, int, int] = (3, 3, 3),
    conv_stride: Tuple[int, int, int] = (1, 2, 2),
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    se_ratio: float = 0.0625,
    activation: Optional[Callable] = nn.relu,
    inner_act: Optional[Callable] = swish,
    batch_pack: int = 0,
    batch_unpack_output: bool = False,
) -> ResStage:
    """SE on every other block ((idx+1) % 2), reference x3d.py:397-402.
    ``batch_unpack_output`` marks the packed segment's exit: the stage
    unpacks the batch minor after its last block (layers/batchpack.py)."""
    blocks = []
    for idx in range(depth):
        blocks.append(
            create_x3d_res_block(
                dim_in=dim_in if idx == 0 else dim_out,
                dim_inner=dim_inner,
                dim_out=dim_out,
                bottleneck=bottleneck,
                conv_kernel_size=conv_kernel_size,
                conv_stride=conv_stride if idx == 0 else (1, 1, 1),
                norm=norm,
                norm_eps=norm_eps,
                norm_momentum=norm_momentum,
                se_ratio=(se_ratio if (idx + 1) % 2 else 0.0),
                activation=activation,
                inner_act=inner_act,
                batch_pack=batch_pack,
            )
        )
    if batch_pack > 1 and batch_unpack_output:
        from pytorchvideo_tpu.layers.batchpack import UnpackResStage

        return UnpackResStage(
            res_blocks=tuple(blocks), batch=batch_pack, channels=dim_out
        )
    return ResStage(res_blocks=blocks)


class ProjectedPool(nn.Module):
    """conv -> norm -> act -> pool -> conv -> norm -> act
    (reference x3d.py:742-806)."""

    pre_conv: Optional[nn.Module] = None
    pre_norm: Optional[nn.Module] = None
    pre_act: Optional[Callable] = None
    pool: Optional[Callable] = None
    post_conv: Optional[nn.Module] = None
    post_norm: Optional[nn.Module] = None
    post_act: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = self.pre_conv(x)
        x = apply_with_train(self.pre_norm, x, train)
        if self.pre_act is not None:
            x = self.pre_act(x)
        x = self.pool(x)
        x = self.post_conv(x)
        x = apply_with_train(self.post_norm, x, train)
        if self.post_act is not None:
            x = self.post_act(x)
        return x


class _HeadPoolBlock(nn.Module):
    """Adapter: ProjectedPool as the `pool` slot of ResNetBasicHead needs a
    train flag; ResNetBasicHead calls pool(x) only, so wrap at build time."""

    inner: nn.Module

    @nn.compact
    def __call__(self, x, train: bool = False):
        return self.inner(x, train=train)


def create_x3d_head(
    *,
    dim_in: int,
    dim_inner: int,
    dim_out: int,
    num_classes: int,
    pool_act: Optional[Callable] = nn.relu,
    pool_kernel_size: Optional[Tuple[int, int, int]] = (13, 5, 5),
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    bn_lin5_on: bool = False,
    dropout_rate: float = 0.5,
    activation: Optional[Callable] = None,
    output_with_global_average: bool = True,
) -> "X3DHead":
    """Reference x3d.py:411-536."""
    from pytorchvideo_tpu.layers.common import (
        adaptive_avg_pool3d_to_1,
        avg_pool3d,
    )

    if pool_kernel_size is None:
        pool_fn = adaptive_avg_pool3d_to_1
    else:
        pool_fn = lambda x: avg_pool3d(x, pool_kernel_size, (1, 1, 1))  # noqa: E731

    projected_pool = ProjectedPool(
        pre_conv=Conv3d(
            in_channels=dim_in,
            out_channels=dim_inner,
            kernel_size=(1, 1, 1),
            bias=False,
        ),
        pre_norm=make_norm(norm, dim_inner, norm_eps, norm_momentum),
        pre_act=make_act(pool_act),
        pool=pool_fn,
        post_conv=Conv3d(
            in_channels=dim_inner,
            out_channels=dim_out,
            kernel_size=(1, 1, 1),
            bias=False,
        ),
        post_norm=(
            make_norm(norm, dim_out, norm_eps, norm_momentum) if bn_lin5_on else None
        ),
        post_act=make_act(pool_act),
    )
    if activation is None:
        act = None
    elif activation in ("softmax", jax.nn.softmax):
        act = jax.nn.softmax
    elif activation in ("sigmoid", jax.nn.sigmoid, nn.sigmoid):
        act = jax.nn.sigmoid
    else:
        act = make_act(activation)

    return X3DHead(
        projected_pool=projected_pool,
        proj=nn.Dense(num_classes, use_bias=True),
        dropout_rate=dropout_rate,
        activation=act,
        output_with_global_average=output_with_global_average,
    )


class X3DHead(nn.Module):
    """ProjectedPool -> dropout -> proj -> act -> global average.

    Separate from ResNetBasicHead because the pool slot is itself a
    parameterized module here (reference passes ProjectedPool into
    ResNetBasicHead; linen needs the module tracked as a field)."""

    projected_pool: ProjectedPool
    proj: nn.Module
    dropout_rate: float = 0.0
    activation: Optional[Callable] = None
    output_with_global_average: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pytorchvideo_tpu.layers.common import adaptive_avg_pool3d_to_1

        x = self.projected_pool(x, train=train)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = self.proj(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.output_with_global_average:
            x = adaptive_avg_pool3d_to_1(x)
            x = x.reshape(x.shape[0], -1)
        return x


def create_x3d(
    *,
    input_channel: int = 3,
    input_clip_length: int = 13,
    input_crop_size: int = 160,
    model_num_class: int = 400,
    dropout_rate: float = 0.5,
    width_factor: float = 2.0,
    depth_factor: float = 2.2,
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
    stem_dim_in: int = 12,
    stem_conv_kernel_size: Tuple[int, int, int] = (5, 3, 3),
    stem_conv_stride: Tuple[int, int, int] = (1, 2, 2),
    stage_conv_kernel_size: Tuple = (
        (3, 3, 3),
        (3, 3, 3),
        (3, 3, 3),
        (3, 3, 3),
    ),
    stage_spatial_stride: Tuple[int, ...] = (2, 2, 2, 2),
    stage_temporal_stride: Tuple[int, ...] = (1, 1, 1, 1),
    bottleneck: Callable = create_x3d_bottleneck_block,
    bottleneck_factor: float = 2.25,
    se_ratio: float = 0.0625,
    inner_act: Optional[Callable] = swish,
    head_dim_out: int = 2048,
    head_pool_act: Optional[Callable] = nn.relu,
    head_bn_lin5_on: bool = False,
    head_activation: Optional[Callable] = None,
    head_output_with_global_average: bool = True,
    batch_pack: Optional[int] = None,
) -> Net:
    """Builder (reference x3d.py:539-738). Variants:
    XS=4x160, S=13x160, M=16x224, L=16x312+depth_factor 5.0.

    ``batch_pack=b`` runs the stem + stages 1-2 in the exact batch-packed
    layout (layers/batchpack.py): the tiny-channel segment (C<=108, where
    the 128-lane tile is under-filled) folds b batch elements into the
    lanes, cutting depthwise-conv VPU work and elementwise HBM traffic by
    the lane-fill factor; stage 2 unpacks on exit (C>=216 is already
    lane-full). Identical parameter tree; falls back to the plain path at
    trace time when the runtime batch does not divide by b. ``None`` reads
    the PVT_X3D_BPACK env var (0 disables); requires the default
    BatchNorm-family ``norm`` and a ``bottleneck`` accepting
    ``batch_pack`` when enabled.

    Measured on v5e: a 3x whole-model NET LOSS (3662 plain vs 1236 bpack2
    clips/s, B128 bf16) — the packed pointwise convs lose more than the
    depthwise wins; see layers/batchpack.py for the full A/B + per-op
    attribution. OFF by default; kept as an exact opt-in layout."""
    import os

    from pytorchvideo_tpu.layers.common import adaptive_avg_pool3d_to_1, avg_pool3d

    if batch_pack is None:
        batch_pack = int(os.environ.get("PVT_X3D_BPACK", "0"))
    bpack_entry = os.environ.get("PVT_X3D_BPACK_ENTRY", "input")
    if batch_pack > 1:
        import inspect

        try:
            accepts_pack = "batch_pack" in inspect.signature(bottleneck).parameters
        except (TypeError, ValueError):
            accepts_pack = False
        if not accepts_pack:
            raise ValueError(
                "create_x3d: batch_pack>1 (set via the batch_pack arg or the "
                "PVT_X3D_BPACK env var) requires a bottleneck callable that "
                f"accepts a batch_pack kwarg; got {bottleneck!r}. Unset "
                "PVT_X3D_BPACK or use create_x3d_bottleneck_block."
            )

    blocks = []
    stem_dim_out = round_width(stem_dim_in, width_factor)
    blocks.append(
        create_x3d_stem(
            in_channels=input_channel,
            out_channels=stem_dim_out,
            conv_kernel_size=stem_conv_kernel_size,
            conv_stride=stem_conv_stride,
            conv_padding=tuple(s // 2 for s in stem_conv_kernel_size),
            norm=norm,
            norm_eps=norm_eps,
            norm_momentum=norm_momentum,
            activation=activation,
            batch_pack=batch_pack,
            batch_pack_entry=bpack_entry,
        )
    )

    stage_depths = [1, 2, 5, 3]
    exp_stage = 2.0
    stage_dim1 = stem_dim_in
    stage_dim2 = round_width(stage_dim1, exp_stage, divisor=8)
    stage_dim3 = round_width(stage_dim2, exp_stage, divisor=8)
    stage_dim4 = round_width(stage_dim3, exp_stage, divisor=8)
    stage_dims = [stage_dim1, stage_dim2, stage_dim3, stage_dim4]

    dim_in = stem_dim_out
    n_packed_stages = 2  # stem..stage2: the under-128-lane channel segment
    for idx in range(len(stage_depths)):
        dim_out = round_width(stage_dims[idx], width_factor)
        dim_inner = int(bottleneck_factor * dim_out)
        stage_pack = batch_pack if idx < n_packed_stages else 0
        blocks.append(
            create_x3d_res_stage(
                depth=round_repeats(stage_depths[idx], depth_factor),
                dim_in=dim_in,
                dim_inner=dim_inner,
                dim_out=dim_out,
                bottleneck=bottleneck,
                conv_kernel_size=stage_conv_kernel_size[idx],
                conv_stride=(
                    stage_temporal_stride[idx],
                    stage_spatial_stride[idx],
                    stage_spatial_stride[idx],
                ),
                norm=norm,
                norm_eps=norm_eps,
                norm_momentum=norm_momentum,
                se_ratio=se_ratio,
                activation=activation,
                inner_act=inner_act,
                batch_pack=stage_pack,
                batch_unpack_output=(idx == n_packed_stages - 1),
            )
        )
        dim_in = dim_out

    total_spatial_stride = stem_conv_stride[1] * int(np.prod(stage_spatial_stride))
    total_temporal_stride = stem_conv_stride[0] * int(np.prod(stage_temporal_stride))
    assert input_clip_length >= total_temporal_stride
    assert input_crop_size >= total_spatial_stride
    head_pool_kernel_size = (
        input_clip_length // total_temporal_stride,
        int(math.ceil(input_crop_size / total_spatial_stride)),
        int(math.ceil(input_crop_size / total_spatial_stride)),
    )

    projected_pool = ProjectedPool(
        pre_conv=Conv3d(
            in_channels=dim_out,
            out_channels=dim_inner,
            kernel_size=(1, 1, 1),
            bias=False,
        ),
        pre_norm=make_norm(norm, dim_inner, norm_eps, norm_momentum),
        pre_act=make_act(head_pool_act),
        pool=lambda x: avg_pool3d(x, head_pool_kernel_size, (1, 1, 1)),
        post_conv=Conv3d(
            in_channels=dim_inner,
            out_channels=head_dim_out,
            kernel_size=(1, 1, 1),
            bias=False,
        ),
        post_norm=(
            make_norm(norm, head_dim_out, norm_eps, norm_momentum)
            if head_bn_lin5_on
            else None
        ),
        post_act=make_act(head_pool_act),
    )
    if head_activation is None:
        head_act = None
    elif head_activation in ("softmax", jax.nn.softmax):
        head_act = jax.nn.softmax
    else:
        head_act = make_act(head_activation)
    blocks.append(
        X3DHead(
            projected_pool=projected_pool,
            proj=nn.Dense(model_num_class, use_bias=True),
            dropout_rate=dropout_rate,
            activation=head_act,
            output_with_global_average=head_output_with_global_average,
        )
    )
    return Net(blocks=blocks)
