"""SlowFast networks (Feichtenhofer et al., 2019).

Parity: pytorchvideo/models/slowfast.py (create_slowfast :20-363,
PoolConcatPathway :586-620, FastToSlowFusionBuilder :623-696,
FuseFastToSlow :699-729). Channels-last; fusion concat is on the trailing
channel axis.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from pytorchvideo_tpu.layers.common import Conv3d, apply_with_train
from pytorchvideo_tpu.layers.norms import BatchNorm, make_act, make_norm
from pytorchvideo_tpu.layers.packed import packed_conv_factory, packed_norm
from pytorchvideo_tpu.layers.pooling import AdaptiveAvgPool3d, AvgPool3d, MaxPool3d
from pytorchvideo_tpu.models.head import create_res_basic_head
from pytorchvideo_tpu.models.net import MultiPathWayWithFuse, Net
from pytorchvideo_tpu.models.resnet import (
    _MODEL_STAGE_DEPTH,
    create_bottleneck_block,
    create_res_stage,
)
from pytorchvideo_tpu.models.stem import create_res_basic_stem


class FuseFastToSlow(nn.Module):
    """conv(fast) -> norm -> act -> concat onto slow; returns [slow', fast]
    (reference slowfast.py:699-729)."""

    conv_fast_to_slow: nn.Module
    norm: Optional[nn.Module] = None
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: List, train: bool = False):
        x_s, x_f = x[0], x[1]
        fuse = self.conv_fast_to_slow(x_f)
        fuse = apply_with_train(self.norm, fuse, train)
        if self.activation is not None:
            fuse = self.activation(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


class FastToSlowFusionBuilder:
    """Per-stage FuseFastToSlow factory (reference slowfast.py:623-696)."""

    def __init__(
        self,
        slowfast_channel_reduction_ratio: int,
        conv_fusion_channel_ratio: float,
        conv_kernel_size: Tuple[int, int, int],
        conv_stride: Tuple[int, int, int],
        norm: Optional[Callable] = BatchNorm,
        norm_eps: float = 1e-5,
        norm_momentum: float = 0.1,
        activation: Optional[Callable] = nn.relu,
        max_stage_idx: int = 3,
        conv: Callable = Conv3d,
        pack_caps: Optional[Sequence[int]] = None,
    ):
        self.slowfast_channel_reduction_ratio = slowfast_channel_reduction_ratio
        self.conv_fusion_channel_ratio = conv_fusion_channel_ratio
        self.conv_kernel_size = conv_kernel_size
        self.conv_stride = conv_stride
        self.norm = norm
        self.norm_eps = norm_eps
        self.norm_momentum = norm_momentum
        self.activation = activation
        self.max_stage_idx = max_stage_idx
        self.conv = conv
        self.pack_caps = pack_caps

    def create_module(self, fusion_dim_in: int, stage_idx: int):
        if stage_idx > self.max_stage_idx:
            return None
        conv_dim_in = fusion_dim_in // self.slowfast_channel_reduction_ratio
        conv_dim_out = int(conv_dim_in * self.conv_fusion_channel_ratio)
        conv = self.conv
        if self.pack_caps is not None:
            # Pack the fusion conv to the NEXT fast stage's cap so its
            # repack CSEs with that stage's; measured per-stage on v5e
            # (fastpath_micro.py stages, B64): packed wins through C=64
            # (0.17/2.1/1.6 ms vs 0.9/3.6/1.7 plain) but LOSES at C=128
            # (1.0 vs 0.35 — pointwise block conv inflates FLOPs p^2 x
            # against a GEMM that already fills the lanes), so wide
            # fusions drop to cap 1 (auto-unpack + plain conv).
            cap = (
                self.pack_caps[min(stage_idx, len(self.pack_caps) - 1)]
                if conv_dim_in < 128
                else 1
            )
            conv = packed_conv_factory(cap, unpack_output=True)
        return FuseFastToSlow(
            conv_fast_to_slow=conv(
                in_channels=conv_dim_in,
                out_channels=conv_dim_out,
                kernel_size=self.conv_kernel_size,
                stride=self.conv_stride,
                padding=tuple(k // 2 for k in self.conv_kernel_size),
                bias=False,
            ),
            norm=make_norm(self.norm, conv_dim_out, self.norm_eps, self.norm_momentum),
            activation=make_act(self.activation),
        )


class PoolConcatPathway(nn.Module):
    """Optional per-pathway pool, then channel concat
    (reference slowfast.py:586-620)."""

    retain_list: bool = False
    pool: Optional[Sequence[Optional[Callable]]] = None

    @nn.compact
    def __call__(self, x: List, train: bool = False):
        if self.pool is not None:
            assert len(x) == len(self.pool)
        output = []
        for i, pathway in enumerate(x):
            if pathway is not None:
                if self.pool is not None and self.pool[i] is not None:
                    pathway = self.pool[i](pathway)
                output.append(pathway)
        out = jnp.concatenate(output, axis=-1)
        return [out] if self.retain_list else out


def create_slowfast(
    *,
    slowfast_channel_reduction_ratio: Union[Tuple[int, ...], int] = (8,),
    slowfast_conv_channel_fusion_ratio: int = 2,
    slowfast_fusion_conv_kernel_size: Tuple[int, int, int] = (7, 1, 1),
    slowfast_fusion_conv_stride: Tuple[int, int, int] = (4, 1, 1),
    fusion_builder: Optional[Callable] = None,
    input_channels: Tuple[int, ...] = (3, 3),
    model_depth: int = 50,
    model_num_class: int = 400,
    dropout_rate: float = 0.5,
    norm: Optional[Callable] = BatchNorm,
    activation: Optional[Callable] = nn.relu,
    stem_function: Tuple[Callable, ...] = (
        create_res_basic_stem,
        create_res_basic_stem,
    ),
    stem_dim_outs: Tuple[int, ...] = (64, 8),
    stem_conv_kernel_sizes: Tuple = ((1, 7, 7), (5, 7, 7)),
    stem_conv_strides: Tuple = ((1, 2, 2), (1, 2, 2)),
    stem_pool: Union[Callable, Tuple] = (MaxPool3d, MaxPool3d),
    stem_pool_kernel_sizes: Tuple = ((1, 3, 3), (1, 3, 3)),
    stem_pool_strides: Tuple = ((1, 2, 2), (1, 2, 2)),
    stage_conv_a_kernel_sizes: Tuple = (
        ((1, 1, 1), (1, 1, 1), (3, 1, 1), (3, 1, 1)),
        ((3, 1, 1), (3, 1, 1), (3, 1, 1), (3, 1, 1)),
    ),
    stage_conv_b_kernel_sizes: Tuple = (
        ((1, 3, 3), (1, 3, 3), (1, 3, 3), (1, 3, 3)),
        ((1, 3, 3), (1, 3, 3), (1, 3, 3), (1, 3, 3)),
    ),
    stage_conv_b_num_groups: Tuple = ((1, 1, 1, 1), (1, 1, 1, 1)),
    stage_conv_b_dilations: Tuple = (
        ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        ((1, 1, 1), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
    ),
    stage_spatial_strides: Tuple = ((1, 2, 2, 2), (1, 2, 2, 2)),
    stage_temporal_strides: Tuple = ((1, 1, 1, 1), (1, 1, 1, 1)),
    bottleneck: Union[Callable, Tuple] = create_bottleneck_block,
    head: Optional[Callable] = create_res_basic_head,
    head_pool: Optional[Callable] = AvgPool3d,
    head_pool_kernel_sizes: Tuple = ((8, 7, 7), (32, 7, 7)),
    head_output_size: Tuple[int, int, int] = (1, 1, 1),
    head_activation: Optional[Callable] = None,
    head_output_with_global_average: bool = True,
    stage_depths: Optional[Tuple[int, ...]] = None,
    pathway_packs: Optional[Sequence] = None,
    packed_stages: Optional[int] = None,
) -> Net:
    """Builder (reference slowfast.py:20-363). `stage_depths` overrides the
    depth table (extension; e.g. (1, 1, 1, 1) for tiny configs).

    TPU extension — packed-channel pathways: ``pathway_packs[p]`` is a pack
    CAP (int, uniform) or a per-stage sequence of caps; a cap >= 2 runs
    that pathway's res stages in a space-to-depth packed layout
    (layers/packed.py) so tiny channel ladders fill the 128-lane tile —
    exact, identical param tree, with automatic per-conv pack adaptation
    (4->2 at stride boundaries, repack between stages with different caps,
    plain fallback on indivisible dims). Measured per-stage optimum for
    SlowFast-R50 @224 on v5e (benchmarks/fastpath_micro.py stages): res2
    cap 4 (12.9 -> 6.6 ms), res3/res4 cap 2 (pack-4's dense-phase FLOP
    inflation overtakes the lane gain once C >= 32), i.e.
    ``pathway_packs=(1, (4, 2, 2, 2))``.
    """
    _num_pathway = len(input_channels)
    if stage_depths is None:
        assert model_depth in _MODEL_STAGE_DEPTH, f"{model_depth} unsupported"
        stage_depths = _MODEL_STAGE_DEPTH[model_depth]

    if isinstance(slowfast_channel_reduction_ratio, int):
        slowfast_channel_reduction_ratio = (slowfast_channel_reduction_ratio,)
    if callable(stem_pool):
        stem_pool = (stem_pool,) * _num_pathway
    if callable(bottleneck):
        bottleneck = ((bottleneck,) * len(stage_depths),) * _num_pathway

    n_packed = (
        packed_stages if packed_stages is not None else len(stage_depths)
    )

    def _stage_caps(v):
        """Per-stage pack caps from an int (uniform) or per-stage seq."""
        if isinstance(v, (tuple, list)):
            caps = [max(int(c or 1), 1) for c in v]
            caps += [caps[-1] if caps else 1] * (len(stage_depths) - len(caps))
        else:
            caps = [max(int(v or 1), 1)] * len(stage_depths)
        return [
            caps[i] if i < n_packed else 1 for i in range(len(stage_depths))
        ]

    packs_in = list(pathway_packs) if pathway_packs else []
    packs_in += [1] * (_num_pathway - len(packs_in))
    stage_caps = [_stage_caps(v) for v in packs_in]
    packs = [max(caps) for caps in stage_caps]  # any-packed flag per pathway

    if fusion_builder is None:
        fast_caps = stage_caps[1] if _num_pathway > 1 else [1]
        fusion_builder = FastToSlowFusionBuilder(
            slowfast_channel_reduction_ratio=slowfast_channel_reduction_ratio[0],
            conv_fusion_channel_ratio=slowfast_conv_channel_fusion_ratio,
            conv_kernel_size=slowfast_fusion_conv_kernel_size,
            conv_stride=slowfast_fusion_conv_stride,
            norm=norm,
            activation=activation,
            max_stage_idx=len(stage_depths) - 1,
            pack_caps=fast_caps if max(fast_caps) > 1 else None,
        ).create_module

    stems = []
    for p in range(_num_pathway):
        stems.append(
            stem_function[p](
                in_channels=input_channels[p],
                out_channels=stem_dim_outs[p],
                conv_kernel_size=stem_conv_kernel_sizes[p],
                conv_stride=stem_conv_strides[p],
                conv_padding=tuple(s // 2 for s in stem_conv_kernel_sizes[p]),
                pool=stem_pool[p],
                pool_kernel_size=stem_pool_kernel_sizes[p],
                pool_stride=stem_pool_strides[p],
                pool_padding=tuple(s // 2 for s in stem_pool_kernel_sizes[p]),
                norm=norm,
                activation=activation,
            )
        )

    stages = [
        MultiPathWayWithFuse(
            multipathway_blocks=stems,
            multipathway_fusion=fusion_builder(
                fusion_dim_in=stem_dim_outs[0], stage_idx=0
            ),
        )
    ]

    stage_dim_in = stem_dim_outs[0]
    stage_dim_out = stage_dim_in * 4
    for idx in range(len(stage_depths)):
        pathway_dim_in = [
            stage_dim_in
            + stage_dim_in
            * slowfast_conv_channel_fusion_ratio
            // slowfast_channel_reduction_ratio[0]
        ]
        pathway_dim_inner = [stage_dim_out // 4]
        pathway_dim_out = [stage_dim_out]
        for rr in slowfast_channel_reduction_ratio:
            pathway_dim_in.append(stage_dim_in // rr)
            pathway_dim_inner.append(stage_dim_out // 4 // rr)
            pathway_dim_out.append(stage_dim_out // rr)

        stage = []
        for p in range(_num_pathway):
            conv_a_kernel = stage_conv_a_kernel_sizes[p][idx]
            conv_a_padding = (
                [s // 2 for s in conv_a_kernel]
                if isinstance(conv_a_kernel[0], int)
                else [[s // 2 for s in sizes] for sizes in conv_a_kernel]
            )
            cap_pi = stage_caps[p][idx]
            prev_cap = stage_caps[p][idx - 1] if idx > 0 else 1
            if cap_pi > 1:
                conv_f = packed_conv_factory(cap_pi)
                norm_f = packed_norm(norm)
            elif prev_cap > 1:
                # first unpacked stage: block 0 d2s-unpacks the packed input
                conv_f = packed_conv_factory(prev_cap, unpack_input=True)
                norm_f = norm
            else:
                conv_f, norm_f = Conv3d, norm
            stage.append(
                create_res_stage(
                    depth=stage_depths[idx],
                    dim_in=pathway_dim_in[p],
                    dim_inner=pathway_dim_inner[p],
                    dim_out=pathway_dim_out[p],
                    bottleneck=bottleneck[p][idx],
                    conv_a_kernel_size=conv_a_kernel,
                    conv_a_stride=(stage_temporal_strides[p][idx], 1, 1),
                    conv_a_padding=conv_a_padding,
                    conv_b_kernel_size=stage_conv_b_kernel_sizes[p][idx],
                    conv_b_stride=(
                        1,
                        stage_spatial_strides[p][idx],
                        stage_spatial_strides[p][idx],
                    ),
                    conv_b_padding=(
                        stage_conv_b_kernel_sizes[p][idx][0] // 2,
                        stage_conv_b_dilations[p][idx][1]
                        if stage_conv_b_dilations[p][idx][1] > 1
                        else stage_conv_b_kernel_sizes[p][idx][1] // 2,
                        stage_conv_b_dilations[p][idx][2]
                        if stage_conv_b_dilations[p][idx][2] > 1
                        else stage_conv_b_kernel_sizes[p][idx][2] // 2,
                    ),
                    conv_b_num_groups=stage_conv_b_num_groups[p][idx],
                    conv_b_dilation=stage_conv_b_dilations[p][idx],
                    conv_a=conv_f,
                    conv_b=conv_f,
                    conv_c=conv_f,
                    conv_skip=conv_f,
                    norm=norm_f,
                    activation=activation,
                )
            )
        stages.append(
            MultiPathWayWithFuse(
                multipathway_blocks=stage,
                multipathway_fusion=fusion_builder(
                    fusion_dim_in=stage_dim_out, stage_idx=idx + 1
                ),
            )
        )
        stage_dim_in = stage_dim_out
        stage_dim_out = stage_dim_out * 2

    if head_pool is None:
        pool_model = None
    elif head_pool is AdaptiveAvgPool3d:
        pool_model = [head_pool(head_output_size) for _ in range(_num_pathway)]
    elif head_pool is AvgPool3d:
        pool_model = [
            head_pool(
                kernel_size=head_pool_kernel_sizes[i],
                stride=(1, 1, 1),
                padding=(0, 0, 0),
            )
            for i in range(_num_pathway)
        ]
    else:
        raise NotImplementedError(f"Unsupported head_pool {head_pool}")

    if pool_model is not None and any(v > 1 for v in packs):
        # a packed pathway's last stage may legally stay packed (e.g.
        # 256-crop: res5 emits 8x8); d2s-unpack right before the head pool
        from pytorchvideo_tpu.layers.packed import infer_pack, unpack_hw

        def _unpacking_pool(pool, channels):
            def f(x):
                q = infer_pack(x.shape[-1], channels)
                if q > 1:
                    x = unpack_hw(x, q, q)
                return pool(x)

            return f

        head_channels = [stage_dim_in] + [
            stage_dim_in // rr for rr in slowfast_channel_reduction_ratio
        ]
        pool_model = [
            _unpacking_pool(pool_model[i], head_channels[i])
            if packs[i] > 1
            else pool_model[i]
            for i in range(_num_pathway)
        ]

    stages.append(PoolConcatPathway(retain_list=False, pool=pool_model))
    head_in_features = stage_dim_in
    for rr in slowfast_channel_reduction_ratio:
        head_in_features = head_in_features + stage_dim_in // rr
    if head is not None:
        stages.append(
            head(
                in_features=head_in_features,
                out_features=model_num_class,
                pool=None,
                output_size=head_output_size,
                dropout_rate=dropout_rate,
                activation=head_activation,
                output_with_global_average=head_output_with_global_average,
            )
        )
    return Net(blocks=stages)
