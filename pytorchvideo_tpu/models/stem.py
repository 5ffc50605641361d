"""Stems: basic conv stem, acoustic stem, patch embedding.

Parity: pytorchvideo/models/stem.py (create_res_basic_stem :11-107, acoustic
stem :110-212, ResNetBasicStem :215-260, PatchEmbed :263-292,
create_conv_patch_embed :295-338). Channels-last (B, T, H, W, C).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn

from pytorchvideo_tpu.layers.common import (
    Conv3d,
    WBlockedConv,
    apply_with_train,
    pad_pairs,
    triple,
)
from pytorchvideo_tpu.layers.convolutions import ConvReduce3D
from pytorchvideo_tpu.layers.norms import BatchNorm, make_act, make_norm
from pytorchvideo_tpu.layers.pooling import MaxPool3d


class ResNetBasicStem(nn.Module):
    """conv -> norm -> activation -> pool (reference stem.py:215-260)."""

    conv: Optional[nn.Module] = None
    norm: Optional[nn.Module] = None
    activation: Optional[Callable] = None
    pool: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.conv is not None
        x = apply_with_train(self.conv, x, train)
        x = apply_with_train(self.norm, x, train)
        if self.activation is not None:
            x = self.activation(x)
        if self.pool is not None:
            x = self.pool(x)
        return x


def create_res_basic_stem(
    *,
    in_channels: int = 3,
    out_channels: int = 64,
    conv_kernel_size: Tuple[int, int, int] = (3, 7, 7),
    conv_stride: Tuple[int, int, int] = (1, 2, 2),
    conv_padding: Tuple[int, int, int] = (1, 3, 3),
    conv_bias: bool = False,
    conv: Callable = Conv3d,
    pool: Optional[Callable] = MaxPool3d,
    pool_kernel_size: Tuple[int, int, int] = (1, 3, 3),
    pool_stride: Tuple[int, int, int] = (1, 2, 2),
    pool_padding: Tuple[int, int, int] = (0, 1, 1),
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
) -> ResNetBasicStem:
    """Basic video stem builder (reference stem.py:11-107).

    Like :func:`create_conv_patch_embed`, the default tiny-C_in strided
    stem conv is built layout-blocked (identical param tree, exact math):
    XLA:TPU pads the 3-channel minor dim to the 128-lane tile, so the
    plain conv runs ~10x off the MXU roofline and its operand relayout
    rewrites the full input tensor. When the stem also has FEW OUTPUT
    channels the implicit GEMM is N-lane-bound too; the W-output-blocked
    :class:`~pytorchvideo_tpu.layers.packed.WPackedConv3d` packs
    ``128 // out_channels`` output columns into the lanes — measured on
    v5e B64 bf16 (benchmarks/fastpath_micro.py wstem): SlowFast fast stem
    conv 26.4 -> 19.7 ms, slow stem 4.3 -> 2.7 ms; falls back to
    :class:`WBlockedConv` (input-side stride blocking only) for wide
    stems like the MViT patch embed.
    """
    import os as _os

    if (
        conv is Conv3d
        and in_channels * triple(conv_stride)[2] <= 32
        and triple(conv_stride)[2] > 1
        and 128 // out_channels >= 2
        and all(p0 == p1 for p0, p1 in pad_pairs(conv_padding))
        and _os.environ.get("PVT_WSTEM", "0") == "1"
    ):
        from pytorchvideo_tpu.layers.packed import WPackedConv3d

        kw_, sw_ = triple(conv_kernel_size)[2], triple(conv_stride)[2]
        conv_module = WPackedConv3d(
            features=out_channels,
            kernel_size=triple(conv_kernel_size),
            out_block=0,  # auto: fill 128 lanes
            in_block=2 if kw_ > 3 and (128 // out_channels * sw_) % 2 == 0
            else 1,
            strides=triple(conv_stride),
            padding=triple(conv_padding),
            use_bias=conv_bias,
        )
    elif (
        conv is Conv3d
        and in_channels * triple(conv_stride)[2] <= 32
        and triple(conv_stride)[2] > 1
    ):
        conv_module = WBlockedConv(
            features=out_channels,
            kernel_size=triple(conv_kernel_size),
            strides=triple(conv_stride),
            padding=pad_pairs(conv_padding),
            use_bias=conv_bias,
        )
    else:
        conv_module = conv(
            in_channels=in_channels,
            out_channels=out_channels,
            kernel_size=conv_kernel_size,
            stride=conv_stride,
            padding=conv_padding,
            bias=conv_bias,
        )
    pool_module = (
        None
        if pool is None
        else pool(
            kernel_size=pool_kernel_size, stride=pool_stride, padding=pool_padding
        )
    )
    return ResNetBasicStem(
        conv=conv_module,
        norm=make_norm(norm, out_channels, norm_eps, norm_momentum),
        activation=make_act(activation),
        pool=pool_module,
    )


def create_acoustic_res_basic_stem(
    *,
    in_channels: int = 3,
    out_channels: int = 64,
    conv_kernel_size: Tuple[int, int, int] = (3, 7, 7),
    conv_stride: Tuple[int, int, int] = (1, 1, 1),
    conv_padding: Tuple[int, int, int] = (1, 3, 3),
    conv_bias: bool = False,
    pool: Optional[Callable] = MaxPool3d,
    pool_kernel_size: Tuple[int, int, int] = (1, 3, 3),
    pool_stride: Tuple[int, int, int] = (1, 2, 2),
    pool_padding: Tuple[int, int, int] = (0, 1, 1),
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
) -> ResNetBasicStem:
    """Acoustic stem: parallel temporal (kT,1,1) + spatial (1,kH,kW) convs
    summed via ConvReduce3D (reference stem.py:110-212)."""
    kt, kh, kw = conv_kernel_size
    pt, ph, pw = conv_padding
    conv_module = ConvReduce3D(
        out_channels=out_channels,
        kernel_size=((kt, 1, 1), (1, kh, kw)),
        stride=(conv_stride, conv_stride),
        padding=((pt, 0, 0), (0, ph, pw)),
        bias=(conv_bias, conv_bias),
        reduction_method="sum",
    )
    pool_module = (
        None
        if pool is None
        else pool(
            kernel_size=pool_kernel_size, stride=pool_stride, padding=pool_padding
        )
    )
    return ResNetBasicStem(
        conv=conv_module,
        norm=make_norm(norm, out_channels, norm_eps, norm_momentum),
        activation=make_act(activation),
        pool=pool_module,
    )


class PatchEmbed(nn.Module):
    """Conv patch embedding: conv -> flatten to (B, L, C)
    (reference stem.py:263-292; channels-last means our flatten order
    (T, H, W) matches torch's flatten(2).transpose)."""

    patch_model: Optional[nn.Module] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.patch_model is not None
        x = self.patch_model(x)
        B = x.shape[0]
        return x.reshape(B, -1, x.shape[-1])


def create_conv_patch_embed(
    *,
    in_channels: int,
    out_channels: int,
    conv_kernel_size: Tuple[int, int, int] = (1, 16, 16),
    conv_stride: Tuple[int, int, int] = (1, 4, 4),
    conv_padding: Tuple[int, int, int] = (1, 7, 7),
    conv_bias: bool = True,
    conv: Callable = Conv3d,
) -> PatchEmbed:
    """Conv patch-embed builder (reference stem.py:295-338).

    When the caller passes the default ``conv`` and the stem is a tiny-C_in
    strided conv, the stride-blocked :class:`WBlockedConv` (identical param
    tree, exact math) replaces ``nn.Conv`` — XLA:TPU runs the plain conv at
    ~11 TF/s on such shapes; blocking W by the stride is ~1.5x faster.
    """
    if (
        conv is Conv3d
        and in_channels * triple(conv_stride)[2] <= 32
        and triple(conv_stride)[2] > 1
    ):
        conv_module = WBlockedConv(
            features=out_channels,
            kernel_size=triple(conv_kernel_size),
            strides=triple(conv_stride),
            padding=pad_pairs(conv_padding),
            use_bias=conv_bias,
        )
    else:
        conv_module = conv(
            in_channels=in_channels,
            out_channels=out_channels,
            kernel_size=conv_kernel_size,
            stride=conv_stride,
            padding=conv_padding,
            bias=conv_bias,
        )
    return PatchEmbed(patch_model=conv_module)
