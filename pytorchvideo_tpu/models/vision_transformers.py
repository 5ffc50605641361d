"""Multiscale Vision Transformers (MViT).

Parity: pytorchvideo/models/vision_transformers.py
(MultiscaleVisionTransformers :18-182, create_multiscale_vision_transformers
:185-506). The inference-time BN folding (`fuse_bn`, reference :96-170) is a
params transformation in pytorchvideo_tpu/accelerate/fuse.py (trace-time
folding is the TPU deploy analogue).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from pytorchvideo_tpu.layers.attention import MultiScaleBlock
from pytorchvideo_tpu.layers.norms import BatchNorm, LayerNorm
from pytorchvideo_tpu.layers.positional_encoding import (
    SpatioTemporalClsPositionalEncoding,
)
from pytorchvideo_tpu.layers.utils import round_width
from pytorchvideo_tpu.models.head import create_vit_basic_head
from pytorchvideo_tpu.models.stem import create_conv_patch_embed


class MultiscaleVisionTransformers(nn.Module):
    """patch_embed -> cls/pos enc -> blocks (thw threaded) -> norm -> head."""

    patch_embed: Optional[nn.Module]
    cls_positional_encoding: nn.Module
    blocks: Sequence[nn.Module]
    norm_embed: Optional[nn.Module] = None
    head: Optional[nn.Module] = None
    pos_dropout_rate: float = 0.0
    patch_embed_shape: Tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.patch_embed is not None:
            x = self.patch_embed(x)
        x = self.cls_positional_encoding(x)
        if self.pos_dropout_rate > 0.0:
            x = nn.Dropout(self.pos_dropout_rate, deterministic=not train)(x)

        # Thread the cls token separately from the token grid through the
        # whole block stack: one split here, one concat at the end, instead
        # of per-block / per-pool slice+concat copies over the long token
        # axis (the blocks accept either form; see MultiScaleBlock).
        has_cls = getattr(self.cls_positional_encoding, "has_cls", False)
        x = (x[:, :1], x[:, 1:]) if has_cls else (None, x)

        thw = tuple(self.patch_embed_shape)
        for blk in self.blocks:
            x, thw = blk(x, thw, train=train)
        cls_x, grid_x = x
        x = (
            grid_x
            if cls_x is None
            else jnp.concatenate([cls_x, grid_x], axis=1)
        )
        if self.norm_embed is not None:
            x = self.norm_embed(x, train=train)
        if self.head is not None:
            x = self.head(x, train=train)
        return x


def create_multiscale_vision_transformers(
    *,
    spatial_size: Union[int, Tuple[int, int]],
    temporal_size: int,
    cls_embed_on: bool = True,
    sep_pos_embed: bool = True,
    depth: int = 16,
    norm: str = "layernorm",
    enable_patch_embed: bool = True,
    input_channels: int = 3,
    patch_embed_dim: int = 96,
    conv_patch_embed_kernel: Tuple[int, int, int] = (3, 7, 7),
    conv_patch_embed_stride: Tuple[int, int, int] = (2, 4, 4),
    conv_patch_embed_padding: Tuple[int, int, int] = (1, 3, 3),
    enable_patch_embed_norm: bool = False,
    use_2d_patch: bool = False,
    num_heads: int = 1,
    mlp_ratio: float = 4.0,
    qkv_bias: bool = True,
    dropout_rate_block: float = 0.0,
    droppath_rate_block: float = 0.0,
    pooling_mode: str = "conv",
    pool_first: bool = False,
    residual_pool: bool = False,
    depthwise_conv: bool = True,
    bias_on: bool = True,
    separate_qkv: bool = True,
    embed_dim_mul: Optional[List[List[int]]] = None,
    atten_head_mul: Optional[List[List[int]]] = None,
    dim_mul_in_att: bool = False,
    pool_q_stride_size: Optional[List[List[int]]] = None,
    pool_kv_stride_size: Optional[List[List[int]]] = None,
    pool_kv_stride_adaptive: Optional[Tuple[int, int, int]] = None,
    pool_kvq_kernel: Optional[Tuple[int, int, int]] = None,
    head: Optional[Callable] = create_vit_basic_head,
    head_dropout_rate: float = 0.5,
    head_activation: Optional[Callable] = None,
    head_num_classes: int = 400,
) -> MultiscaleVisionTransformers:
    """Builder (reference vision_transformers.py:185-506). MViT-B config in
    the reference docstring :304-323 and hub/vision_transformers.py:21-29.
    ViT is the single-scale special case.
    """
    if use_2d_patch:
        assert temporal_size == 1, "use_2d_patch requires temporal_size == 1"
    if pool_kv_stride_adaptive is not None:
        assert pool_kv_stride_size is None

    if norm == "layernorm":
        norm_layer = partial(LayerNorm, epsilon=1e-6)
        block_norm_layer = partial(LayerNorm, epsilon=1e-6)
        attn_norm_layer = partial(LayerNorm, epsilon=1e-6)
    elif norm == "batchnorm":
        norm_layer = None
        block_norm_layer = BatchNorm
        attn_norm_layer = BatchNorm
    else:
        raise NotImplementedError("Only layernorm/batchnorm supported.")

    if isinstance(spatial_size, int):
        spatial_size = (spatial_size, spatial_size)

    patch_embed = (
        create_conv_patch_embed(
            in_channels=input_channels,
            out_channels=patch_embed_dim,
            conv_kernel_size=(
                (1,) + tuple(conv_patch_embed_kernel)
                if use_2d_patch
                else conv_patch_embed_kernel
            ),
            conv_stride=(
                (1,) + tuple(conv_patch_embed_stride)
                if use_2d_patch
                else conv_patch_embed_stride
            ),
            conv_padding=(
                (0,) + tuple(conv_patch_embed_padding)
                if use_2d_patch
                else conv_patch_embed_padding
            ),
        )
        if enable_patch_embed
        else None
    )

    input_dims = [temporal_size, spatial_size[0], spatial_size[1]]
    input_stride = (
        (1,) + tuple(conv_patch_embed_stride)
        if use_2d_patch
        else conv_patch_embed_stride
    )
    patch_embed_shape = (
        tuple(input_dims[i] // input_stride[i] for i in range(3))
        if enable_patch_embed
        else tuple(input_dims)
    )

    cls_positional_encoding = SpatioTemporalClsPositionalEncoding(
        embed_dim=patch_embed_dim,
        patch_embed_shape=patch_embed_shape,
        sep_pos_embed=sep_pos_embed,
        has_cls=cls_embed_on,
    )

    dpr = list(np.linspace(0, droppath_rate_block, depth))

    dim_mul = np.ones(depth + 1)
    head_mul = np.ones(depth + 1)
    if embed_dim_mul is not None:
        for i in range(len(embed_dim_mul)):
            dim_mul[embed_dim_mul[i][0]] = embed_dim_mul[i][1]
    if atten_head_mul is not None:
        for i in range(len(atten_head_mul)):
            head_mul[atten_head_mul[i][0]] = atten_head_mul[i][1]

    pool_q: List = [[] for _ in range(depth)]
    pool_kv: List = [[] for _ in range(depth)]
    stride_q: List = [[] for _ in range(depth)]
    stride_kv: List = [[] for _ in range(depth)]

    if pool_q_stride_size is not None:
        for i in range(len(pool_q_stride_size)):
            stride_q[pool_q_stride_size[i][0]] = pool_q_stride_size[i][1:]
            if pool_kvq_kernel is not None:
                pool_q[pool_q_stride_size[i][0]] = pool_kvq_kernel
            else:
                pool_q[pool_q_stride_size[i][0]] = [
                    s + 1 if s > 1 else s for s in pool_q_stride_size[i][1:]
                ]

    if pool_kv_stride_adaptive is not None:
        _stride_kv = list(pool_kv_stride_adaptive)
        pool_kv_stride_size = []
        for i in range(depth):
            if len(stride_q[i]) > 0:
                _stride_kv = [
                    max(_stride_kv[d] // stride_q[i][d], 1)
                    for d in range(len(_stride_kv))
                ]
            pool_kv_stride_size.append([i] + list(_stride_kv))

    if pool_kv_stride_size is not None:
        for i in range(len(pool_kv_stride_size)):
            stride_kv[pool_kv_stride_size[i][0]] = pool_kv_stride_size[i][1:]
            if pool_kvq_kernel is not None:
                pool_kv[pool_kv_stride_size[i][0]] = pool_kvq_kernel
            else:
                pool_kv[pool_kv_stride_size[i][0]] = [
                    s + 1 if s > 1 else s for s in pool_kv_stride_size[i][1:]
                ]

    def _or_ones(v):
        return tuple(v) if len(v) > 0 else (1, 1, 1)

    mvit_blocks = []
    dim_in = patch_embed_dim
    for i in range(depth):
        num_heads = round_width(num_heads, head_mul[i], min_width=1, divisor=1)
        if dim_mul_in_att:
            dim_out = round_width(
                dim_in, dim_mul[i], divisor=round_width(num_heads, head_mul[i])
            )
        else:
            dim_out = round_width(
                dim_in,
                dim_mul[i + 1],
                divisor=round_width(num_heads, head_mul[i + 1]),
            )
        mvit_blocks.append(
            MultiScaleBlock(
                dim=dim_in,
                dim_out=dim_out,
                num_heads=num_heads,
                mlp_ratio=mlp_ratio,
                qkv_bias=qkv_bias,
                dropout_rate=dropout_rate_block,
                droppath_rate=float(dpr[i]),
                norm_layer=block_norm_layer,
                attn_norm_layer=attn_norm_layer,
                dim_mul_in_att=dim_mul_in_att,
                kernel_q=_or_ones(pool_q[i]),
                kernel_kv=_or_ones(pool_kv[i]),
                stride_q=_or_ones(stride_q[i]),
                stride_kv=_or_ones(stride_kv[i]),
                pool_mode=pooling_mode,
                has_cls_embed=cls_embed_on,
                pool_first=pool_first,
                residual_pool=residual_pool,
                bias_on=bias_on,
                depthwise_conv=depthwise_conv,
                separate_qkv=separate_qkv,
            )
        )
        dim_in = dim_out

    norm_embed = None if norm_layer is None else norm_layer()
    head_model = (
        head(
            in_features=dim_in,
            out_features=head_num_classes,
            seq_pool_type="cls" if cls_embed_on else "mean",
            dropout_rate=head_dropout_rate,
            activation=head_activation,
        )
        if head is not None
        else None
    )
    return MultiscaleVisionTransformers(
        patch_embed=patch_embed,
        cls_positional_encoding=cls_positional_encoding,
        blocks=mvit_blocks,
        norm_embed=norm_embed,
        head=head_model,
        pos_dropout_rate=dropout_rate_block,
        patch_embed_shape=patch_embed_shape,
    )
