"""Model heads: ResNet basic, ViT basic, sequence pool. (RoI head lives in
models/detection.py once the roi_align op lands.)

Parity: pytorchvideo/models/head.py (SequencePool :11-36,
create_res_basic_head :39-131, create_vit_basic_head :134-200,
ResNetBasicHead :330-391, VisionTransformerBasicHead :485-535).

Channels-last note: the reference's ResNetBasicHead permutes to apply Linear
over channels (head.py:380-382); our layout is already channels-last, so the
projection is a plain Dense — one less transpose on TPU.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pytorchvideo_tpu.layers.common import adaptive_avg_pool3d_to_1
from pytorchvideo_tpu.layers.norms import make_act
from pytorchvideo_tpu.layers.pooling import AdaptiveAvgPool3d, AvgPool3d


class SequencePool(nn.Module):
    """cls / mean pooling over the token axis (reference head.py:11-36)."""

    mode: str

    @nn.compact
    def __call__(self, x):
        assert self.mode in ("cls", "mean")
        if self.mode == "cls":
            return x[:, 0]
        return jnp.mean(x, axis=1)


class ResNetBasicHead(nn.Module):
    """pool -> dropout -> proj -> activation -> global average."""

    proj: nn.Module
    pool: Optional[Callable] = None
    dropout_rate: float = 0.0
    activation: Optional[Callable] = None
    output_pool: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.pool is not None:
            x = self.pool(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = self.proj(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.output_pool is not None:
            x = self.output_pool(x)
            x = x.reshape(x.shape[0], -1)
        return x


def create_res_basic_head(
    *,
    in_features: int,
    out_features: int,
    pool: Optional[Callable] = AvgPool3d,
    output_size: Tuple[int, int, int] = (1, 1, 1),
    pool_kernel_size: Tuple[int, int, int] = (1, 7, 7),
    pool_stride: Tuple[int, int, int] = (1, 1, 1),
    pool_padding: Tuple[int, int, int] = (0, 0, 0),
    dropout_rate: float = 0.5,
    activation: Optional[Callable] = None,
    output_with_global_average: bool = True,
) -> ResNetBasicHead:
    """Builder (reference head.py:39-131)."""
    if pool is None:
        pool_model = None
    elif pool is AdaptiveAvgPool3d:
        pool_model = pool(output_size)
    else:
        pool_model = pool(
            kernel_size=pool_kernel_size, stride=pool_stride, padding=pool_padding
        )
    return ResNetBasicHead(
        proj=nn.Dense(out_features),
        pool=pool_model,
        dropout_rate=dropout_rate,
        activation=make_act(activation),
        output_pool=adaptive_avg_pool3d_to_1 if output_with_global_average else None,
    )


class VisionTransformerBasicHead(nn.Module):
    """sequence pool -> dropout -> proj -> activation (reference head.py:485-535)."""

    proj: nn.Module
    sequence_pool: Optional[nn.Module] = None
    dropout_rate: float = 0.0
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.sequence_pool is not None:
            x = self.sequence_pool(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = self.proj(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def create_vit_basic_head(
    *,
    in_features: int,
    out_features: int,
    seq_pool_type: str = "cls",
    dropout_rate: float = 0.5,
    activation: Optional[Callable] = None,
) -> VisionTransformerBasicHead:
    """Builder (reference head.py:134-200)."""
    assert seq_pool_type in ("cls", "mean", "none")
    seq_pool_model = (
        SequencePool(seq_pool_type) if seq_pool_type in ("cls", "mean") else None
    )
    return VisionTransformerBasicHead(
        proj=nn.Dense(out_features),
        sequence_pool=seq_pool_model,
        dropout_rate=dropout_rate,
        activation=make_act(activation),
    )
