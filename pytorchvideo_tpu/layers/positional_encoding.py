"""Positional encodings (sinusoidal + MViT cls/spatiotemporal learned).

Parity: pytorchvideo/layers/positional_encoding.py (PositionalEncoding :11-44,
SpatioTemporalClsPositionalEncoding :47-136, sincos builders :139-244).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _sinusoidal_table(seq_len: int, embed_dim: int) -> np.ndarray:
    position = np.arange(seq_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, embed_dim, 2, dtype=np.float32)
        * (-math.log(10000.0) / embed_dim)
    )
    pe = np.zeros((seq_len, embed_dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    """Fixed sinusoidal encoding added to (B, L, C) sequences."""

    embed_dim: int
    seq_len: int = 1024

    @nn.compact
    def __call__(self, x):
        assert self.seq_len >= x.shape[1], (self.seq_len, x.shape)
        pe = jnp.asarray(_sinusoidal_table(self.seq_len, self.embed_dim))
        return x + pe[None, : x.shape[1], :]


class SpatioTemporalClsPositionalEncoding(nn.Module):
    """Prepend cls token, add joint or separable learned pos-embeddings.

    ``sep_pos_embed`` combines ``spatial tiled over T + temporal repeated over
    HW`` (reference positional_encoding.py:122-132).
    """

    embed_dim: int
    patch_embed_shape: Tuple[int, int, int]
    sep_pos_embed: bool = False
    has_cls: bool = True

    @nn.compact
    def __call__(self, x):
        t, h, w = self.patch_embed_shape
        num_spatial = h * w
        num_temporal = t
        B = x.shape[0]

        if self.has_cls:
            cls_token = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)), x], axis=1
            )

        if self.sep_pos_embed:
            pos_spatial = self.param(
                "pos_embed_spatial",
                nn.initializers.zeros,
                (1, num_spatial, self.embed_dim),
            )
            pos_temporal = self.param(
                "pos_embed_temporal",
                nn.initializers.zeros,
                (1, num_temporal, self.embed_dim),
            )
            pos = jnp.tile(pos_spatial, (1, num_temporal, 1)) + jnp.repeat(
                pos_temporal, num_spatial, axis=1
            )
            if self.has_cls:
                pos_class = self.param(
                    "pos_embed_class", nn.initializers.zeros, (1, 1, self.embed_dim)
                )
                pos = jnp.concatenate([pos_class, pos], axis=1)
        else:
            num_patches = num_spatial * num_temporal + (1 if self.has_cls else 0)
            pos = self.param(
                "pos_embed", nn.initializers.zeros, (1, num_patches, self.embed_dim)
            )
        return x + pos


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """Reference positional_encoding.py:139-163."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed_from_grid(embed_dim: int, grid: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_2d_sincos_pos_embed(
    embed_dim: int, grid_size: int, cls_token: bool = False
) -> np.ndarray:
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    pos_embed = get_2d_sincos_pos_embed_from_grid(embed_dim, grid)
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed


def get_3d_sincos_pos_embed(
    embed_dim: int, grid_size: int, t_size: int, cls_token: bool = False
) -> np.ndarray:
    """3D (separable 3/4 spatial + 1/4 temporal) sincos embedding
    (reference positional_encoding.py:139-190)."""
    assert embed_dim % 4 == 0
    embed_dim_spatial = embed_dim // 4 * 3
    embed_dim_temporal = embed_dim // 4

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    pos_embed_spatial = get_2d_sincos_pos_embed_from_grid(embed_dim_spatial, grid)

    grid_t = np.arange(t_size, dtype=np.float32)
    pos_embed_temporal = get_1d_sincos_pos_embed_from_grid(embed_dim_temporal, grid_t)

    pos_embed_temporal = np.repeat(
        pos_embed_temporal[:, None, :], grid_size**2, axis=1
    )
    pos_embed_spatial = np.repeat(
        pos_embed_spatial[None, :, :], t_size, axis=0
    )
    pos_embed = np.concatenate([pos_embed_temporal, pos_embed_spatial], axis=-1)
    pos_embed = pos_embed.reshape([-1, embed_dim])
    if cls_token:
        pos_embed = np.concatenate([np.zeros([1, embed_dim]), pos_embed], axis=0)
    return pos_embed
