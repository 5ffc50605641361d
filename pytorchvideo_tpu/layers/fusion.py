"""Multi-stream fusion layers (reference pytorchvideo/layers/fusion.py:17-149)."""

from __future__ import annotations

from typing import Callable, List

import flax.linen as nn
import jax.numpy as jnp


def _verify_feature_dim(feature_dims: List[int]):
    assert isinstance(feature_dims, list)
    assert all(x > 0 for x in feature_dims)


class ConcatFusion(nn.Module):
    """Concat along feature dim (reference fusion.py:46-75)."""

    feature_dims: List[int]

    @property
    def output_dim(self):
        return sum(self.feature_dims)

    @nn.compact
    def __call__(self, input_list):
        _verify_feature_dim(list(self.feature_dims))
        return jnp.concatenate(input_list, axis=-1)


class TemporalConcatFusion(nn.Module):
    """Concat along temporal (seq) dim=1 (reference fusion.py:77-107)."""

    feature_dims: List[int]

    @property
    def output_dim(self):
        out = max(self.feature_dims)
        assert out == min(self.feature_dims)
        return out

    @nn.compact
    def __call__(self, input_list):
        _verify_feature_dim(list(self.feature_dims))
        return jnp.concatenate(input_list, axis=1)


class ReduceFusion(nn.Module):
    """Elementwise reduction over the stream axis (reference fusion.py:110-141)."""

    feature_dims: List[int]
    reduce_fn: Callable

    @property
    def output_dim(self):
        out = max(self.feature_dims)
        assert out == min(self.feature_dims)
        return out

    @nn.compact
    def __call__(self, input_list):
        _verify_feature_dim(list(self.feature_dims))
        return self.reduce_fn(jnp.stack(input_list))


def make_fusion_layer(method: str, feature_dims: List[int]):
    """Factory (reference fusion.py:17-43)."""
    if method == "concat":
        return ConcatFusion(feature_dims)
    if method == "temporal_concat":
        return TemporalConcatFusion(feature_dims)
    if method == "max":
        return ReduceFusion(feature_dims, lambda x: jnp.max(x, axis=0))
    if method == "sum":
        return ReduceFusion(feature_dims, lambda x: jnp.sum(x, axis=0))
    if method == "prod":
        return ReduceFusion(feature_dims, lambda x: jnp.prod(x, axis=0))
    raise NotImplementedError(f"Fusion {method} not available.")
