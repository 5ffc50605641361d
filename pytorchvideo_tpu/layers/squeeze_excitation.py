"""Squeeze-and-Excitation layers.

Parity targets:
- 3D SE used by X3D bottlenecks: the reference delegates to
  fvcore.nn.squeeze_excitation.SqueezeExcitation (models/x3d.py:9,191) —
  global avg pool -> 1x1x1 conv reduce -> ReLU -> 1x1x1 conv expand ->
  sigmoid -> scale.
- 2D SE + acoustic SE residual block: pytorchvideo/layers/squeeze_excitation.py:10-180.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from pytorchvideo_tpu.layers.common import apply_with_train
from pytorchvideo_tpu.layers.norms import BatchNorm


class SqueezeExcitation(nn.Module):
    """SE over channels-last input of any spatial rank.

    ``num_channels_reduced`` is the bottleneck width. Works for (B, T, H, W, C)
    (the X3D/fvcore is_3d=True case) and (B, H, W, C).
    """

    num_channels_reduced: int

    @nn.compact
    def __call__(self, x):
        spatial_axes = tuple(range(1, x.ndim - 1))
        squeezed = jnp.mean(x, axis=spatial_axes, keepdims=True)
        # 1x1 convs on a 1-spatial-size tensor == Dense over channels.
        e = nn.Dense(self.num_channels_reduced, name="fc1")(squeezed)
        e = nn.relu(e)
        e = nn.Dense(x.shape[-1], name="fc2")(e)
        return x * nn.sigmoid(e)


# Alias matching the reference 2D class name (squeeze_excitation.py:10-54).
class SqueezeAndExcitationLayer2D(nn.Module):
    in_planes: int
    reduction_ratio: Optional[int] = 16
    reduced_planes: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        assert bool(self.reduction_ratio) != bool(self.reduced_planes)
        reduced = (
            self.in_planes // self.reduction_ratio
            if self.reduced_planes is None
            else self.reduced_planes
        )
        return SqueezeExcitation(num_channels_reduced=reduced, name="se")(x)


class _Audio2DSqueezeExcitationBlock(nn.Module):
    """conv-norm-act-conv-norm-(SE) + shortcut, then activation."""

    dim_out: int
    use_se: bool
    se_reduction_ratio: int
    branch_fusion: Callable
    conv_a_kernel_size: int
    conv_a_stride: int
    conv_a_padding: int
    conv_b_kernel_size: int
    conv_b_stride: int
    conv_b_padding: int
    norm: Optional[Callable]
    norm_eps: float
    norm_momentum: float
    activation: Optional[Callable]
    needs_shortcut_proj: bool

    def _norm(self, name):
        if self.norm is None:
            return None
        return self.norm(
            momentum=1.0 - self.norm_momentum, epsilon=self.norm_eps, name=name
        )

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv2d(features, k, s, p, name):
            return nn.Conv(
                features,
                kernel_size=(k, k),
                strides=(s, s),
                padding=((p, p), (p, p)),
                use_bias=False,
                name=name,
            )

        shortcut = x
        if self.needs_shortcut_proj:
            shortcut = conv2d(
                self.dim_out, 1, self.conv_a_stride, 0, "branch1_conv"
            )(x)
            shortcut = apply_with_train(self._norm("branch1_norm"), shortcut, train)

        h = conv2d(
            self.dim_out,
            self.conv_a_kernel_size,
            self.conv_a_stride,
            self.conv_a_padding,
            "conv_a",
        )(x)
        h = apply_with_train(self._norm("norm_a"), h, train)
        if self.activation is not None:
            h = self.activation(h)
        h = conv2d(
            self.dim_out,
            self.conv_b_kernel_size,
            self.conv_b_stride,
            self.conv_b_padding,
            "conv_b",
        )(h)
        h = apply_with_train(self._norm("norm_b"), h, train)
        if self.use_se:
            h = SqueezeExcitation(
                num_channels_reduced=self.dim_out // self.se_reduction_ratio,
                name="se",
            )(h)
        out = self.branch_fusion(shortcut, h)
        if self.activation is not None:
            out = self.activation(out)
        return out


def create_audio_2d_squeeze_excitation_block(
    dim_in: int,
    dim_out: int,
    use_se: bool = False,
    se_reduction_ratio: int = 16,
    branch_fusion: Callable = lambda x, y: x + y,
    conv_a_kernel_size: int = 3,
    conv_a_stride: int = 1,
    conv_a_padding: int = 1,
    conv_b_kernel_size: int = 3,
    conv_b_stride: int = 1,
    conv_b_padding: int = 1,
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
) -> nn.Module:
    """2D SE residual block builder (reference squeeze_excitation.py:56-180)."""
    return _Audio2DSqueezeExcitationBlock(
        dim_out=dim_out,
        use_se=use_se,
        se_reduction_ratio=se_reduction_ratio,
        branch_fusion=branch_fusion,
        conv_a_kernel_size=conv_a_kernel_size,
        conv_a_stride=conv_a_stride,
        conv_a_padding=conv_a_padding,
        conv_b_kernel_size=conv_b_kernel_size,
        conv_b_stride=conv_b_stride,
        conv_b_padding=conv_b_padding,
        norm=norm,
        norm_eps=norm_eps,
        norm_momentum=norm_momentum,
        activation=activation,
        needs_shortcut_proj=(dim_in != dim_out or conv_a_stride != 1),
    )
