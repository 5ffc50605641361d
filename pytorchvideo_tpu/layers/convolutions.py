"""Convolution layer variants: parallel-reduce and (2+1)D factorized.

Parity: pytorchvideo/layers/convolutions.py (ConvReduce3D :11-85,
create_conv_2plus1d :88-189, Conv2plus1d :191-237). Channels-last.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pytorchvideo_tpu.layers.common import apply_with_train, conv3d, triple
from pytorchvideo_tpu.layers.norms import BatchNorm


class ConvReduce3D(nn.Module):
    """N parallel Conv3Ds over the same input, outputs summed or concatenated.

    Used by acoustic stems/bottlenecks (reference models/stem.py:110-212).
    """

    out_channels: int
    kernel_size: Sequence
    stride: Optional[Sequence] = None
    padding: Optional[Sequence] = None
    dilation: Optional[Sequence] = None
    groups: Optional[Sequence] = None
    bias: Optional[Sequence] = None
    reduction_method: str = "sum"

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.reduction_method in ("sum", "cat")

        def opt(seq, i, default):
            if seq is None or seq[i] is None:
                return default
            return seq[i]

        outputs = []
        for i, k in enumerate(self.kernel_size):
            outputs.append(
                conv3d(
                    self.out_channels,
                    k,
                    stride=opt(self.stride, i, (1, 1, 1)),
                    padding=opt(self.padding, i, (0, 0, 0)),
                    groups=opt(self.groups, i, 1),
                    bias=opt(self.bias, i, True),
                    name=f"convs_{i}",
                )(x)
            )
        if self.reduction_method == "sum":
            out = outputs[0]
            for o in outputs[1:]:
                out = out + o
            return out
        return jnp.concatenate(outputs, axis=-1)


class Conv2plus1d(nn.Module):
    """Factorized (2+1)D conv: conv_t -> norm -> act -> conv_xy
    (or spatial-first when ``conv_xy_first``). Reference convolutions.py:191-237.

    Children are injected module/callable instances (builder idiom).
    """

    conv_t: Optional[nn.Module] = None
    norm: Optional[nn.Module] = None
    activation: Optional[Callable] = None
    conv_xy: Optional[nn.Module] = None
    conv_xy_first: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.conv_t is not None and self.conv_xy is not None
        x = self.conv_xy(x) if self.conv_xy_first else self.conv_t(x)
        x = apply_with_train(self.norm, x, train)
        if self.activation is not None:
            x = self.activation(x)
        x = self.conv_t(x) if self.conv_xy_first else self.conv_xy(x)
        return x


def create_conv_2plus1d(
    *,
    in_channels: int,
    out_channels: int,
    inner_channels: Optional[int] = None,
    conv_xy_first: bool = False,
    kernel_size: Tuple[int, int, int] = (3, 3, 3),
    stride: Tuple[int, int, int] = (2, 2, 2),
    padding: Tuple[int, int, int] = (1, 1, 1),
    bias: bool = False,
    dilation: Tuple[int, int, int] = (1, 1, 1),
    groups: int = 1,
    norm: Optional[Callable] = BatchNorm,
    norm_eps: float = 1e-5,
    norm_momentum: float = 0.1,
    activation: Optional[Callable] = nn.relu,
) -> Conv2plus1d:
    """Build a 2+1D conv (reference convolutions.py:88-189).

    ``in_channels`` is accepted for API parity but inferred by linen.
    ``norm_momentum`` follows torch convention (running-stat update fraction).
    """
    del in_channels
    if inner_channels is None:
        inner_channels = out_channels
    assert groups == 1, "groups unsupported in 2+1d conv"
    assert max(dilation) == 1 and min(dilation) == 1, "dilation unsupported"

    kt, kh, kw = triple(kernel_size)
    st, sh, sw = triple(stride)
    pt, ph, pw = triple(padding)
    conv_t = conv3d(
        inner_channels if not conv_xy_first else out_channels,
        (kt, 1, 1),
        (st, 1, 1),
        (pt, 0, 0),
        bias=bias,
        name="conv_t",
    )
    conv_xy = conv3d(
        out_channels if not conv_xy_first else inner_channels,
        (1, kh, kw),
        (1, sh, sw),
        (0, ph, pw),
        bias=bias,
        name="conv_xy",
    )
    norm_module = (
        None
        if norm is None
        else norm(momentum=1.0 - norm_momentum, epsilon=norm_eps)
    )
    return Conv2plus1d(
        conv_t=conv_t,
        norm=norm_module,
        activation=activation,
        conv_xy=conv_xy,
        conv_xy_first=conv_xy_first,
    )
