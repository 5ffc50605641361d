"""Efficient conv/SE/pool/fc blocks with a train form and a deploy form.

Parity: pytorchvideo/layers/accelerator/mobile_cpu/convolutions.py
(Conv3dPwBnAct :29, Conv3d3x3x3DwBnAct :182, Conv3dTemporalKernel1BnAct
:304, Conv3d3x1x1BnAct :421, Conv3d5x1x1BnAct :535),
attention.py:16-107 (SqueezeExcitation), activation_functions.py:17-95,
pool.py:14-41 (AdaptiveAvgPool3dOutSize1), fully_connected.py:9, and
models/accelerator/mobile_cpu/residual_blocks.py:22-200 (X3dBottleneckBlock).

TPU redesign: the reference's ``convert()`` rewrites conv3d into QNNPACK
conv2d decompositions because mobile int8 has no conv3d. On TPU, XLA's
conv_general_dilated already hits the MXU for every kernel shape, so the
deploy-form rewrite is *numeric*, not structural: fold the BN affine into
the conv weights (fuse.fold_conv_bn machinery) and cast to the deploy
dtype. The block classes here are flax modules named so the generic
CONV_BN_PAIRS folding applies, wrapped in EfficientBlockBase objects that
carry (module, variables) and implement convert().
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorchvideo_tpu.accelerate.efficient_blocks import EfficientBlockBase
from pytorchvideo_tpu.layers.common import avg_pool3d, conv3d
from pytorchvideo_tpu.layers.norms import BatchNorm


def _hswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


# reference activation_functions.py:17-95 {relu, swish, hswish, identity}
supported_act_functions = {
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
    "hswish": _hswish,
    "identity": lambda x: x,
}


class _ConvBnAct(nn.Module):
    """conv -> BN -> act with fold-compatible field names (conv/norm)."""

    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    groups: int = 1
    bias: bool = True
    use_bn: bool = True
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(
            self.features,
            self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            groups=self.groups,
            bias=self.bias,
            name="conv",
        )(x)
        if self.use_bn:
            x = BatchNorm(name="norm")(x, train)
        return supported_act_functions[self.activation](x)


class _EfficientConvBlock(EfficientBlockBase):
    """Shared (module, variables) wrapper: convert() folds BN + casts."""

    def __init__(self, module: nn.Module):
        self.model = module
        self.variables = None
        self._deploy_vars = None
        self._deploy_dtype = None

    def init(self, key, example_input):
        self.variables = self.model.init(key, example_input, False)
        return self.variables

    def load_variables(self, variables):
        self.variables = variables

    def convert(self, example_input=None, dtype=jnp.bfloat16, **kwargs):
        from pytorchvideo_tpu.accelerate.fuse import fold_conv_bn

        assert self.variables is not None, "init or load variables first"
        folded = fold_conv_bn(self.variables)
        if dtype is not None:
            folded = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                folded,
            )
        self._deploy_vars = folded
        self._deploy_dtype = dtype
        return self

    def __call__(self, x, train: bool = False):
        if self._deploy_vars is not None and not train:
            if self._deploy_dtype is not None:
                x = jnp.asarray(x, self._deploy_dtype)
            return self.model.apply(self._deploy_vars, x, False)
        assert self.variables is not None, "init or load variables first"
        return self.model.apply(self.variables, x, train)


def Conv3dPwBnAct(
    in_channels: int,
    out_channels: int,
    bias: bool = False,
    activation: str = "relu",
    use_bn: bool = True,
) -> _EfficientConvBlock:
    """1x1x1 pointwise conv + BN + act (reference convolutions.py:29-179)."""
    del in_channels  # channels-last flax infers input features
    return _EfficientConvBlock(
        _ConvBnAct(
            features=out_channels,
            kernel_size=(1, 1, 1),
            bias=bias,
            use_bn=use_bn,
            activation=activation,
        )
    )


def Conv3d3x3x3DwBnAct(
    in_channels: int,
    bias: bool = False,
    activation: str = "relu",
    use_bn: bool = True,
) -> _EfficientConvBlock:
    """Depthwise 3x3x3 conv + BN + act (reference convolutions.py:182-301)."""
    return _EfficientConvBlock(
        _ConvBnAct(
            features=in_channels,
            kernel_size=(3, 3, 3),
            padding=(1, 1, 1),
            groups=in_channels,
            bias=bias,
            use_bn=use_bn,
            activation=activation,
        )
    )


def Conv3dTemporalKernel1BnAct(
    in_channels: int,
    out_channels: int,
    kernel_size: Tuple[int, int] = (3, 3),
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (1, 1),
    groups: int = 1,
    bias: bool = False,
    activation: str = "relu",
    use_bn: bool = True,
) -> _EfficientConvBlock:
    """Spatial-only conv (temporal k=1) + BN + act
    (reference convolutions.py:304-418)."""
    del in_channels
    return _EfficientConvBlock(
        _ConvBnAct(
            features=out_channels,
            kernel_size=(1,) + tuple(kernel_size),
            stride=(1,) + tuple(stride),
            padding=(0,) + tuple(padding),
            groups=groups,
            bias=bias,
            use_bn=use_bn,
            activation=activation,
        )
    )


def Conv3d3x1x1BnAct(
    in_channels: int,
    out_channels: int,
    groups: int = 1,
    bias: bool = False,
    activation: str = "relu",
    use_bn: bool = True,
) -> _EfficientConvBlock:
    """Temporal-only 3x1x1 conv + BN + act (reference convolutions.py:421-532)."""
    del in_channels
    return _EfficientConvBlock(
        _ConvBnAct(
            features=out_channels,
            kernel_size=(3, 1, 1),
            padding=(1, 0, 0),
            groups=groups,
            bias=bias,
            use_bn=use_bn,
            activation=activation,
        )
    )


def Conv3d5x1x1BnAct(
    in_channels: int,
    out_channels: int,
    groups: int = 1,
    bias: bool = False,
    activation: str = "relu",
    use_bn: bool = True,
) -> _EfficientConvBlock:
    """Temporal-only 5x1x1 conv + BN + act (reference convolutions.py:535-629)."""
    del in_channels
    return _EfficientConvBlock(
        _ConvBnAct(
            features=out_channels,
            kernel_size=(5, 1, 1),
            padding=(2, 0, 0),
            groups=groups,
            bias=bias,
            use_bn=use_bn,
            activation=activation,
        )
    )


class _SE(nn.Module):
    """Squeeze-Excitation over (B,T,H,W,C): global mean -> 2 pointwise
    convs -> sigmoid gate (reference layers/accelerator attention.py:16-107)."""

    num_channels: int
    num_channels_reduced: Optional[int] = None
    reduction_ratio: float = 2.0
    is_3d: bool = True
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        reduced = self.num_channels_reduced or int(
            self.num_channels // self.reduction_ratio
        )
        pooled = jnp.mean(x, axis=(1, 2, 3) if self.is_3d else (1, 2),
                          keepdims=True)
        g = conv3d(reduced, (1, 1, 1), name="fc1")(pooled)
        g = supported_act_functions[self.activation](g)
        g = conv3d(self.num_channels, (1, 1, 1), name="fc2")(g)
        return x * jax.nn.sigmoid(g)


def SqueezeExcitation(
    num_channels: int,
    num_channels_reduced: Optional[int] = None,
    reduction_ratio: float = 2.0,
    is_3d: bool = True,
    activation: str = "relu",
) -> _EfficientConvBlock:
    return _EfficientConvBlock(
        _SE(
            num_channels=num_channels,
            num_channels_reduced=num_channels_reduced,
            reduction_ratio=reduction_ratio,
            is_3d=is_3d,
            activation=activation,
        )
    )


class _AdaptiveAvgPoolOut1(nn.Module):
    """Global average to (1,1,1) spatial output (reference pool.py:14-41 —
    there convert() bakes the input size into a fixed AvgPool; under XLA a
    full-window reduce is already a single fused reduction)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return avg_pool3d(x, x.shape[-4:-1])


def AdaptiveAvgPool3dOutSize1() -> _EfficientConvBlock:
    return _EfficientConvBlock(_AdaptiveAvgPoolOut1())


class _AdaptiveAvgPool2dOut1(nn.Module):
    """(..., H, W, C) -> global spatial average (reference pool.py:45-75)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x.mean(axis=(-3, -2), keepdims=True)


def AdaptiveAvgPool2dOutSize1() -> _EfficientConvBlock:
    return _EfficientConvBlock(_AdaptiveAvgPool2dOut1())


class _AdaptiveAvgPoolAny(nn.Module):
    """Adaptive average pool to an arbitrary output size over the last
    ``ndim`` spatial axes (reference pool.py:78-115 NoOpConvertBlocks —
    nothing to convert; XLA emits a reduce_window per output cell)."""

    output_size: Tuple[int, ...]
    ndim: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = x
        spatial_start = x.ndim - 1 - self.ndim
        for i, target in enumerate(self.output_size):
            axis = spatial_start + i
            n = out.shape[axis]
            assert n % target == 0, (
                f"adaptive pool needs divisible sizes, got {n} -> {target}"
            )
            shape = (
                out.shape[:axis]
                + (target, n // target)
                + out.shape[axis + 1 :]
            )
            out = out.reshape(shape).mean(axis=axis + 1)
        return out


def AdaptiveAvgPool3d(output_size) -> _EfficientConvBlock:
    if isinstance(output_size, int):
        output_size = (output_size,) * 3
    return _EfficientConvBlock(
        _AdaptiveAvgPoolAny(output_size=tuple(output_size), ndim=3)
    )


def AdaptiveAvgPool2d(output_size) -> _EfficientConvBlock:
    if isinstance(output_size, int):
        output_size = (output_size,) * 2
    return _EfficientConvBlock(
        _AdaptiveAvgPoolAny(output_size=tuple(output_size), ndim=2)
    )


class _Act(nn.Module):
    """Activation as a module (reference activation_functions.py:31-95
    exposes Swish/HardSwish/ReLU/Identity as EfficientBlocks; convert() is
    numeric-identity under XLA, which fuses the elementwise op anyway)."""

    activation: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        return supported_act_functions[self.activation](x)


def Swish() -> _EfficientConvBlock:
    return _EfficientConvBlock(_Act(activation="swish"))


def HardSwish() -> _EfficientConvBlock:
    return _EfficientConvBlock(_Act(activation="hswish"))


def ReLU() -> _EfficientConvBlock:
    return _EfficientConvBlock(_Act(activation="relu"))


def Identity() -> _EfficientConvBlock:
    return _EfficientConvBlock(_Act(activation="identity"))


class _FC(nn.Module):
    features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.features, use_bias=self.bias, name="fc")(x)


def FullyConnected(
    in_features: int, out_features: int, bias: bool = True
) -> _EfficientConvBlock:
    """Linear layer (reference fully_connected.py:9)."""
    del in_features
    return _EfficientConvBlock(_FC(features=out_features, bias=bias))


class _X3dBottleneck(nn.Module):
    """pw-expand -> dw temporal+spatial -> (SE) -> pw-project, residual
    (reference residual_blocks.py:22-200). Field names (conv_a/norm_a, ...)
    match CONV_BN_PAIRS so deploy folding applies to every conv."""

    out_channels: int
    exp_channels: int
    use_residual: bool = True
    spatial_stride: int = 1
    se_ratio: float = 0.0625
    act_functions: Tuple[str, str, str] = ("relu", "relu", "relu")
    use_bn: Tuple[bool, bool, bool] = (True, True, True)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        h = conv3d(self.exp_channels, (1, 1, 1), bias=not self.use_bn[0],
                   name="conv_a")(x)
        if self.use_bn[0]:
            h = BatchNorm(name="norm_a")(h, train)
        h = supported_act_functions[self.act_functions[0]](h)

        h = conv3d(
            self.exp_channels,
            (3, 3, 3),
            stride=(1, self.spatial_stride, self.spatial_stride),
            padding=(1, 1, 1),
            groups=self.exp_channels,
            bias=not self.use_bn[1],
            name="conv_b",
        )(h)
        if self.use_bn[1]:
            h = BatchNorm(name="norm_b")(h, train)
        if self.se_ratio > 0:
            h = _SE(
                num_channels=self.exp_channels,
                num_channels_reduced=max(
                    1, int(round(self.exp_channels * self.se_ratio))
                ),
                name="se",
            )(h, train)
        h = supported_act_functions[self.act_functions[1]](h)

        h = conv3d(self.out_channels, (1, 1, 1), bias=not self.use_bn[2],
                   name="conv_c")(h)
        if self.use_bn[2]:
            h = BatchNorm(name="norm_c")(h, train)
        if (
            self.use_residual
            and self.spatial_stride == 1
            and residual.shape[-1] == self.out_channels
        ):
            h = h + residual
        return supported_act_functions[self.act_functions[2]](h)


def X3dBottleneckBlock(
    in_channels: int,
    mid_channels: int,
    out_channels: int,
    use_residual: bool = True,
    spatial_stride: int = 1,
    se_ratio: float = 0.0625,
    act_functions: Tuple[str, str, str] = ("relu", "relu", "relu"),
    use_bn: Tuple[bool, bool, bool] = (True, True, True),
) -> _EfficientConvBlock:
    del in_channels
    return _EfficientConvBlock(
        _X3dBottleneck(
            out_channels=out_channels,
            exp_channels=mid_channels,
            use_residual=use_residual,
            spatial_stride=spatial_stride,
            se_ratio=se_ratio,
            act_functions=tuple(act_functions),
            use_bn=tuple(use_bn),
        )
    )
