"""Shared helpers for channels-last 3D conv / pool in linen.

Conventions: video tensors are (B, T, H, W, C); kernels/strides/paddings are
(kT, kH, kW) triples. ``padding`` values are symmetric per-dim pad counts
(the reference's torch-style ints), mapped to XLA pad pairs.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Size3 = Tuple[int, int, int]


def triple(v) -> Size3:
    if isinstance(v, (tuple, list)):
        assert len(v) == 3
        return tuple(int(x) for x in v)
    return (int(v),) * 3


def pad_pairs(padding) -> Tuple[Tuple[int, int], ...]:
    return tuple((int(p), int(p)) for p in triple(padding))


def conv3d(
    features: int,
    kernel_size,
    stride=(1, 1, 1),
    padding=(0, 0, 0),
    groups: int = 1,
    bias: bool = True,
    name: Optional[str] = None,
    dtype=None,
) -> nn.Conv:
    """Channels-last Conv3D (maps to XLA conv_general_dilated on the MXU)."""
    return nn.Conv(
        features=features,
        kernel_size=triple(kernel_size),
        strides=triple(stride),
        padding=pad_pairs(padding),
        feature_group_count=groups,
        use_bias=bias,
        name=name,
        dtype=dtype,
    )


def _check_pool_fits(x, k, padding):
    # XLA silently returns zero-size dims (-> NaN means); torch raises.
    for dim, kk, p in zip(x.shape[-4:-1], k, triple(padding)):
        if dim + 2 * p < kk:
            raise ValueError(
                f"pool kernel {k} larger than padded input {x.shape[-4:-1]}"
            )


def max_pool3d(x, kernel_size, stride=None, padding=(0, 0, 0)):
    """Torch-MaxPool3d-compatible (pads with -inf, floor output size).

    flax pooling takes spatial-only window/strides/padding.
    """
    k = triple(kernel_size)
    s = triple(stride) if stride is not None else k
    _check_pool_fits(x, k, padding)
    return nn.max_pool(x, window_shape=k, strides=s, padding=pad_pairs(padding))


def avg_pool3d(x, kernel_size, stride=None, padding=(0, 0, 0)):
    """Torch-AvgPool3d(count_include_pad=True)-compatible."""
    k = triple(kernel_size)
    s = triple(stride) if stride is not None else k
    _check_pool_fits(x, k, padding)
    return nn.avg_pool(
        x,
        window_shape=k,
        strides=s,
        padding=pad_pairs(padding),
        count_include_pad=True,
    )


def adaptive_avg_pool3d_to_1(x):
    """Global spatiotemporal average: (B, T, H, W, C) -> (B, 1, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2, 3), keepdims=True)


def Conv3d(
    *,
    in_channels: Optional[int] = None,
    out_channels: int,
    kernel_size,
    stride=(1, 1, 1),
    padding=(0, 0, 0),
    bias: bool = True,
    groups: int = 1,
    dilation=(1, 1, 1),
    name: Optional[str] = None,
) -> nn.Conv:
    """Torch-signature Conv3d factory for the reference's injectable-callable
    idiom (e.g. ``conv_a=Conv3d`` in create_bottleneck_block,
    reference models/resnet.py:17-41). ``in_channels`` is inferred by linen.
    """
    del in_channels
    return nn.Conv(
        features=out_channels,
        kernel_size=triple(kernel_size),
        strides=triple(stride),
        padding=pad_pairs(padding),
        feature_group_count=groups,
        kernel_dilation=triple(dilation),
        use_bias=bias,
        name=name,
    )


class WBlockedConv(nn.Module):
    """Conv3D with the minor spatial axis space-to-depth-blocked by its
    stride (exact rewrite; parity-tested vs conv_general_dilated).

    XLA:TPU runs tiny-C_in patch-embed convs far off the MXU roofline
    (MViT-B stem k(3,7,7) s(2,4,4) C_in=3: 11.6 TF/s). Blocking W by the
    stride turns (W, C) -> (W/s, s*C) with a PURE RESHAPE on both the
    activation and the (zero-padded-to-s-multiple) kernel — no transpose
    reaches HBM, unlike H/T blocking whose phase transposes cost more
    than they save (measured 6.3/8.6 ms vs 5.0 baseline; W-only: 3.3 ms).

    Parameter tree is identical to ``nn.Conv`` ("kernel" (kt,kh,kw,C,F),
    "bias" (F,)) so checkpoint import and BN-fold passes are unaffected.
    """

    features: int
    kernel_size: Size3
    strides: Size3 = (1, 1, 1)
    padding: Tuple[Tuple[int, int], ...] = ((0, 0), (0, 0), (0, 0))
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        st, sh, sw = self.strides
        (pt0, pt1), (ph0, ph1), (pw0, pw1) = self.padding
        C = x.shape[-1]
        w = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (kt, kh, kw, C, self.features),
        )
        b = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        w = w.astype(x.dtype)
        wblock_plan = None
        if sw > 1 and pw0 == pw1:
            # Embed the kernel at a phase offset so the LEFT pad becomes
            # whole-block conv padding (no materialized input pad): output
            # j reads padded positions [j*sw - p, j*sw - p + kw); with
            # Lb = ceil(p/sw) zero blocks in front and the kernel shifted
            # by offset = Lb*sw - p, the same window is blocks
            # [j - Lb, j - Lb + nblk). When W % sw == 0 (every 224/160-crop
            # stem) the activation is reshaped with ZERO data movement.
            N = x.shape[3]
            out_w = (N + 2 * pw0 - kw) // sw + 1
            Lb = -(-pw0 // sw)
            offset = Lb * sw - pw0
            nblk = -(-(offset + kw) // sw)
            K = nblk * sw
            r = (-N) % sw
            Rb = out_w - 1 + nblk - (N + r) // sw - Lb
            if Rb >= 0:
                wblock_plan = (N, out_w, Lb, offset, nblk, K, r, Rb)
        if wblock_plan is not None:
            N, out_w, Lb, offset, nblk, K, r, Rb = wblock_plan
            if r:
                x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, r), (0, 0)])
            B, T, H = x.shape[:3]
            x = x.reshape(B, T, H, (N + r) // sw, sw * C)
            w = jnp.pad(
                w, [(0, 0), (0, 0), (offset, K - offset - kw), (0, 0), (0, 0)]
            )
            w = w.reshape(kt, kh, nblk, sw * C, self.features)
            out = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(st, sh, 1),
                padding=[(pt0, pt1), (ph0, ph1), (Lb, Rb)],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
        else:
            out = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=self.strides,
                padding=list(self.padding),
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
        if b is not None:
            out = out + b.astype(out.dtype)
        return out


_TRAIN_AWARE_CACHE: dict = {}


def apply_with_train(module, x, train: bool = False):
    """Call a child (module or plain fn), passing ``train`` iff it accepts it.

    Lets builder-composed containers mix train-aware modules (norm, dropout,
    drop-path) with plain convs/activations, mirroring the reference's
    injectable-callable idiom (e.g. models/resnet.py:601-653) without each
    container knowing every child's signature.
    """
    if module is None:
        return x
    import inspect

    key = type(module)
    accepts = _TRAIN_AWARE_CACHE.get(key)
    if accepts is None:
        try:
            sig = inspect.signature(
                module.__call__ if hasattr(module, "__call__") else module
            )
            accepts = "train" in sig.parameters
        except (TypeError, ValueError):
            accepts = False
        _TRAIN_AWARE_CACHE[key] = accepts
    return module(x, train=train) if accepts else module(x)
