"""Batch-level MixUp / CutMix / MixVideo — fully on-device.

Parity target: /root/reference/pytorchvideo/transforms/mix.py (MixUp :35,
CutMix :99, MixVideo :199, _mix_labels :9). TPU-native design: these run
*inside* the jitted train step on the batched (B, T, H, W, C) tensor, taking a
jax PRNG key; CutMix's random box becomes a traced mask (static shapes) rather
than python slicing.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.transforms.functional import convert_to_one_hot


def _mix_labels(
    labels: jnp.ndarray,
    num_classes: int,
    lam,
    label_smoothing: float = 0.0,
    one_hot: bool = False,
) -> jnp.ndarray:
    """Mix labels with their batch-flip (reference mix.py:9-32)."""
    if one_hot:
        labels1 = labels
        labels2 = jnp.flip(labels, axis=0)
    else:
        labels1 = convert_to_one_hot(labels, num_classes, label_smoothing)
        labels2 = convert_to_one_hot(
            jnp.flip(labels, axis=0), num_classes, label_smoothing
        )
    lam = jnp.asarray(lam, labels1.dtype)
    return labels1 * lam + labels2 * (1.0 - lam)


def _sample_beta(key: jax.Array, alpha: float) -> jnp.ndarray:
    return jax.random.beta(key, alpha, alpha)


def mixup(
    key: jax.Array,
    x_video: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 1.0,
    label_smoothing: float = 0.0,
    num_classes: int = 400,
    one_hot: bool = False,
    x_audio: Optional[jnp.ndarray] = None,
):
    """MixUp (reference mix.py:35-97): lam*x + (1-lam)*flip(x, batch)."""
    lam = _sample_beta(key, alpha)
    mixed = x_video * lam + jnp.flip(x_video, axis=0) * (1.0 - lam)
    new_labels = _mix_labels(labels, num_classes, lam, label_smoothing, one_hot)
    if x_audio is not None:
        mixed_audio = x_audio * lam + jnp.flip(x_audio, axis=0) * (1.0 - lam)
        return mixed, mixed_audio, new_labels
    return mixed, new_labels


def _cutmix_mask_and_lambda(key: jax.Array, h: int, w: int, lam):
    """Random box -> (mask over (H, W), corrected lambda).

    Box math mirrors reference mix.py:128-147 (center + clipped half-extents);
    realized as a boolean mask so shapes stay static under jit.
    """
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = jnp.floor(h * ratio).astype(jnp.int32)
    cut_w = jnp.floor(w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    yl = jnp.clip(cy - cut_h // 2, 0, h)
    yh = jnp.clip(cy + cut_h // 2, 0, h)
    xl = jnp.clip(cx - cut_w // 2, 0, w)
    xh = jnp.clip(cx + cut_w // 2, 0, w)
    ys = jnp.arange(h)
    xs = jnp.arange(w)
    mask = ((ys[:, None] >= yl) & (ys[:, None] < yh)) & (
        (xs[None, :] >= xl) & (xs[None, :] < xh)
    )
    box_area = ((yh - yl) * (xh - xl)).astype(jnp.float32)
    lam_corrected = 1.0 - box_area / float(h * w)
    return mask, lam_corrected


def _apply_cutmix(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    # x: (..., H, W, C) channels-last; mask: (H, W).
    m = mask[..., None]
    return jnp.where(m, jnp.flip(x, axis=0), x)


def cutmix(
    key: jax.Array,
    x_video: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 1.0,
    label_smoothing: float = 0.0,
    num_classes: int = 400,
    one_hot: bool = False,
    x_audio: Optional[jnp.ndarray] = None,
):
    """CutMix (reference mix.py:99-196), lambda corrected by realized area."""
    k_lam, k_box, k_abox = jax.random.split(key, 3)
    lam = _sample_beta(k_lam, alpha)
    h, w = x_video.shape[-3], x_video.shape[-2]
    mask, lam_corrected = _cutmix_mask_and_lambda(k_box, h, w, lam)
    mixed = _apply_cutmix(x_video, mask)
    new_labels = _mix_labels(
        labels, num_classes, lam_corrected, label_smoothing, one_hot
    )
    if x_audio is not None:
        ah, aw = x_audio.shape[-3], x_audio.shape[-2]
        amask, _ = _cutmix_mask_and_lambda(k_abox, ah, aw, lam)
        mixed_audio = _apply_cutmix(x_audio, amask)
        return mixed, mixed_audio, new_labels
    return mixed, new_labels


class MixUp:
    """Class wrapper matching the reference module API (mix.py:35)."""

    def __init__(
        self,
        alpha: float = 1.0,
        label_smoothing: float = 0.0,
        num_classes: int = 400,
        one_hot: bool = False,
    ):
        self.alpha = alpha
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes
        self.one_hot = one_hot

    def __call__(self, key, x_video, labels, x_audio=None):
        return mixup(
            key,
            x_video,
            labels,
            alpha=self.alpha,
            label_smoothing=self.label_smoothing,
            num_classes=self.num_classes,
            one_hot=self.one_hot,
            x_audio=x_audio,
        )


class CutMix:
    """Class wrapper matching the reference module API (mix.py:99)."""

    def __init__(
        self,
        alpha: float = 1.0,
        label_smoothing: float = 0.0,
        num_classes: int = 400,
        one_hot: bool = False,
    ):
        self.alpha = alpha
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes
        self.one_hot = one_hot

    def __call__(self, key, x_video, labels, x_audio=None):
        return cutmix(
            key,
            x_video,
            labels,
            alpha=self.alpha,
            label_smoothing=self.label_smoothing,
            num_classes=self.num_classes,
            one_hot=self.one_hot,
            x_audio=x_audio,
        )


class MixVideo:
    """Stochastically apply MixUp or CutMix (reference mix.py:199-279).

    Implemented with lax.cond so both branches compile once and the choice is
    a traced coin flip.
    """

    def __init__(
        self,
        cutmix_prob: float = 0.5,
        mixup_alpha: float = 1.0,
        cutmix_alpha: float = 1.0,
        label_smoothing: float = 0.0,
        num_classes: int = 400,
        one_hot: bool = False,
    ):
        assert 0.0 <= cutmix_prob <= 1.0
        self.cutmix_prob = cutmix_prob
        self.mixup = MixUp(mixup_alpha, label_smoothing, num_classes, one_hot)
        self.cutmix = CutMix(cutmix_alpha, label_smoothing, num_classes, one_hot)

    def __call__(self, key, x_video, labels, x_audio=None):
        k_choice, k_op = jax.random.split(key)
        use_cutmix = jax.random.uniform(k_choice) < self.cutmix_prob
        if x_audio is None:
            return jax.lax.cond(
                use_cutmix,
                lambda k: self.cutmix(k, x_video, labels),
                lambda k: self.mixup(k, x_video, labels),
                k_op,
            )
        return jax.lax.cond(
            use_cutmix,
            lambda k: self.cutmix(k, x_video, labels, x_audio),
            lambda k: self.mixup(k, x_video, labels, x_audio),
            k_op,
        )
