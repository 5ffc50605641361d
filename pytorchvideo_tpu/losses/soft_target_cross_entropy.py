"""Soft-target cross entropy (multi-label / smoothed targets).

Parity target: /root/reference/pytorchvideo/losses/soft_target_cross_entropy.py:10-81.
Functional-first (jit/grad-friendly); a thin class wrapper mirrors the
reference module API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.transforms.functional import convert_to_one_hot

_EPS = float(jnp.finfo(jnp.float32).eps)


def soft_target_cross_entropy(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    ignore_index: int = -100,
    reduction: str = "mean",
    normalize_targets: bool = True,
) -> jnp.ndarray:
    """-sum(target * log_softmax(logits)) with ignore-index masking.

    ``logits``: (N, C) raw scores. ``target``: (N, C) soft labels or (N,)
    class indices. Samples whose soft target assigns positive mass to
    ``ignore_index`` are dropped; the mean is over samples with any valid
    target (reference :61-81).
    """
    if target.ndim == 1:
        target = convert_to_one_hot(target, logits.shape[1])
    assert logits.shape == target.shape, (logits.shape, target.shape)

    n, c = target.shape
    if 0 <= ignore_index <= c - 1:
        valid = (target[:, ignore_index] <= 0).astype(jnp.float32)[:, None]
    else:
        valid = jnp.ones((n, 1), jnp.float32)

    valid_targets = target.astype(jnp.float32) * valid
    if normalize_targets:
        valid_targets = valid_targets / (
            _EPS + valid_targets.sum(axis=1, keepdims=True)
        )
    per_sample = -jnp.sum(valid_targets * jax.nn.log_softmax(logits, axis=-1), -1)

    if reduction == "mean":
        denom = jnp.maximum(jnp.sum((jnp.sum(valid, -1) > 0)), 1)
        return per_sample.sum() / denom
    if reduction == "none":
        return per_sample
    raise NotImplementedError(f'reduction type "{reduction}" not implemented')


class SoftTargetCrossEntropyLoss:
    """Class wrapper mirroring the reference nn.Module API."""

    def __init__(
        self,
        ignore_index: int = -100,
        reduction: str = "mean",
        normalize_targets: bool = True,
    ):
        if reduction not in ("mean", "none"):
            raise NotImplementedError(f'reduction type "{reduction}" not implemented')
        self.ignore_index = ignore_index
        self.reduction = reduction
        self.normalize_targets = normalize_targets

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return soft_target_cross_entropy(
            logits,
            target,
            ignore_index=self.ignore_index,
            reduction=self.reduction,
            normalize_targets=self.normalize_targets,
        )
