"""Trainer-level losses.

Parity: pytorchvideo_trainer/module/losses.py:12-134 (SoftTargetCrossEntropy,
NtxentLoss with all-gathered negatives, SimilarityLoss, ContrastiveLoss).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.losses import soft_target_cross_entropy  # noqa: F401


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def ntxent_loss(
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    temperature: float = 0.07,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """NT-Xent: positives on the diagonal against (optionally cross-device)
    negatives. Under jit over a Mesh the batch is already global; inside
    shard_map pass axis_name for the reference's all-gathered negatives."""
    z1 = _l2_normalize(z1)
    z2 = _l2_normalize(z2)
    n = z1.shape[0]
    if axis_name is not None:
        z2_all = jax.lax.all_gather(z2, axis_name, axis=0, tiled=True)
        gt = jax.lax.axis_index(axis_name) * n + jnp.arange(n)
    else:
        z2_all = z2
        gt = jnp.arange(n)
    logits = (z1 @ z2_all.T) / temperature
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(log_probs, gt[:, None], axis=1))


def similarity_loss(q: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Negative mean cosine similarity of normalized embeddings
    (BYOL-style; reference losses.py SimilarityLoss)."""
    q = _l2_normalize(q)
    k = _l2_normalize(k)
    return -jnp.mean(jnp.einsum("nc,nc->n", q, k))


def contrastive_loss(
    q: jnp.ndarray,
    pos_and_neg: jnp.ndarray,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """InfoNCE with the positive in column 0 of ``pos_and_neg`` (B, K+1, C)
    (MoCo-style; reference losses.py ContrastiveLoss)."""
    q = _l2_normalize(q)
    logits = jnp.einsum("nc,nkc->nk", q, pos_and_neg) / temperature
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(log_probs[:, 0])
