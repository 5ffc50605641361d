"""SimCLR NT-Xent (https://arxiv.org/abs/2002.05709).

Parity: pytorchvideo/models/simclr.py:13-66. Cross-device negatives: under
jit over a Mesh the loss already sees the global batch; inside shard_map
pass ``axis_name`` to all-gather keys with gradients (the reference's
fvcore differentiable_all_gather, simclr.py:192) and offset labels by rank.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class SimCLR:
    """Functional SimCLR wrapper: backbone (optional) + projection mlp."""

    def __init__(
        self,
        mlp: nn.Module,
        backbone: Optional[nn.Module] = None,
        temperature: float = 0.07,
    ):
        self.mlp = mlp
        self.backbone = backbone
        self.temperature = temperature

    def init(self, key, x_example):
        k1, k2 = jax.random.split(key)
        state = {}
        feat = x_example
        if self.backbone is not None:
            state["backbone"] = self.backbone.init(k1, x_example, False)
            feat = self.backbone.apply(state["backbone"], x_example, False)
        state["mlp"] = self.mlp.init(k2, feat, False)
        return state

    def _embed(self, state, x, train, rngs=None):
        if self.backbone is not None:
            x = self.backbone.apply(state["backbone"], x, train, rngs=rngs)
        x = self.mlp.apply(state["mlp"], x, train, rngs=rngs)
        return _l2_normalize(x)

    def loss(
        self,
        state,
        x1,
        x2,
        train: bool = True,
        rngs=None,
        axis_name: Optional[str] = None,
    ):
        """NT-Xent with (optionally all-gathered) negatives."""
        z1 = self._embed(state, x1, train, rngs)
        z2 = self._embed(state, x2, train, rngs)
        batch_size = z1.shape[0]
        if axis_name is not None:
            # keys from every device; labels offset by this device's rank
            z2_all = jax.lax.all_gather(z2, axis_name, axis=0, tiled=True)
            rank = jax.lax.axis_index(axis_name)
            gt = rank * batch_size + jnp.arange(batch_size)
        else:
            z2_all = z2
            gt = jnp.arange(batch_size)
        logits = jnp.einsum("nc,kc->nk", z1, z2_all) / self.temperature
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(log_probs, gt[:, None], axis=1))
