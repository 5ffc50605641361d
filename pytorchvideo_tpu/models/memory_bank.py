"""Memory-bank instance discrimination
(https://arxiv.org/pdf/1805.01978.pdf).

Parity: pytorchvideo/models/memory_bank.py:12-113. The bank is explicit
functional state: ``init_memory`` creates it, ``loss`` returns
(loss, updated_memory) during training.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class MemoryBank:
    """Functional memory-bank contrastive wrapper."""

    def __init__(
        self,
        backbone: nn.Module,
        mlp: Optional[nn.Module] = None,
        neg_size: int = 4096,
        temperature: float = 0.07,
        bank_size: int = 1280000,
        dim: int = 2048,
        mmt: float = 0.999,
    ):
        self.backbone = backbone
        self.mlp = mlp
        self.neg_size = neg_size
        self.temperature = temperature
        self.bank_size = bank_size
        self.dim = dim
        self.mmt = mmt

    def init(self, key, x_example):
        k1, k2, k3 = jax.random.split(key, 3)
        state = {"backbone": self.backbone.init(k1, x_example, False)}
        if self.mlp is not None:
            feat = self.backbone.apply(state["backbone"], x_example, False)
            state["mlp"] = self.mlp.init(k2, feat, False)
        state["memory"] = self.init_memory(k3)
        return state

    def init_memory(self, key):
        """Uniform in [-stdv, stdv], stdv = 1/sqrt(dim/3) (reference :53-71)."""
        stdv = 1.0 / math.sqrt(self.dim / 3)
        return jax.random.uniform(
            key, (self.bank_size, self.dim), minval=-stdv, maxval=stdv
        )

    def _embed(self, state, x, train, rngs=None):
        x = self.backbone.apply(state["backbone"], x, train, rngs=rngs)
        if self.mlp is not None:
            x = self.mlp.apply(state["mlp"], x, train, rngs=rngs)
        return _l2_normalize(x)

    def loss(
        self,
        state,
        x,
        x_ind,
        key,
        train: bool = True,
        rngs=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Contrastive loss vs neg_size random bank slots (slot 0 is the
        positive own-index embedding); returns (loss, new_memory)."""
        memory = state["memory"]
        batch_size = x.shape[0]
        emb = self._embed(state, x, train, rngs)

        idx = jax.random.randint(
            key, (batch_size, self.neg_size + 1), 0, self.bank_size
        )
        idx = idx.at[:, 0].set(x_ind)
        weight = memory[idx]  # (B, K+1, C)
        logits = jnp.einsum("bkc,bc->bk", weight, emb) / self.temperature
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(log_probs[:, 0])

        if train:
            pos = memory[x_ind]
            updated = _l2_normalize(
                pos * self.mmt + jax.lax.stop_gradient(emb) * (1 - self.mmt)
            )
            memory = memory.at[x_ind].set(updated)
        return loss, memory
