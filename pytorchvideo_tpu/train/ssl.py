"""SSL training utilities: KNN memory eval, momentum annealing, MoCo v2.

Parity: pytorchvideo_trainer/module/ssl_helper.py (KnnMemory :156, momentum
annealing :314-460) and module/moco_v2.py (queue :408, batch
shuffle/unshuffle across ranks :364-406). TPU design: under jit over a
Mesh, BN already sees the global batch, so MoCo's cross-rank shuffle becomes
a plain on-device permutation; the queue is explicit functional state.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def momentum_anneal_cosine(base_mmt: float, cur_epoch: float, max_epoch: float) -> float:
    """m_t = 1 - (1 - m) * (cos(pi * t / T) + 1) / 2
    (reference ssl_helper.py momentum annealing)."""
    return 1.0 - (1.0 - base_mmt) * (
        math.cos(math.pi * cur_epoch / max_epoch) + 1.0
    ) / 2.0


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


class KnnMemory:
    """Feature bank + labels for online KNN evaluation
    (reference ssl_helper.py:156-310). Functional state: (features, labels,
    ptr) updated by :meth:`update`."""

    def __init__(
        self,
        length: int,
        dim: int,
        knn_k: int = 200,
        temperature: float = 1.0,
        num_classes: int = 400,
    ):
        self.length = length
        self.dim = dim
        self.knn_k = knn_k
        self.temperature = temperature
        self.num_classes = num_classes

    def init(self, key):
        return {
            "features": jax.random.normal(key, (self.length, self.dim)) * 0.01,
            "labels": jnp.zeros((self.length,), jnp.int32),
            "ptr": jnp.zeros((), jnp.int32),
        }

    def update(self, state, features, labels, indices=None):
        """Write embeddings either at dataset ``indices`` or ring-buffer
        style at the pointer."""
        features = _l2_normalize(features)
        if indices is not None:
            new_feat = state["features"].at[indices].set(features)
            new_lab = state["labels"].at[indices].set(labels.astype(jnp.int32))
            return {**state, "features": new_feat, "labels": new_lab}
        n = features.shape[0]
        idx = (state["ptr"] + jnp.arange(n)) % self.length
        return {
            "features": state["features"].at[idx].set(features),
            "labels": state["labels"].at[idx].set(labels.astype(jnp.int32)),
            "ptr": (state["ptr"] + n) % self.length,
        }

    def knn_predict(self, state, features):
        """Weighted-KNN class scores (reference eval path)."""
        features = _l2_normalize(features)
        sims = features @ state["features"].T  # (B, length)
        topk_sims, topk_idx = jax.lax.top_k(sims, self.knn_k)
        topk_labels = state["labels"][topk_idx]  # (B, k)
        weights = jnp.exp(topk_sims / self.temperature)
        one_hot = jax.nn.one_hot(topk_labels, self.num_classes)
        return jnp.einsum("bk,bkc->bc", weights, one_hot)


def batch_shuffle(key, x):
    """Shuffle the batch (BN-leakage defense, reference moco_v2.py:364-386).
    Returns (shuffled, inverse_permutation)."""
    n = x.shape[0]
    perm = jax.random.permutation(key, n)
    inv = jnp.argsort(perm)
    return x[perm], inv


def batch_unshuffle(x, inverse_perm):
    """Reference moco_v2.py:388-406."""
    return x[inverse_perm]


class MoCoV2:
    """MoCo v2 training logic around online/momentum encoders and a
    negative queue (reference moco_v2.py).

    Encoders follow the BYOL wrapper convention: a linen module applied as
    ``module.apply(variables, x, train)`` returning (B, dim) embeddings.
    """

    def __init__(
        self,
        backbone,
        queue_size: int = 65536,
        dim: int = 128,
        temperature: float = 0.2,
        mmt: float = 0.994,
    ):
        self.backbone = backbone
        self.queue_size = queue_size
        self.dim = dim
        self.temperature = temperature
        self.mmt = mmt

    def init(self, key, x_example):
        k1, k2 = jax.random.split(key)
        online = self.backbone.init(k1, x_example, False)
        momentum = jax.tree_util.tree_map(lambda a: a, online)
        queue = _l2_normalize(
            jax.random.normal(k2, (self.queue_size, self.dim))
        )
        return {
            "online": online,
            "momentum": momentum,
            "queue": queue,
            "queue_ptr": jnp.zeros((), jnp.int32),
        }

    def momentum_update(self, state, mmt: Optional[float] = None):
        mmt = self.mmt if mmt is None else mmt
        new_m = jax.tree_util.tree_map(
            lambda m, o: m * mmt + o * (1.0 - mmt),
            state["momentum"],
            state["online"],
        )
        return {**state, "momentum": new_m}

    def dequeue_and_enqueue(self, state, keys):
        """Ring-buffer write of key embeddings (reference moco_v2.py:408)."""
        n = keys.shape[0]
        idx = (state["queue_ptr"] + jnp.arange(n)) % self.queue_size
        return {
            **state,
            "queue": state["queue"].at[idx].set(_l2_normalize(keys)),
            "queue_ptr": (state["queue_ptr"] + n) % self.queue_size,
        }

    def loss(self, state, x_query, x_key, shuffle_key, train: bool = True, rngs=None):
        """InfoNCE with queue negatives; the key pass runs on a shuffled
        batch through the momentum encoder."""
        q = _l2_normalize(
            self.backbone.apply(state["online"], x_query, train, rngs=rngs)
        )
        x_key_shuf, inv = batch_shuffle(shuffle_key, x_key)
        k = self.backbone.apply(state["momentum"], x_key_shuf, False)
        k = _l2_normalize(batch_unshuffle(k, inv))
        k = jax.lax.stop_gradient(k)

        l_pos = jnp.einsum("nc,nc->n", q, k)[:, None]
        l_neg = q @ state["queue"].T
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.temperature
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(log_probs[:, 0])
        return loss, k
