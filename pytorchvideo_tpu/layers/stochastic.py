"""DropPath (stochastic depth) and Swish.

Reference: pytorchvideo/layers/drop_path.py:7-45 and layers/swish.py:7-35.
Swish needs no custom autograd here — XLA fuses x*sigmoid(x) and its grad.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def drop_path(x: jnp.ndarray, rate: float, key) -> jnp.ndarray:
    """Per-sample residual-branch drop, scaled by 1/keep_prob."""
    keep_prob = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep_prob, mask_shape)
    return jnp.where(mask, x / keep_prob, 0.0)


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (active only in train)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        return drop_path(x, self.rate, self.make_rng("dropout"))


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


class Swish(nn.Module):
    @nn.compact
    def __call__(self, x):
        return jax.nn.silu(x)
