"""Differentiable collective helpers.

Reference equivalents: fvcore differentiable_all_gather used by SimCLR
(models/simclr.py:192), AllGatherWithGradient (trainer
module/distributed_utils.py:303-323), cat_all_gather
(layers/distributed.py:25-39). In jax, lax.all_gather is differentiable
out of the box; these helpers name the pattern for use inside shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather_with_grad(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """All-gather along a mesh axis, keeping gradients flowing to every
    shard (lax.all_gather's VJP is a reduce-scatter). Result has a leading
    device axis."""
    return jax.lax.all_gather(x, axis_name)


def cat_all_gather(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """All-gather and concatenate along the batch dim
    (reference layers/distributed.py:25-39)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
