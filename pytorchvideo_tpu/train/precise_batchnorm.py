"""Precise-BN: re-estimate BN running stats with extra forward passes.

Parity: pytorchvideo_trainer/callbacks/precise_batchnorm.py:13-70 (which
wraps fvcore's update_bn_stats: running stats become the MEAN of per-batch
statistics over num_batches, not an EMA).

Functional formulation: each batch is forwarded in train mode from the
*initial* stats; since linen BN updates ``s1 = d*s0 + (1-d)*batch_stat``,
the batch statistic is recovered exactly as ``(s1 - d*s0)/(1-d)`` and
averaged across batches — model-agnostic, no module surgery.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp


def update_bn_stats(
    model,
    variables,
    batches: Iterable,
    num_batches: int,
    momentum: float = 0.9,
    input_key: str = "video",
    rngs=None,
):
    """Returns variables with batch_stats replaced by precise estimates."""
    base_stats = variables["batch_stats"]
    sums = jax.tree_util.tree_map(jnp.zeros_like, base_stats)

    @jax.jit
    def batch_stat(params, stats, x):
        _, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            x,
            True,
            mutable=["batch_stats"],
            rngs=rngs or {"dropout": jax.random.PRNGKey(0)},
        )
        new = mutated["batch_stats"]
        return jax.tree_util.tree_map(
            lambda s1, s0: (s1 - momentum * s0) / (1.0 - momentum), new, stats
        )

    seen = 0
    for batch in batches:
        if seen >= num_batches:
            break
        x = batch[input_key] if isinstance(batch, dict) else batch
        bs = batch_stat(variables["params"], base_stats, x)
        sums = jax.tree_util.tree_map(lambda acc, b: acc + b, sums, bs)
        seen += 1
    assert seen > 0, "no batches provided to update_bn_stats"
    mean_stats = jax.tree_util.tree_map(lambda s: s / seen, sums)
    out = dict(variables)
    out["batch_stats"] = mean_stats
    return out


class PreciseBn:
    """Callback-style wrapper (reference precise_batchnorm.py:13-70): call
    at epoch end with a fresh dataloader iterator."""

    def __init__(self, num_batches: int, momentum: float = 0.9):
        self.num_batches = num_batches
        self.momentum = momentum

    def on_train_epoch_end(self, model, variables, dataloader, **kwargs):
        return update_bn_stats(
            model,
            variables,
            dataloader,
            self.num_batches,
            momentum=self.momentum,
            **kwargs,
        )
