"""Normalization wrappers with a uniform ``(x, train)`` call signature.

The reference injects ``norm`` callables (nn.BatchNorm3d / nn.LayerNorm /
NaiveSyncBatchNorm, see pytorchvideo/layers/batch_norm.py and
models/resnet.py:601-653) whose train/eval behavior rides on module mode.
In linen, mode is explicit; every norm here is called as ``norm(x, train=...)``
so builders can inject any of them interchangeably.

TPU/channels-last: all norms operate on the trailing channel axis; BatchNorm
reduces over every other axis, which for (B, T, H, W, C) equals the
reference's BatchNorm3d and for (B, L, C) equals BatchNorm1d.

SyncBN: under ``jit`` over a Mesh the batch is global, so batch statistics
are already cross-replica ("sync BN for free"). Under ``shard_map``/``pmap``
per-device batches are local; pass ``axis_name``/``axis_index_groups`` for
the reference's NaiveSyncBatchNorm global/local-group semantics
(layers/batch_norm.py:45-226, layers/distributed.py:91-145).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp


class Identity(nn.Module):
    """No-op module accepting the uniform call signature."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class BatchNorm(nn.Module):
    """BatchNorm over the trailing channel axis (any rank).

    torch defaults: momentum 0.1 (-> linen decay 0.9), eps 1e-5.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True
    axis_name: Optional[str] = None
    axis_index_groups: Optional[Any] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_bias=self.use_bias,
            use_scale=self.use_scale,
            axis_name=self.axis_name,
            axis_index_groups=self.axis_index_groups,
            dtype=self.dtype,
            name="bn",
        )(x)


# The reference distinguishes BatchNorm1d/2d/3d and NaiveSync variants purely
# by input rank / distributed reduction; channels-last linen BN covers all.
BatchNorm1d = BatchNorm
BatchNorm2d = BatchNorm
BatchNorm3d = BatchNorm
NaiveSyncBatchNorm1d = BatchNorm
NaiveSyncBatchNorm2d = BatchNorm
NaiveSyncBatchNorm3d = BatchNorm


class LayerNorm(nn.Module):
    """LayerNorm over the trailing channel axis."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.LayerNorm(epsilon=self.epsilon, name="ln")(x)


def make_norm(norm, num_features=None, eps: float = 1e-5, momentum: float = 0.1,
              name: Optional[str] = None):
    """Instantiate an injected norm factory with torch-style (eps, momentum).

    Accepts our linen norm classes (BatchNorm/LayerNorm/Identity), partials of
    them, or None. ``momentum`` follows torch convention (update fraction);
    linen decay = 1 - momentum. ``num_features`` is inferred by linen and
    otherwise forwarded to pack-aware norms (see below).
    """
    if norm is None:
        return None
    import functools

    base = norm.func if isinstance(norm, functools.partial) else norm
    if isinstance(base, type) and issubclass(base, BatchNorm):
        # pack-aware norms (a `channels` dataclass field, e.g.
        # layers/packed.PackedBatchNorm) receive num_features so they can
        # infer the pack factor from the minor dim at call time
        extra = {}
        bound = norm.keywords if isinstance(norm, functools.partial) else {}
        if (
            num_features is not None
            and "channels" in getattr(base, "__dataclass_fields__", {})
            and "channels" not in bound
        ):
            extra["channels"] = num_features
        return norm(momentum=1.0 - momentum, epsilon=eps, name=name, **extra)
    if isinstance(base, type) and issubclass(base, LayerNorm):
        return norm(epsilon=eps, name=name)
    return norm(name=name)


def make_act(activation):
    """Injected activation -> plain callable. Accepts a function
    (jax.nn.relu), a module class, or None (reference `activation=nn.ReLU`
    idiom, called as activation())."""
    if activation is None:
        return None
    if isinstance(activation, type):
        return activation()
    return activation


def norm_is_batchnorm(norm_factory) -> bool:
    """True if a norm factory produces a batch-stat norm (used by MViT's
    pool-before-norm special case, reference layers/attention.py:152-156)."""
    try:
        import functools

        base = (
            norm_factory.func
            if isinstance(norm_factory, functools.partial)
            else norm_factory
        )
    except Exception:
        base = norm_factory
    return isinstance(base, type) and issubclass(base, BatchNorm)
