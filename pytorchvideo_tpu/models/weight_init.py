"""Weight initialization (ResNet and ViT styles) as pytree transforms.

Parity: pytorchvideo/models/weight_init.py:8-92. In linen, init happens at
``model.init``; these functions re-draw the initialized variables tree in the
reference's style:

- resnet: conv kernels ~ kaiming-normal fan_out (c2_msra_fill), Dense
  ~ N(0, fc_init_std), zero biases, and the final BN of every bottleneck
  (``norm_c``, the reference's ``block_final_bn`` flag set at
  resnet.py:1343) gets zero scale.
- vit: Dense/conv kernels ~ trunc_normal(0.02), LN scale 1/bias 0,
  positional-encoding params ~ trunc_normal(0.02).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _walk_update(tree, fn, path=()):
    if isinstance(tree, dict):
        return {k: _walk_update(v, fn, path + (k,)) for k, v in tree.items()}
    return fn(path, tree)


def _split_key_for(path, base_key):
    data = ("/".join(path)).encode()
    return jax.random.fold_in(base_key, hash(data) % (2**31))


def init_resnet_weights(variables, key, fc_init_std: float = 0.01):
    """ResNet-style re-init of a variables tree."""

    def fn(path, leaf):
        name = path[-1]
        k = _split_key_for(path, key)
        if name == "kernel" and leaf.ndim >= 3:
            # conv kernel (..., in, out): fan_out = out * prod(spatial)
            fan_out = leaf.shape[-1] * int(jnp.prod(jnp.array(leaf.shape[:-2])))
            std = math.sqrt(2.0 / fan_out)
            return std * jax.random.normal(k, leaf.shape, leaf.dtype)
        if name == "kernel" and leaf.ndim == 2:
            return fc_init_std * jax.random.normal(k, leaf.shape, leaf.dtype)
        if name == "bias":
            return jnp.zeros_like(leaf)
        if name == "scale":
            # zero-init the final BN of each bottleneck (block_final_bn)
            if len(path) >= 3 and path[-3] == "norm_c":
                return jnp.zeros_like(leaf)
            return jnp.ones_like(leaf)
        return leaf

    out = dict(variables)
    out["params"] = _walk_update(variables["params"], fn)
    return out


def _trunc_normal(key, shape, std, dtype):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32).astype(
        dtype
    )


def init_vit_weights(variables, key, trunc_normal_std: float = 0.02):
    """ViT-style re-init of a variables tree."""

    def fn(path, leaf):
        name = path[-1]
        k = _split_key_for(path, key)
        if name == "kernel":
            return _trunc_normal(k, leaf.shape, trunc_normal_std, leaf.dtype)
        if name in ("cls_token", "pos_embed", "pos_embed_spatial",
                    "pos_embed_temporal", "pos_embed_class"):
            return _trunc_normal(k, leaf.shape, trunc_normal_std, leaf.dtype)
        if name == "bias":
            return jnp.zeros_like(leaf)
        if name == "scale":
            return jnp.ones_like(leaf)
        return leaf

    out = dict(variables)
    out["params"] = _walk_update(variables["params"], fn)
    return out


def init_net_weights(variables, key, init_std: float = 0.01, style: str = "resnet"):
    """Dispatcher (reference weight_init.py:72-92)."""
    assert style in ("resnet", "vit")
    if style == "resnet":
        return init_resnet_weights(variables, key, init_std)
    return init_vit_weights(variables, key, init_std)
