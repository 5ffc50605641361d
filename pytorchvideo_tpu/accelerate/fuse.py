"""Inference-time BatchNorm folding (params-tree transformations).

The TPU analogue of the reference's deploy-form conversion
(accelerator/deployment/mobile_cpu/utils/model_conversion.py:234 and MViT
``fuse_bn``, models/vision_transformers.py:96-170): instead of swapping
modules, we rewrite the variables pytree —

- conv+BN pairs: scale folds into the conv kernel's output channels; the BN
  keeps only the residual bias (scale=1, mean=0, var=1), which XLA fuses
  into the conv epilogue. Exact (allclose) by construction.
- MViT BN variant: norm1 folds into q/k/v (or qkv), per-head attention-pool
  BNs fold into the projections, norm2 folds into mlp.fc1 (+proj on dim
  change). Folded BNs become identities in-place.
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# (conv field, norm field) sibling pairs used across our model families.
CONV_BN_PAIRS = [
    ("conv_a", "norm_a"),
    ("conv_b", "norm_b"),
    ("conv_c", "norm_c"),
    ("branch1_conv", "branch1_norm"),
    ("conv", "norm"),
    ("pre_conv", "pre_norm"),
    ("post_conv", "post_norm"),
    ("conv_fast_to_slow", "norm"),
    ("conv_b_0", "norm_b_0"),
    ("conv_b_1", "norm_b_1"),
]


def _find_bn(params_node: Dict, stats_node: Optional[Dict]):
    """Locate the inner bn dicts under a norm field (handles the NormSE
    nesting, where bn lives under 'norm')."""
    if params_node is None:
        return None, None, None
    if "bn" in params_node:
        return params_node["bn"], (stats_node or {}).get("bn"), ()
    if "norm" in params_node and isinstance(params_node["norm"], dict):
        p, s, path = _find_bn(
            params_node["norm"], (stats_node or {}).get("norm")
        )
        if p is not None:
            return p, s, ("norm",) + path
    return None, None, None


def _bn_scale_bias(bn_params, bn_stats, eps=1e-5):
    scale = bn_params.get("scale", 1.0) / np.sqrt(np.asarray(bn_stats["var"]) + eps)
    bias = bn_params.get("bias", 0.0) - scale * np.asarray(bn_stats["mean"])
    return np.asarray(scale), np.asarray(bias)


def fold_conv_bn(variables: Dict, eps: float = 1e-5) -> Dict:
    """Fold every known conv+BN sibling pair across the variables tree."""
    variables = copy.deepcopy(
        {
            "params": jnp_to_np(variables.get("params", {})),
            "batch_stats": jnp_to_np(variables.get("batch_stats", {})),
        }
    )
    _fold_node(variables["params"], variables["batch_stats"], eps)
    return {
        "params": np_to_jnp(variables["params"]),
        "batch_stats": np_to_jnp(variables["batch_stats"]),
    }


def _fold_node(params: Dict, stats: Dict, eps: float):
    if not isinstance(params, dict):
        return
    for conv_key, norm_key in CONV_BN_PAIRS:
        if conv_key in params and norm_key in params:
            conv = params[conv_key]
            # Conv2plus1d conv: fold into its final conv (conv_xy by default)
            if isinstance(conv, dict) and "kernel" not in conv:
                inner = conv.get("conv_xy") or conv.get("conv_t")
                if inner is None or "kernel" not in inner:
                    continue
                conv = inner
            if "kernel" not in conv:
                continue
            bn_p, bn_s, _ = _find_bn(
                params.get(norm_key), (stats or {}).get(norm_key)
            )
            if bn_p is None or bn_s is None:
                continue
            scale, bias = _bn_scale_bias(bn_p, bn_s, eps)
            if scale.shape[0] != conv["kernel"].shape[-1]:
                continue
            conv["kernel"] = conv["kernel"] * scale
            if "bias" in conv:
                conv["bias"] = conv["bias"] * scale + bias
                bn_p["scale"] = np.ones_like(scale)
                bn_p["bias"] = np.zeros_like(bias)
            else:
                # conv has no bias slot: keep the residual shift in the BN
                bn_p["scale"] = np.ones_like(scale)
                bn_p["bias"] = bias
            bn_s["mean"] = np.zeros_like(bn_s["mean"])
            bn_s["var"] = np.ones_like(bn_s["var"]) - eps
    for key, child in params.items():
        if isinstance(child, dict):
            _fold_node(child, (stats or {}).get(key, {}), eps)


def _identity_bn(bn_p, bn_s, eps):
    bn_p["scale"] = np.ones_like(bn_p["scale"])
    bn_p["bias"] = np.zeros_like(bn_p["bias"])
    bn_s["mean"] = np.zeros_like(bn_s["mean"])
    bn_s["var"] = np.ones_like(bn_s["var"]) - eps


def fuse_bn_mvit(variables: Dict, eps: float = 1e-5) -> Dict:
    """MViT BN-variant folding (reference vision_transformers.py:96-170).

    norm1/norm2 folds are exact always. The per-head attention-pool BN fold
    into the q/k/v projection is exact only without a cls token (the BN
    applies to grid tokens but not cls; the reference fuses it anyway and
    only tests with ``cls_embed_on=False``, tests/test_fuse_bn.py:26). With
    a cls token present we skip the pool-norm fold and leave those BNs in
    place, so the fused model stays bit-equivalent in every configuration.
    """
    variables = copy.deepcopy(
        {
            "params": jnp_to_np(variables["params"]),
            "batch_stats": jnp_to_np(variables.get("batch_stats", {})),
        }
    )
    params = variables["params"]
    stats = variables["batch_stats"]
    has_cls = "cls_token" in params.get("cls_positional_encoding", {})

    def fold_before(bn_p, bn_s, dense):
        """y = dense(bn(x)): kernel (in,out) -> scale rows."""
        if "bias" not in dense:
            # the reference's fused_linear always carries a bias
            # (vision_transformers.py:85); without a bias slot in the tree
            # the BN shift has nowhere to go.
            raise ValueError(
                "fuse_bn_mvit requires qkv_bias/bias_on=True (bias slots)"
            )
        scale, bias = _bn_scale_bias(bn_p, bn_s, eps)
        k = dense["kernel"]
        new_bias = bias @ k + dense.get("bias", 0.0)
        dense["kernel"] = k * scale[:, None]
        dense["bias"] = np.asarray(new_bias)

    def fold_after(dense, bn_p, bn_s, repeat):
        """y = bn(dense(x)) with per-head bn: scale columns."""
        scale, bias = _bn_scale_bias(bn_p, bn_s, eps)
        s_rep = np.tile(scale, repeat)
        b_rep = np.tile(bias, repeat)
        dense["kernel"] = dense["kernel"] * s_rep[None, :]
        dense["bias"] = dense.get("bias", 0.0) * s_rep + b_rep

    for key in sorted(k for k in params if k.startswith("blocks_")):
        blk_p, blk_s = params[key], stats.get(key, {})
        attn = blk_p["attn"]
        attn_s = blk_s.get("attn", {})

        # norm1 -> q/k/v or qkv
        n1_p, n1_s, _ = _find_bn(blk_p.get("norm1"), blk_s.get("norm1"))
        if n1_p is not None:
            targets = ["qkv"] if "qkv" in attn else ["q", "k", "v"]
            for t in targets:
                fold_before(n1_p, n1_s, attn[t])
            _identity_bn(n1_p, n1_s, eps)

        # attention pool norms -> after q/k/v projections (per-head).
        # Only exact without a cls token (the pool BN skips cls but the
        # projection does not); keep the BN when a cls token exists.
        for t, pool_name in () if has_cls else (
            ("q", "pool_q"), ("k", "pool_k"), ("v", "pool_v")):
            pool = attn.get(pool_name)
            if pool is None:
                continue
            np_p, np_s, _ = _find_bn(
                pool.get("norm"), attn_s.get(pool_name, {}).get("norm")
            )
            if np_p is None:
                continue
            target = attn["qkv"] if "qkv" in attn else attn[t]
            if "qkv" in attn:
                # fold into the matching third of qkv
                dim = target["kernel"].shape[1] // 3
                idx = {"q": 0, "k": 1, "v": 2}[t]
                sub = {
                    "kernel": target["kernel"][:, idx * dim : (idx + 1) * dim],
                    "bias": target["bias"][idx * dim : (idx + 1) * dim],
                }
                fold_after(sub, np_p, np_s, dim // np_p["scale"].shape[0])
                target["kernel"][:, idx * dim : (idx + 1) * dim] = sub["kernel"]
                target["bias"][idx * dim : (idx + 1) * dim] = sub["bias"]
            else:
                repeat = target["kernel"].shape[1] // np_p["scale"].shape[0]
                fold_after(target, np_p, np_s, repeat)
            _identity_bn(np_p, np_s, eps)

        # norm2 -> mlp.fc1 (+ proj if dim change)
        n2_p, n2_s, _ = _find_bn(blk_p.get("norm2"), blk_s.get("norm2"))
        if n2_p is not None:
            fold_before(n2_p, n2_s, blk_p["mlp"]["fc1"])
            if "proj" in blk_p:
                fold_before(n2_p, n2_s, blk_p["proj"])
            _identity_bn(n2_p, n2_s, eps)

    return {
        "params": np_to_jnp(params),
        "batch_stats": np_to_jnp(stats),
    }


def jnp_to_np(tree):
    if isinstance(tree, dict):
        return {k: jnp_to_np(v) for k, v in tree.items()}
    return np.array(tree)


def np_to_jnp(tree):
    if isinstance(tree, dict):
        return {k: np_to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)
