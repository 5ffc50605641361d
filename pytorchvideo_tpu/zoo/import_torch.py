"""Generic torch state_dict -> linen variables importer.

Because our model containers mirror the reference module structure field-for-
field (Net.blocks -> blocks_i, ResStage.res_blocks -> res_blocks_j,
BottleneckBlock.conv_a/norm_a/..., MViT blocks.attn.q/k/v/pool_*), a
reference checkpoint key like ``blocks.1.res_blocks.0.branch2.conv_a.weight``
translates mechanically to our param path
``blocks_1/res_blocks_0/branch2/conv_a/kernel`` plus a layout transpose.

Key steps:
1. group state_dict keys by owning torch module prefix,
2. classify each leaf module (BN via running stats, conv by weight rank,
   linear, layernorm) and emit converted params/batch_stats,
3. translate dotted paths (numeric components merge into the previous token:
   ``blocks.0`` -> ``blocks_0``), applying per-model rename rules,
4. align against a target variables tree (from ``model.init``): missing /
   extra / shape-mismatched leaves are reported; size-equal mismatches are
   reshaped (e.g. torch 1x1x1-conv SE -> our Dense).

Reference checkpoint format: {"model_state": state_dict} .pyth files
(reference models/hub/resnet.py:30-38).
"""

from __future__ import annotations

import re
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from pytorchvideo_tpu.zoo.torch_weights import (
    t_conv1d_kernel,
    t_conv2d_kernel,
    t_conv3d_kernel,
    t_linear_kernel,
    to_numpy,
)


def _translate_path(prefix: str) -> Tuple[str, ...]:
    """Dotted torch path -> our linen path tuple."""
    tokens: List[str] = []
    for tok in prefix.split("."):
        if tok.isdigit() and tokens:
            tokens[-1] = f"{tokens[-1]}_{tok}"
        else:
            tokens.append(tok)
    return tuple(t for t in tokens if t)


def _set(tree: Dict, path: Sequence[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Mapping,
    rename_rules: Optional[Sequence[Tuple[str, str]]] = None,
) -> Dict[str, Dict]:
    """Convert a torch state_dict into {"params": ..., "batch_stats": ...}.

    ``rename_rules``: regex (pattern, replacement) pairs applied to each
    dotted key before translation (for the few spots where our structure
    differs, e.g. MViT's ``attn._attention_pool_q`` -> ``attn.pool_q``).
    """
    rename_rules = list(rename_rules or [])
    params: Dict = {}
    batch_stats: Dict = {}

    def rename(key: str) -> str:
        for pat, rep in rename_rules:
            key = re.sub(pat, rep, key)
        return key

    keys = [k for k in state_dict.keys() if not k.endswith("num_batches_tracked")]
    # group by module prefix (strip the final component)
    prefixes: Dict[str, List[str]] = {}
    simple_leaves: List[str] = []
    for k in keys:
        if "." in k:
            prefix, leaf = k.rsplit(".", 1)
            if leaf in ("weight", "bias", "running_mean", "running_var"):
                prefixes.setdefault(prefix, []).append(leaf)
                continue
        simple_leaves.append(k)

    for prefix, leaves in prefixes.items():
        path = _translate_path(rename(prefix))
        has_running = "running_mean" in leaves
        w = state_dict.get(prefix + ".weight")
        if has_running:
            # BatchNorm -> our wrapper's inner "bn"
            if w is not None:
                _set(params, path + ("bn", "scale"), to_numpy(w))
            if prefix + ".bias" in state_dict:
                _set(params, path + ("bn", "bias"), to_numpy(state_dict[prefix + ".bias"]))
            _set(
                batch_stats,
                path + ("bn", "mean"),
                to_numpy(state_dict[prefix + ".running_mean"]),
            )
            _set(
                batch_stats,
                path + ("bn", "var"),
                to_numpy(state_dict[prefix + ".running_var"]),
            )
            continue
        assert w is not None, f"module {prefix} has no weight"
        w_np = to_numpy(w)
        if w_np.ndim == 5:
            _set(params, path + ("kernel",), t_conv3d_kernel(w_np))
        elif w_np.ndim == 4:
            _set(params, path + ("kernel",), t_conv2d_kernel(w_np))
        elif w_np.ndim == 3:
            _set(params, path + ("kernel",), t_conv1d_kernel(w_np))
        elif w_np.ndim == 2:
            _set(params, path + ("kernel",), t_linear_kernel(w_np))
        elif w_np.ndim == 1:
            # LayerNorm (no running stats) -> inner "ln"
            _set(params, path + ("ln", "scale"), w_np)
            if prefix + ".bias" in state_dict:
                _set(
                    params,
                    path + ("ln", "bias"),
                    to_numpy(state_dict[prefix + ".bias"]),
                )
            continue
        else:
            raise ValueError(f"unhandled weight rank for {prefix}: {w_np.shape}")
        if prefix + ".bias" in state_dict:
            _set(params, path + ("bias",), to_numpy(state_dict[prefix + ".bias"]))

    for k in simple_leaves:
        # bare parameters: cls_token, pos_embed_*, etc.
        _set(params, _translate_path(rename(k)), to_numpy(state_dict[k]))

    return {"params": params, "batch_stats": batch_stats}


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def _get(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def align_to_target(
    converted: Mapping,
    target_variables: Mapping,
    strict: bool = True,
):
    """Fill the target variables tree from a converted state dict.

    Returns (variables, report) where report lists missing/extra/mismatched
    leaves. Size-equal shape mismatches are reshaped (handles conv1x1<->dense
    representation differences).
    """
    import jax.numpy as jnp

    report = {"missing": [], "reshaped": [], "extra": []}
    out = {}
    for col in target_variables:
        src_col = converted.get(col, {})
        col_out = {}
        for path, target_leaf in _walk(target_variables[col]):
            src = _get(src_col, path)
            if src is None:
                report["missing"].append((col,) + path)
                _set(col_out, path, target_leaf)
                continue
            src = np.asarray(src)
            if src.shape != tuple(target_leaf.shape):
                if src.size == target_leaf.size:
                    src = src.reshape(target_leaf.shape)
                    report["reshaped"].append((col,) + path)
                else:
                    raise ValueError(
                        f"shape mismatch at {(col,) + path}: "
                        f"{src.shape} vs {target_leaf.shape}"
                    )
            _set(col_out, path, jnp.asarray(src, dtype=target_leaf.dtype))
        out[col] = col_out
        # track source leaves that never landed
        for path, _ in _walk(src_col):
            if _get(target_variables[col], path) is None:
                report["extra"].append((col,) + path)
    if strict and (report["missing"] or report["extra"]):
        raise ValueError(f"state dict mismatch: {report}")
    return out, report


def import_torch_checkpoint(
    state_dict: Mapping,
    target_variables: Mapping,
    rename_rules: Optional[Sequence[Tuple[str, str]]] = None,
    strict: bool = True,
):
    """One-call importer: convert + align. Returns (variables, report)."""
    if "model_state" in state_dict and not any(
        hasattr(v, "shape") for v in state_dict.values() if v is not None
    ):
        state_dict = state_dict["model_state"]
    converted = convert_state_dict(state_dict, rename_rules)
    return align_to_target(converted, target_variables, strict=strict)


# Rename rules for model families whose field layout differs from a
# mechanical path translation.
MVIT_RENAME_RULES = [
    # the reference aliases each pool conv/norm twice in the state dict
    # (attn.pool_q + attn._attention_pool_q.pool); both map to our TokenPool
    (r"attn\._attention_pool_(q|k|v)", r"attn.pool_\1"),
    (r"attn\.pool_(q|k|v)$", r"attn.pool_\1.pool"),
    (r"attn\.norm_(q|k|v)$", r"attn.pool_\1.norm"),
]
X3D_RENAME_RULES = [
    # NormSE packs the reference's nn.Sequential(norm, se)
    (r"norm_b\.0(?=$|\.)", "norm_b.norm"),
    (r"norm_b\.1\.block\.0(?=$|\.)", "norm_b.se.fc1"),
    (r"norm_b\.1\.block\.2(?=$|\.)", "norm_b.se.fc2"),
    # head: reference packs ProjectedPool into ResNetBasicHead's pool slot;
    # ours is X3DHead.projected_pool
    (r"\.pool\.(pre|post)_", r".projected_pool.\1_"),
]
