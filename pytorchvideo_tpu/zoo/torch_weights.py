"""Torch state_dict -> linen pytree conversion primitives.

The reference model zoo ships checkpoints as ``{"model_state": state_dict}``
(.pyth files, reference models/hub/resnet.py:30-38). This module holds the
layout converters used by the importer(s): torch is channels-first /
(out, in) linear; linen is channels-last / (in, out).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def t_linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> linen Dense kernel (in, out)."""
    return np.ascontiguousarray(np.transpose(w))


def t_conv3d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv3d weight (out, in/g, kT, kH, kW) -> linen (kT, kH, kW, in/g, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def t_conv2d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (out, in/g, kH, kW) -> linen (kH, kW, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def t_conv1d_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv1d weight (out, in/g, k) -> linen (k, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def to_numpy(t) -> np.ndarray:
    """torch tensor (or array-like) -> float numpy array."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def bn_params(sd: Mapping, prefix: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Extract one torch BatchNorm's params+stats for our BatchNorm wrapper.

    Returns {"params": {"scale", "bias"}, "batch_stats": {"mean", "var"}}
    to be placed under the wrapper's inner "bn" collection entries.
    """
    return {
        "params": {
            "scale": to_numpy(sd[prefix + ".weight"]),
            "bias": to_numpy(sd[prefix + ".bias"]),
        },
        "batch_stats": {
            "mean": to_numpy(sd[prefix + ".running_mean"]),
            "var": to_numpy(sd[prefix + ".running_var"]),
        },
    }


def ln_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": to_numpy(sd[prefix + ".weight"]),
        "bias": to_numpy(sd[prefix + ".bias"]),
    }


def dense_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": t_linear_kernel(to_numpy(sd[prefix + ".weight"]))}
    if prefix + ".bias" in sd:
        out["bias"] = to_numpy(sd[prefix + ".bias"])
    return out


def conv3d_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": t_conv3d_kernel(to_numpy(sd[prefix + ".weight"]))}
    if prefix + ".bias" in sd:
        out["bias"] = to_numpy(sd[prefix + ".bias"])
    return out


def conv2d_params(sd: Mapping, prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": t_conv2d_kernel(to_numpy(sd[prefix + ".weight"]))}
    if prefix + ".bias" in sd:
        out["bias"] = to_numpy(sd[prefix + ".bias"])
    return out
