"""Weight quantization (int8) for deployment.

The reference's int8 story is QNNPACK post-training quantization
(accelerator efficient blocks, layers/accelerator/mobile_cpu/convolutions.py
convert paths). TPU analogue: symmetric per-output-channel int8 weights with
bf16 activations (weight-only quantization — an HBM-bandwidth win on TPU);
`dequantize_variables` restores dense weights for execution, letting XLA
fuse the dequant multiply into the matmul/conv.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _quantize_leaf(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel (last axis) symmetric int8."""
    flat = w.reshape(-1, w.shape[-1])
    absmax = np.abs(flat).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_variables(variables: Dict, min_size: int = 1024) -> Dict:
    """Quantize kernel leaves (>= min_size elements) to int8 + scales.

    Returns {"params": tree with {"q": int8, "scale": f32} leaves for
    quantized kernels, ...} usable by :func:`dequantize_variables`.
    """

    def walk(tree):
        if isinstance(tree, dict):
            if "kernel" in tree and not isinstance(tree["kernel"], dict):
                k = np.asarray(tree["kernel"])
                if k.size >= min_size and k.ndim >= 2:
                    q, scale = _quantize_leaf(k)
                    out = dict(tree)
                    out["kernel"] = {"q": q, "scale": scale}
                    return {
                        key: (walk(v) if key != "kernel" else out["kernel"])
                        for key, v in out.items()
                    }
            return {k: walk(v) for k, v in tree.items()}
        return tree

    out = dict(variables)
    out["params"] = walk(variables["params"])
    return out


def dequantize_variables(variables: Dict, dtype=jnp.bfloat16) -> Dict:
    """Restore dense weights (int8 * scale) for execution."""

    def walk(tree):
        if isinstance(tree, dict):
            if "q" in tree and "scale" in tree and len(tree) == 2:
                return (
                    jnp.asarray(tree["q"], dtype) * jnp.asarray(tree["scale"], dtype)
                )
            return {k: walk(v) for k, v in tree.items()}
        return tree

    out = dict(variables)
    out["params"] = walk(variables["params"])
    return out


def quantization_error(variables: Dict) -> float:
    """Max relative per-leaf error of the int8 roundtrip (diagnostic)."""
    errs = []

    def walk(orig, q):
        if isinstance(orig, dict):
            for k in orig:
                walk(orig[k], q[k])
            return
        pass

    qv = quantize_variables(variables)
    dq = dequantize_variables(qv, jnp.float32)

    flat_o = jax.tree_util.tree_leaves(variables["params"])
    flat_d = jax.tree_util.tree_leaves(dq["params"])
    for o, d in zip(flat_o, flat_d):
        denom = float(jnp.abs(o).max()) or 1.0
        errs.append(float(jnp.abs(o - d).max()) / denom)
    return max(errs)
