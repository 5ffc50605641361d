"""Model transmuter: registry of target-specific rewrite passes.

Parity: pytorchvideo/accelerator/deployment/common/model_transmuter.py:77-147
(EFFICIENT_BLOCK_TRANSMUTER_REGISTRY keyed by device, transmute_model
recursively swapping modules). Functional analogue: passes over
(model, variables) pairs; the "tpu" target's passes are variables
transformations (BN fold, bf16 cast, weight-only int8).
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)

# target device -> ordered list of passes. Each pass:
#   (model, variables, **kwargs) -> (model, variables) or None (= no change)
EFFICIENT_BLOCK_TRANSMUTER_REGISTRY: Dict[str, List[Callable]] = {}


def register_transmuter(target_device: str, fn: Callable) -> Callable:
    EFFICIENT_BLOCK_TRANSMUTER_REGISTRY.setdefault(target_device, []).append(fn)
    return fn


def transmute_model(
    model,
    variables,
    target_device: str = "tpu",
    **kwargs,
):
    """Apply the target's rewrite passes in order (reference
    model_transmuter.py:114-147)."""
    assert target_device in EFFICIENT_BLOCK_TRANSMUTER_REGISTRY, (
        f"{target_device} not registered; available: "
        f"{list(EFFICIENT_BLOCK_TRANSMUTER_REGISTRY)}"
    )
    for fn in EFFICIENT_BLOCK_TRANSMUTER_REGISTRY[target_device]:
        result = fn(model, variables, **kwargs)
        if result is not None:
            model, variables = result
            logger.info("transmuter pass %s applied", fn.__name__)
    return model, variables


def _tpu_fold_bn(model, variables, **kwargs):
    from pytorchvideo_tpu.accelerate.fuse import fold_conv_bn

    if "batch_stats" not in variables or not variables["batch_stats"]:
        return None
    return model, fold_conv_bn(variables)


def _tpu_bf16(model, variables, dtype=None, **kwargs):
    import jax.numpy as jnp

    from pytorchvideo_tpu.accelerate.deploy import cast_variables

    return model, cast_variables(variables, dtype or jnp.bfloat16)


register_transmuter("tpu", _tpu_fold_bn)
register_transmuter("tpu", _tpu_bf16)
