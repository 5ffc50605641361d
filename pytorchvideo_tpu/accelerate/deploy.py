"""Deployable-form conversion: the TPU analogue of the reference's
``convert_to_deployable_form`` (accelerator/deployment/mobile_cpu/utils/
model_conversion.py:234-272).

On mobile CPU the reference fuses conv+BN and rewrites conv3ds into QNNPACK
conv2ds. On TPU the equivalent deploy story is: fold BN into weights, cast
to bf16, and AOT-compile the forward with XLA (optionally serializing
StableHLO via jax.export for serving).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from pytorchvideo_tpu.accelerate.fuse import fold_conv_bn


def cast_variables(variables, dtype=jnp.bfloat16, cast_stats: bool = False):
    """Cast params (and optionally batch stats) to a compute dtype."""
    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(
        lambda a: a.astype(dtype), variables["params"]
    )
    if cast_stats and "batch_stats" in variables:
        out["batch_stats"] = jax.tree_util.tree_map(
            lambda a: a.astype(dtype), variables["batch_stats"]
        )
    return out


def convert_to_deployable_form(
    model,
    variables,
    example_input,
    fold_bn: bool = True,
    dtype=jnp.bfloat16,
) -> Tuple[Callable, Any]:
    """Returns (compiled_forward, deploy_variables).

    - BN folded into conv kernels (exact),
    - weights cast to ``dtype`` (bf16 default for MXU throughput),
    - forward AOT-compiled via jit(...).lower(...).compile().
    """
    deploy_vars = fold_conv_bn(variables) if fold_bn else variables
    if dtype is not None:
        deploy_vars = cast_variables(deploy_vars, dtype)

    def forward(vars_, x):
        return model.apply(vars_, x, False)

    example = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype if dtype is not None else a.dtype),
        example_input,
    )
    compiled = jax.jit(forward).lower(deploy_vars, example).compile()
    return compiled, deploy_vars


def export_stablehlo(model, variables, example_input) -> bytes:
    """Serialize the inference function to portable StableHLO bytes
    (jax.export), the TPU serving artifact."""
    from jax import export as jax_export

    def forward(vars_, x):
        return model.apply(vars_, x, False)

    exported = jax_export.export(jax.jit(forward))(variables, example_input)
    return bytes(exported.serialize())
