"""int8 MXU serving path: dynamic-quantized dense layers at apply time.

The reference's int8 deployment story is QNNPACK post-training quantization
(accelerator efficient blocks convert() paths + torch.ao.quantization,
reference layers/accelerator/mobile_cpu/convolutions.py:22-26,
docs model_zoo.md:76: int8 EfficientX3d-XS 165 ms vs 233 ms fp32 mobile).
TPU analogue: the MXU runs int8 x int8 -> int32 at 2x bf16 throughput
(measured 371 TOP/s vs 183 TFLOP/s on one chip), so transformer-style
models whose time is dense matmuls (MViT) gain from full int8 GEMMs —
not just the weight-only HBM win in :mod:`quantize`.

Mechanism: a flax method interceptor swaps every large ``nn.Dense``
``__call__`` for

  - per-output-channel symmetric int8 weights (quantized at trace time
    from the dense checkpoint weights — no new checkpoint format),
  - per-row (per-token) dynamic symmetric int8 activations,
  - ``lax.dot(..., preferred_element_type=int32)`` on the MXU,
  - f32 rescale (x_scale * w_scale) + bias epilogue, cast back to the
    activation dtype (XLA fuses quantize/rescale into neighbors).

No model-code changes and no variable-tree changes: works on any model in
the zoo and on imported reference checkpoints. Small denses (classifier
heads, SE bottlenecks) stay in bf16/f32 — quantization overhead would
exceed the matmul win there.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

# quantize only when the weight matmul is big enough for the MXU win to
# beat the activation-quantization overhead
DEFAULT_MIN_WEIGHT_SIZE = 16384


def _int8_dense_call(mod: nn.Dense, x: jnp.ndarray) -> jnp.ndarray:
    """Dynamic-quantized replacement for nn.Dense.__call__ (eval form)."""
    in_features = x.shape[-1]
    w = mod.param(
        "kernel", mod.kernel_init, (in_features, mod.features), mod.param_dtype
    )
    w = jnp.asarray(w, jnp.float32)
    # per-output-channel symmetric weight scales
    w_absmax = jnp.max(jnp.abs(w), axis=0)
    w_scale = jnp.where(w_absmax > 0, w_absmax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)

    # per-row (token) dynamic symmetric activation scales; quantize math
    # stays in the activation dtype (no f32 materialization of x — int
    # values <= 127 are exact in bf16)
    x2 = x.reshape(-1, in_features)
    x_absmax = jnp.max(jnp.abs(x2), axis=-1, keepdims=True).astype(jnp.float32)
    x_scale = jnp.where(x_absmax > 0, x_absmax / 127.0, 1.0)
    x_q = jnp.clip(
        jnp.round(x2 * (1.0 / x_scale).astype(x2.dtype)), -127, 127
    ).astype(jnp.int8)

    y = jax.lax.dot(x_q, w_q, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (x_scale * w_scale[None, :])
    if mod.use_bias:
        b = mod.param("bias", mod.bias_init, (mod.features,), mod.param_dtype)
        y = y + jnp.asarray(b, jnp.float32)
    return y.reshape(x.shape[:-1] + (mod.features,)).astype(x.dtype)


def make_int8_interceptor(
    min_weight_size: int = DEFAULT_MIN_WEIGHT_SIZE,
) -> Callable:
    """flax ``intercept_methods`` interceptor quantizing large Dense calls."""

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        if (
            isinstance(mod, nn.Dense)
            and context.method_name == "__call__"
            and not mod.is_initializing()
            and args
            and hasattr(args[0], "shape")
            and args[0].ndim >= 2
            and args[0].shape[-1] * mod.features >= min_weight_size
        ):
            return _int8_dense_call(mod, args[0])
        return next_fn(*args, **kwargs)

    return interceptor


def int8_serving_fn(
    model,
    min_weight_size: int = DEFAULT_MIN_WEIGHT_SIZE,
    train_arg: Optional[bool] = False,
) -> Callable:
    """Build ``fn(variables, x)``: model.apply with int8 dense layers.

    jit-compatible (the interceptor rewrites at trace time). Example::

        fn = jax.jit(int8_serving_fn(model))
        logits = fn(variables, clips)
    """
    interceptor = make_int8_interceptor(min_weight_size)

    def fn(variables, x):
        with nn.intercept_methods(interceptor):
            if train_arg is None:
                return model.apply(variables, x)
            return model.apply(variables, x, train_arg)

    return fn
