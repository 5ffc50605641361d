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
the zoo and on imported reference checkpoints. Denses below
``min_weight_size`` weights stay in bf16/f32 (at the default threshold
that's only tiny projections — classifier heads ARE quantized; raise the
threshold to exempt them). Pass ``variables`` to pre-quantize weights
once host-side (they bake into the executable as int8 constants);
otherwise weights are re-quantized inside every call, which costs an
extra per-kernel pass.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

# quantize only when the weight matmul is big enough for the MXU win to
# beat the activation-quantization overhead
DEFAULT_MIN_WEIGHT_SIZE = 16384


def prepare_int8_weights(
    variables, min_weight_size: int = DEFAULT_MIN_WEIGHT_SIZE
) -> Dict[Tuple[str, ...], Tuple[np.ndarray, np.ndarray]]:
    """Quantize every large 2D kernel once, keyed by module path.

    The returned dict feeds :func:`int8_serving_fn` / the interceptor,
    removing the per-call weight-quantization pass (the kernels become
    int8 compile-time constants of the jitted serving fn).
    """
    out: Dict[Tuple[str, ...], Tuple[np.ndarray, np.ndarray]] = {}

    def walk(tree, path):
        if not isinstance(tree, dict):
            return
        k = tree.get("kernel")
        if (
            k is not None
            and not isinstance(k, dict)
            and getattr(k, "ndim", 0) == 2
            and k.size >= min_weight_size
        ):
            w = np.asarray(k, np.float32)
            absmax = np.abs(w).max(axis=0)
            scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(
                np.float32
            )
            q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            out[path] = (q, scale)
        for key, v in tree.items():
            if key != "kernel":
                walk(v, path + (key,))

    walk(variables["params"], ())
    return out


def _int8_dense_call(
    mod: nn.Dense, x: jnp.ndarray, prepared=None
) -> jnp.ndarray:
    """Dynamic-quantized replacement for nn.Dense.__call__ (eval form)."""
    in_features = x.shape[-1]
    if prepared is not None and mod.path in prepared:
        q, scale = prepared[mod.path]
        w_q = jnp.asarray(q)
        w_scale = jnp.asarray(scale)
    else:
        w = mod.param(
            "kernel",
            mod.kernel_init,
            (in_features, mod.features),
            mod.param_dtype,
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
    prepared=None,
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
            return _int8_dense_call(mod, args[0], prepared)
        return next_fn(*args, **kwargs)

    return interceptor


def int8_serving_fn(
    model,
    min_weight_size: int = DEFAULT_MIN_WEIGHT_SIZE,
    train_arg: Optional[bool] = False,
    variables=None,
) -> Callable:
    """Build ``fn(variables, x)``: model.apply with int8 dense layers.

    jit-compatible (the interceptor rewrites at trace time). Pass
    ``variables`` to pre-quantize kernel weights host-side once.
    Example::

        fn = jax.jit(int8_serving_fn(model, variables=variables))
        logits = fn(variables, clips)
    """
    prepared = (
        prepare_int8_weights(variables, min_weight_size)
        if variables is not None
        else None
    )
    if prepared is not None:
        # jax arrays close over as jaxpr constvars (runtime buffers);
        # raw numpy would inline into the HLO as literals and blow up
        # compile time for multi-MB weight trees
        prepared = {
            path: (jnp.asarray(q), jnp.asarray(s))
            for path, (q, s) in prepared.items()
        }
    interceptor = make_int8_interceptor(min_weight_size, prepared)

    def fn(variables, x):
        with nn.intercept_methods(interceptor):
            if train_arg is None:
                return model.apply(variables, x)
            return model.apply(variables, x, train_arg)

    return fn
