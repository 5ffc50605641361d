"""Second int8 decision probe: does XLA's TPU conv lower int8 x int8 ->
s32 onto the MXU's 2x path like dot_general does (int8_gemm_probe.py:
351 TOPS = 1.89x bf16)?

The conv zoo (slow_r50 / SlowFast, 20% MFU — the most MXU-bound family)
is where a 2x MXU rate would matter most. Convs reach the MXU through a
different lowering than dot_general, so the GEMM result does not
transfer automatically. Same chained-product discipline; a 1x1x1 conv
(pure GEMM-shaped, the ResNet bottleneck op) and a 3x3x3 conv at a
slow-pathway stage shape.

Run: python benchmarks/int8_conv_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp
import numpy as np

# Per-case trip counts: the 1x1x1 case does 7x less work per trip, and
# at 32 iters its first readings came back physically impossible (bf16
# "392 TF/s" > the 197 spec) — tunnel dispatch noise swamping a ~4 ms
# diff. 256 trips puts the diff at ~34 ms.
# slow-pathway res3 shape (B8, T8, 28x28, C512), THWC
CASES = [
    ("conv1x1x1_c512", (8, 8, 28, 28, 512), (1, 1, 1, 512, 512), 256),
    ("conv3x3x3_c256", (8, 8, 28, 28, 256), (3, 3, 3, 256, 256), 32),
]


def _run(x_dtype, acc_dtype, shape, kshape, narrow):
    dn = jax.lax.conv_dimension_numbers(
        shape, kshape, ("NTHWC", "THWIO", "NTHWC")
    )

    @jax.jit
    def run(x, k, steps):
        def body(i, carry):
            x, acc = carry
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc_dtype,
            )
            return (narrow(y), acc + y[0, 0, 0, 0, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, steps, body, (x, jnp.float32(0)))
        return acc

    return run


def _time(run, x, k, iters, flops):
    float(run(x, k, 1))
    float(run(x, k, iters + 1))
    best_small = best_big = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, k, 1))
        best_small = min(best_small, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run(x, k, iters + 1))
        best_big = min(best_big, time.perf_counter() - t0)
    sec = (best_big - best_small) / iters
    return flops / sec / 1e12


def main():
    device = jax.devices()[0]
    print(json.dumps({"device": device.device_kind}), file=sys.stderr)
    for name, shape, kshape, iters in CASES:
        flops = (
            2
            * np.prod(shape)
            * kshape[0] * kshape[1] * kshape[2] * kshape[4]
        )
        with jax.default_device(device):
            xb = jax.jit(
                lambda key: jax.random.uniform(key, shape, jnp.bfloat16, -1, 1)
            )(jax.random.PRNGKey(0))
            kb = jax.jit(
                lambda key: jax.random.uniform(key, kshape, jnp.bfloat16, -1, 1)
            )(jax.random.PRNGKey(1))
            xi = jax.jit(
                lambda key: jax.random.randint(key, shape, -127, 127, jnp.int8)
            )(jax.random.PRNGKey(0))
            ki = jax.jit(
                lambda key: jax.random.randint(key, kshape, -127, 127, jnp.int8)
            )(jax.random.PRNGKey(1))

        rec = {"case": name, "gflop": round(float(flops) / 1e9, 1)}
        try:
            bf = _time(
                _run(
                    jnp.bfloat16, jnp.float32, shape, kshape,
                    lambda y: (y * 1e-3).astype(jnp.bfloat16),
                ),
                xb, kb, iters, flops,
            )
            rec["bf16_tflops"] = round(bf, 1)
        except Exception as e:  # noqa: BLE001
            rec["bf16_error"] = str(e).split("\n")[0][:120]
        try:
            i8 = _time(
                _run(
                    jnp.int8, jnp.int32, shape, kshape,
                    lambda y: (y >> 12).astype(jnp.int8),
                ),
                xi, ki, iters, flops,
            )
            rec["int8_tops"] = round(i8, 1)
        except Exception as e:  # noqa: BLE001
            rec["int8_error"] = str(e).split("\n")[0][:120]
        if "bf16_tflops" in rec and "int8_tops" in rec:
            rec["ratio"] = round(rec["int8_tops"] / rec["bf16_tflops"], 3)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
