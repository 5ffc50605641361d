"""Does XLA reach the v5e int8 MXU rate? (round-5 decision probe)

Round 3 measured weight-only int8 serving SLOWER than bf16 (220 vs 314
clips/s — the dequant/rescale HBM passes dominate; accelerate/int8.py
docstring). The stronger form — int8 activations x int8 weights with
s32 accumulation — is worth pursuing only if XLA actually lowers
``lax.dot_general(preferred_element_type=int32)`` onto the MXU's 2x
int8 path on this chip. This micro answers that one question with the
same chained-product discipline as bench.py's calibration probe
(simplifier-proof: every GEMM output feeds the next input).

Decision rule stated up front: int8 >= 1.5x the same-session bf16 rate
-> full-int8 serving is a real lever (build the quantized model path);
below that, the rescale overhead eats the margin at model level
(weight-only already proved that) and the negative gets recorded.

Run: python benchmarks/int8_gemm_probe.py
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

N = 4096
ITERS = 64


def _chained_bf16(n):
    @jax.jit
    def run(a, b, steps):
        def body(i, carry):
            a, acc = carry
            c = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            a2 = (c * (1.0 / n)).astype(jnp.bfloat16)
            return (a2, acc + c[0, 0])

        _, acc = jax.lax.fori_loop(0, steps, body, (a, jnp.float32(0)))
        return acc

    return run


def _chained_int8(n):
    @jax.jit
    def run(a, b, steps):
        def body(i, carry):
            a, acc = carry
            c = jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # re-narrow: shift keeps values int8-range; the cast is the
            # data dependency that chains the products
            a2 = (c >> 12).astype(jnp.int8)
            return (a2, acc + c[0, 0])

        _, acc = jax.lax.fori_loop(0, steps, body, (a, jnp.int32(0)))
        return acc

    return run


def _time(run, a, b, iters):
    float(run(a, b, 1))
    float(run(a, b, iters + 1))
    best_small = best_big = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(a, b, 1))
        best_small = min(best_small, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run(a, b, iters + 1))
        best_big = min(best_big, time.perf_counter() - t0)
    sec = (best_big - best_small) / iters
    return 2 * N * N * N / sec / 1e12  # TFLOP/s (TOPS for int8)


def main():
    device = jax.devices()[0]
    print(json.dumps({"device": device.device_kind}), file=sys.stderr)
    with jax.default_device(device):
        key = jax.random.PRNGKey(0)
        af = jax.jit(
            lambda k: jax.random.uniform(k, (N, N), jnp.bfloat16, -1, 1)
        )(key)
        bf = jax.jit(
            lambda k: jax.random.uniform(k, (N, N), jnp.bfloat16, -1, 1)
        )(jax.random.PRNGKey(1))
        ai = jax.jit(
            lambda k: jax.random.randint(k, (N, N), -127, 127, jnp.int8)
        )(key)
        bi = jax.jit(
            lambda k: jax.random.randint(k, (N, N), -127, 127, jnp.int8)
        )(jax.random.PRNGKey(1))

    bf16_tf = _time(_chained_bf16(N), af, bf, ITERS)
    int8_tops = _time(_chained_int8(N), ai, bi, ITERS)
    print(
        json.dumps(
            {
                "bf16_tflops": round(bf16_tf, 1),
                "int8_tops": round(int8_tops, 1),
                "ratio": round(int8_tops / bf16_tf, 3),
                "worth_pursuing": int8_tops / bf16_tf >= 1.5,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
