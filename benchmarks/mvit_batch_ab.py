"""MViT serving batch bracket, interleaved (round 5).

The 32x3 separate-process probes read B8 (gate) ~134, B16 147.4,
B4 154.3 — non-monotonic, which is either a real tiling effect (the
Pallas long-Lk ladder and the kv>8MB XLA fallback shift per-geometry
occupancy) or cross-process drift. Gate changes require same-session
interleaved medians (docs/bench_instrument.md), so this harness builds
the candidate batches co-resident (inputs are only ~10 MB/clip bf16)
and interleaves min-of-3 trip-differenced samples exactly like bench.py.

Result (32x3, two interleaved runs, 2026-08-21 v5e session): B2 139.9 /
B4 152.8+151.8 / B6 141.8 / B8 134.1 / B16 147.7 clips/s — B4 is the
confirmed optimum and became the bench.py gate geometry (+13%).

Run: python benchmarks/mvit_batch_ab.py [--model 16x4|32x3] [B ...]
     (default model 32x3, batches 4 6 8 12 16)
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

ITERS = 5


def build(batch, device, cpu, variant="32x3"):
    from pytorchvideo_tpu.accelerate import fuse_bn_mvit
    from pytorchvideo_tpu.models import hub

    if variant == "16x4":
        model, T = hub.mvit_base_16x4(), 16
    else:
        model, T = hub.mvit_base_32x3(), 32
    S = 224
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, T, S, S, 3)), False
        )
        if "batch_stats" in variables:
            variables = fuse_bn_mvit(variables)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: v for k, v in variables.items() if k != "params"},
        }
    variables = jax.device_put(variables, device)
    with jax.default_device(device):
        x = jax.jit(
            lambda k: jax.random.uniform(
                k, (batch, T, S, S, 3), jnp.bfloat16, -1, 1
            )
        )(jax.random.PRNGKey(0))
    x = jax.block_until_ready(x)

    # baked serving convention (weights closed over), like bench.py
    @jax.jit
    def loop(x, n):
        def body(i, carry):
            x, acc = carry
            out = model.apply(variables, x, False)
            probe = out.mean().astype(jnp.float32)
            return (x + (probe * 1e-24).astype(x.dtype), acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    return loop, x


def main():
    argv = sys.argv[1:]
    variant = "32x3"
    if "--model" in argv:
        i = argv.index("--model")
        variant = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    batches = [int(a) for a in argv] or [4, 6, 8, 12, 16]
    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(
        json.dumps({"device": device.device_kind, "model": variant}),
        file=sys.stderr,
    )
    live = []
    for b in batches:
        t0 = time.time()
        loop, x = build(b, device, cpu, variant)
        float(loop(x, 1))
        float(loop(x, ITERS + 1))
        print(
            json.dumps({"batch": b, "compile_s": round(time.time() - t0, 1)}),
            file=sys.stderr,
            flush=True,
        )
        live.append((b, loop, x))
    best = {b: [float("inf"), float("inf")] for b, _, _ in live}
    for _trial in range(3):
        for b, loop, x in live:
            t0 = time.perf_counter()
            float(loop(x, 1))
            best[b][0] = min(best[b][0], time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(loop(x, ITERS + 1))
            best[b][1] = min(best[b][1], time.perf_counter() - t0)
    for b, loop, x in live:
        small, big = best[b]
        diff = big - small
        if diff <= 0:
            print(json.dumps({"batch": b, "error": "noise floor"}), flush=True)
            continue
        sec = diff / ITERS
        print(
            json.dumps(
                {"batch": b, "clips_per_sec": round(b / sec, 1),
                 "step_ms": round(sec * 1e3, 2)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
