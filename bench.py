"""Benchmark: X3D-S Kinetics-400 inference throughput (clips/sec/chip).

Methodology notes (load-bearing in this environment):
- The axon TPU tunnel's ``block_until_ready`` does not reliably reflect
  device completion, so timing uses an on-device ``lax.fori_loop`` chain
  whose next iteration depends on a full-output reduction of the previous
  one (DCE-proof, dispatch-free), differencing two trip counts to cancel
  dispatch/readback overhead.
- bf16 weights/activations (MXU path); deploy-form weights (accelerate
  fold_conv_bn folds the BN affine into conv kernels — the framework's
  production inference path, ~1.7% over plain eval).
- batch 128 (measured sweet spot on one chip: 64→2850, 128→3750,
  256→3570 clips/s).

The reference publishes no GPU/TPU throughput numbers (SURVEY.md §6), so
round 1 anchors vs_baseline at BASELINE_CLIPS_PER_SEC (round-1 measured
value); later rounds must beat it.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

# keep the TPU default but register the CPU backend too: params are
# initialized host-side (eager init through the tunnel costs minutes).
os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if os.environ["JAX_PLATFORMS"] and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] = os.environ["JAX_PLATFORMS"] + ",cpu"

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CLIPS_PER_SEC = 2680.0  # round-1 anchor (v5e, batch 64, bf16)

BATCH = 128
CLIP_LEN = 13
CROP = 160
N_SMALL = 1
N_BIG = 9


def main():
    from pytorchvideo_tpu.models import hub

    model = hub.x3d_s(model_num_class=400)
    rng = np.random.default_rng(0)
    device = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    from pytorchvideo_tpu.accelerate import fold_conv_bn

    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, CLIP_LEN, CROP, CROP, 3)), False
        )
        variables = fold_conv_bn(variables)  # deploy form
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            "batch_stats": variables["batch_stats"],
        }
    variables = jax.device_put(variables, device)
    x = jax.device_put(
        jnp.asarray(
            rng.uniform(-1, 1, (BATCH, CLIP_LEN, CROP, CROP, 3)), jnp.bfloat16
        ),
        device,
    )

    @jax.jit
    def loop(variables, x, n):
        def body(i, carry):
            xx, acc = carry
            out = model.apply(variables, xx, False)
            probe = out.mean().astype(jnp.float32)
            return (xx + (probe * 1e-24).astype(xx.dtype), acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    # warm both trip counts (compile)
    float(loop(variables, x, N_SMALL))
    float(loop(variables, x, N_BIG))

    # difference the per-trip-count minima over several trials: robust to
    # dispatch-latency noise through the device tunnel (min of per-trial
    # differences can under/over-shoot when noise ~ kernel time)
    best_small = best_big = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(variables, x, N_SMALL))
        best_small = min(best_small, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(loop(variables, x, N_BIG))
        best_big = min(best_big, time.perf_counter() - t0)
    diff = best_big - best_small
    assert diff > 0, f"timing below noise floor (diff={diff:.6f}s)"
    best = diff / (N_BIG - N_SMALL)

    clips_per_sec = BATCH / best
    print(
        json.dumps(
            {
                "metric": "x3d_s_inference_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
