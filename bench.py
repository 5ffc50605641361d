"""Benchmark: X3D-S Kinetics-400 inference throughput (clips/sec/chip).

Runs on the real TPU chip (ambient env). The reference publishes no GPU/TPU
throughput numbers (SURVEY.md §6: docs/source/model_zoo.md has accuracy +
FLOPs only), so the round-1 figure anchors the baseline; vs_baseline is
measured against BASELINE_CLIPS_PER_SEC below (set from round-1 results).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Anchor throughput for vs_baseline: round-1 measurement on v5e, bf16,
# batch 64 (~2400 clips/s with pure-XLA convs). Later rounds beat this.
BASELINE_CLIPS_PER_SEC = 2400.0

BATCH = 64
CLIP_LEN = 13
CROP = 160
WARMUP = 5
ITERS = 20
TRIALS = 3


def main():
    from pytorchvideo_tpu.models import hub

    model = hub.x3d_s(model_num_class=400)
    rng = np.random.default_rng(0)
    x_host = rng.uniform(-1, 1, (BATCH, CLIP_LEN, CROP, CROP, 3)).astype(
        np.float32
    )
    x = jnp.asarray(x_host, jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_host[:1]), False)
    # bf16 weights for MXU throughput; BN stats stay f32.
    variables = {
        "params": jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), variables["params"]
        ),
        "batch_stats": variables["batch_stats"],
    }

    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, False)

    out = forward(variables, x)
    out.block_until_ready()
    for _ in range(WARMUP):
        forward(variables, x).block_until_ready()

    best_dt = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = forward(variables, x)
        out.block_until_ready()
        best_dt = min(best_dt, time.perf_counter() - t0)

    clips_per_sec = BATCH * ITERS / best_dt
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
