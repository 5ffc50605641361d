"""Same-session (HBM probe, GEMM probe, MViT clips/s) pairs.

VERDICT r3 weak-#1 / next-#2: two independent gate sessions measured MViT-B
16x4 at 288-289 clips/s while builder sessions measured 367.9 — a 1.27x
bimodality on identical code and chip kind. The round-3 roofline attributes
MViT's largest non-GEMM bucket to ~11 ms of HBM layout copies, and the one
session with a surviving HBM probe read 453.8 GB/s = 55% of v5e spec — the
hypothesis is that delivered HBM state, not code, selects the mode.

This harness settles it with the round-4 simplifier-proof probes: it builds
the probe samplers and the bench MViT sampler ONCE, then interleaves
probe->model->probe rounds so every clips/s sample is bracketed by valid
same-session bandwidth readings. Output: one JSON line per round with
(gemm_tflops, hbm_gbps, mvit_clips_s), plus a summary with the
hbm-normalized throughput (clips/s per delivered GB/s) across rounds — if
the mode is HBM-state, that normalized number is stable across sessions
that read 289 and 368.

Run (real TPU): python benchmarks/mvit_hbm_session.py [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main():
    import jax
    import jax.numpy as jnp

    import bench

    device = bench._devices_with_timeout(
        float(os.environ.get("BENCH_INIT_TIMEOUT", 900))
    )[0]
    cpu = jax.devices("cpu")[0]
    env = bench._env_record(device)
    spec = bench.CHIP_SPECS.get(env.get("device_kind"), (None, None))
    print(json.dumps({"env": env, "spec": spec}), flush=True)

    # Build all samplers once (compile outside the measurement rounds).
    n = 4096
    rng = np.random.default_rng(0)
    a = jax.device_put(jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16), device)
    b = jax.device_put(jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16), device)
    gemm_sample = bench._make_sampler(
        bench.gemm_probe_loop(n), (a, b), 1.0, small=8, big=158
    )

    m = 256 * 1024 * 1024 // 2
    x = jax.device_put(jnp.ones((m,), jnp.bfloat16), device)
    stream_sample = bench._make_sampler(
        bench.stream_probe_loop(), (x,), 1.0, small=8, big=88
    )

    mvit_sample = bench.setup_mvit(device, cpu)

    rows = []
    for r in range(ROUNDS):
        t0 = time.time()
        med = lambda f, k: float(np.median([f() for _ in range(3)]))
        gemm_tflops = round(2 * n**3 * med(gemm_sample, 3) / 1e12, 1)
        hbm_gbps = round(2 * m * 2 * med(stream_sample, 3) / 1e9, 1)
        clips = round(mvit_sample(), 2)
        hbm2 = round(2 * m * 2 * med(stream_sample, 3) / 1e9, 1)
        row = {
            "round": r,
            "gemm_tflops": gemm_tflops,
            "hbm_gbps_before": hbm_gbps,
            "mvit_clips_s": clips,
            "hbm_gbps_after": hbm2,
            "wall_s": round(time.time() - t0, 1),
        }
        if spec[1]:
            row["hbm_frac_of_spec"] = round(
                (hbm_gbps + hbm2) / 2 / spec[1], 3
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    med_clips = float(np.median([r["mvit_clips_s"] for r in rows]))
    med_hbm = float(
        np.median(
            [(r["hbm_gbps_before"] + r["hbm_gbps_after"]) / 2 for r in rows]
        )
    )
    print(
        json.dumps(
            {
                "summary": {
                    "median_mvit_clips_s": round(med_clips, 1),
                    "median_hbm_gbps": round(med_hbm, 1),
                    "clips_per_gbps": round(med_clips / med_hbm, 4),
                    "note": "compare clips_per_gbps across sessions: "
                    "constant => chip-state explains the 289-vs-368 "
                    "bimodality; varying => code/session mix",
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
