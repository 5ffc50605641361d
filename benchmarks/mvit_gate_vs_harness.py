"""Same-session A/B of the two MViT measurement paths that disagree.

Round-3/4 mystery: bench.py's gate sampler has read 288-290 clips/s in
three independent sessions (two judge gates + the round-4 probe study)
while benchmarks/model_throughput.py sessions recorded 367.9. The round-4
probe study killed the chip-state hypothesis: a session with a healthy MXU
(193 TF/s) and 80%-of-spec HBM (653 GB/s) still read 290, and 80% HBM can
only account for ~3 ms of the 11.6 ms/step gap.

Remaining hypothesis: the harnesses differ. Both time an on-device
fori_loop over model.apply on (16,16,224,224,3) bf16 with BN fused, but:

  - bench.setup_mvit passes ``variables`` as a jit ARGUMENT to the loop;
    model_throughput's fn CLOSES OVER ``variables`` (embedded constants).
  - bench chains the input with the probe itself; time_jitted tree-chains
    every inexact arg.
  - trip counts / trials differ slightly.

This script builds ONE model + variables and times it both ways in the
same session, plus a third variant (closure + bench-style sampler) to
bisect which difference matters.

Run: python benchmarks/mvit_gate_vs_harness.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from pytorchvideo_tpu.utils.profiling import time_jitted

    device = bench._devices_with_timeout(900)[0]
    cpu = jax.devices("cpu")[0]
    print(json.dumps({"env": bench._env_record(device)}), flush=True)

    from pytorchvideo_tpu.accelerate import fuse_bn_mvit
    from pytorchvideo_tpu.models import hub

    model = hub.mvit_base_16x4()
    B, T, S = 16, 16, 224
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
    x = bench._rand_input((B, T, S, S, 3), device)

    # (a) the bench.py gate path: variables as jit arg, bench sampler
    gate_sample = bench._make_sampler(
        bench._model_loop(model), (variables, x), B
    )
    # (b) the model_throughput path: closure + time_jitted
    def fn(xx):
        return model.apply(variables, xx, False)

    # (c) bisect: closure over variables, but timed by the bench sampler
    @jax.jit
    def closure_loop(xs, n):
        def body(i, carry):
            xs, acc = carry
            out = model.apply(variables, xs, False)
            probe = out.mean().astype(jnp.float32)
            return (xs + (probe * 1e-24).astype(xs.dtype), acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (xs, jnp.float32(0)))
        return acc

    closure_sample = bench._make_sampler(closure_loop, (x,), B)

    for r in range(3):
        a = round(gate_sample(), 1)
        b = round(B / time_jitted(fn, x, iters=10), 1)
        c = round(closure_sample(), 1)
        print(
            json.dumps(
                {
                    "round": r,
                    "gate_sampler_clips_s": a,
                    "time_jitted_closure_clips_s": b,
                    "bench_sampler_closure_clips_s": c,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
