"""Single-clip (batch=1) deploy-form inference latency per model.

The reference's accelerator headline is mobile latency for a 1-second
clip (docs/source/model_zoo.md:70-77: EfficientX3d-XS 233 ms fp32 /
165 ms int8 on Samsung S8; EfficientX3d-S 764 ms fp32). This harness
measures the same protocol on one TPU chip — batch 1, deploy form
(BN folded, bf16) — so BASELINE.md can carry the direct comparison row.

Prints one json line per model: {"model", "latency_ms", "ref_mobile_ms"}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "axon,cpu")
if "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp
import numpy as np

# (name, factory, (T, crop), reference mobile fp32 latency ms or None)
# Round 5 extends the grid to the full serving zoo (batch-1 latency is
# the interactive-serving number; the throughput-optimal batches live in
# bench.py / MODEL_ZOO.md). slowfast feeds its dual-pathway list input.
CONFIGS = [
    ("efficient_x3d_xs", "efficient_x3d_xs", (4, 160), 233.0),
    ("efficient_x3d_s", "efficient_x3d_s", (13, 160), 764.0),
    ("x3d_xs", "x3d_xs", (4, 160), None),
    ("x3d_s", "x3d_s", (13, 160), None),
    ("slow_r50", "slow_r50", (8, 224), None),
    ("slowfast_r50", "slowfast_r50", (32, 224), None),
    ("mvit_base_16x4", "mvit_base_16x4", (16, 224), None),
]


def bench_latency(name, factory_name, geom, ref_ms):
    from pytorchvideo_tpu.accelerate import fold_conv_bn
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.utils.profiling import time_jitted

    factory = getattr(hub, factory_name)
    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    t, s = geom
    rng = np.random.default_rng(0)

    def make_input(np_rng=None):
        def arr(shape):
            if np_rng is None:
                return jnp.zeros(shape)
            return jnp.asarray(np_rng.uniform(-1, 1, shape), jnp.bfloat16)

        if "slowfast" in name:
            # dual pathway: slow T//4 (alpha=4), fast T
            return [arr((1, t // 4, s, s, 3)), arr((1, t, s, s, 3))]
        return arr((1, t, s, s, 3))

    from pytorchvideo_tpu.accelerate.deploy import cast_variables

    with jax.default_device(cpu):
        if name.startswith("efficient"):
            # efficient-block protocol: init the train form, deploy-form
            # weights via the same fold+cast convert() applies
            block = factory(num_classes=400)
            model = block.model
            variables = block.init(jax.random.PRNGKey(0), make_input())
        elif "mvit" in name:
            model = factory()
            variables = model.init(
                jax.random.PRNGKey(0), make_input(), False
            )
        else:
            model = factory(model_num_class=400)
            variables = model.init(
                jax.random.PRNGKey(0), make_input(), False
            )
        if "batch_stats" in variables:
            if "mvit" in name:
                from pytorchvideo_tpu.accelerate import fuse_bn_mvit

                variables = fuse_bn_mvit(variables)
            else:
                variables = fold_conv_bn(variables)
        variables = cast_variables(variables, jnp.bfloat16)
    variables = jax.device_put(variables, device)
    x = jax.device_put(make_input(rng), device)

    def fn(xx):
        return model.apply(variables, xx, False)

    # sub-ms latencies: long trip counts so kernel time dominates the
    # per-call dispatch noise through the device tunnel
    sec = time_jitted(fn, x, iters=300, trials=4)
    out = {"model": name, "latency_ms": round(sec * 1e3, 3)}
    if ref_ms is not None:
        out["ref_mobile_ms"] = ref_ms
        out["speedup_vs_mobile"] = round(ref_ms / (sec * 1e3), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    only = set(sys.argv[1:])
    for cfg in CONFIGS:
        if only and cfg[0] not in only:
            continue
        try:
            bench_latency(*cfg)
        except Exception as e:
            print(json.dumps({"model": cfg[0], "error": str(e)}), flush=True)
