"""Model-zoo throughput harness (clips/sec/chip per architecture).

The reference benchmarks via fvcore.common.benchmark timing grids
(tests/benchmark_accelerator_efficient_blocks.py, benchmark_transforms.py —
not run in CI). Equivalent: run `python benchmarks/model_throughput.py`
on the TPU; prints one json line per model.

Timing uses utils.profiling.time_jitted (DCE/async-proof on the tunnel).
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

CONFIGS = [
    # (name, factory, input shape(s) (T, crop), batch)
    ("x3d_xs", "x3d_xs", (4, 160), 256),  # 64->10760, 256->14410, 512->13264 clips/s
    ("x3d_s", "x3d_s", (13, 160), 128),
    ("slow_r50", "slow_r50", (8, 224), 64),
    ("slow_r50_b32", "slow_r50", (8, 224), 32),
    # NOTE: round-1 recorded 995/1048/1092 for B16/32/64 — invalidated:
    # time_jitted then chained only args[0] (slow pathway), so XLA hoisted
    # the fast pathway out of the timing loop. Corrected harness: ~496 @ B64.
    ("slowfast_r50", "slowfast_r50", None, 64),
    ("mvit_base_16x4", "mvit_base_16x4", (16, 224), 16),
    ("mvit_base_32x3", "mvit_base_32x3", (32, 224), 8),
]


def bench_model(name, factory_name, geom, batch):
    batch = int(os.environ.get("BENCH_BATCH", batch))
    from pytorchvideo_tpu.accelerate import fold_conv_bn, fuse_bn_mvit
    from pytorchvideo_tpu.models import hub
    from pytorchvideo_tpu.utils.profiling import time_jitted

    factory = getattr(hub, factory_name)
    model = factory() if "mvit" in name else factory(model_num_class=400)
    cpu = jax.devices("cpu")[0]
    device = jax.devices()[0]
    rng = np.random.default_rng(0)

    if name == "slowfast_r50":
        example = [
            jnp.zeros((1, 8, 224, 224, 3)),
            jnp.zeros((1, 32, 224, 224, 3)),
        ]
        x = [
            jnp.asarray(rng.uniform(-1, 1, (batch, 8, 224, 224, 3)), jnp.bfloat16),
            jnp.asarray(rng.uniform(-1, 1, (batch, 32, 224, 224, 3)), jnp.bfloat16),
        ]
    else:
        t, s = geom
        example = jnp.zeros((1, t, s, s, 3))
        x = jnp.asarray(rng.uniform(-1, 1, (batch, t, s, s, 3)), jnp.bfloat16)

    with jax.default_device(cpu):
        variables = model.init(jax.random.PRNGKey(0), example, False)
        # deploy form: fold BN affine into conv/linear weights
        if "mvit" in name:
            variables = fuse_bn_mvit(variables) if "batch_stats" in variables else variables
        elif "batch_stats" in variables:
            variables = fold_conv_bn(variables)
        variables = {
            "params": jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), variables["params"]
            ),
            **{k: v for k, v in variables.items() if k != "params"},
        }
    variables = jax.device_put(variables, device)
    x = jax.device_put(x, device)

    int8 = os.environ.get("BENCH_INT8", "") == "1"
    if int8:
        from pytorchvideo_tpu.accelerate import int8_serving_fn

        serving = int8_serving_fn(model, variables=variables)
    if name == "slowfast_r50":
        # multi-input: time with the slow pathway as the chained arg
        def fn(slow, fast):
            if int8:
                return serving(variables, [slow, fast])
            return model.apply(variables, [slow, fast], False)

        sec = time_jitted(fn, x[0], x[1], iters=10)
    else:
        def fn(xx):
            if int8:
                return serving(variables, xx)
            return model.apply(variables, xx, False)

        sec = time_jitted(fn, x, iters=10)
    print(
        json.dumps(
            {
                "model": name + ("_int8" if int8 else ""),
                "batch": batch,
                "clips_per_sec_per_chip": round(batch / sec, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    import sys

    only = set(sys.argv[1:])
    for cfg in CONFIGS:
        if only and cfg[0] not in only:
            continue
        try:
            bench_model(*cfg)
        except Exception as e:
            print(json.dumps({"model": cfg[0], "error": str(e)}), flush=True)
